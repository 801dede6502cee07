package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document deduplication operators for large-scale corpus curation:
  * exact (hash groupBy), n-gram Jaccard verify, MinHash+LSH candidate
  * generation, and SimHash. Generalizes the reference's fuzzy-merge idea
  * (MergeUtil.java name-bag matching) from place names to whole documents.
  *
  * Scale notes (100 TB):
  *   - exact dedup shuffles only (id, 16-byte hash), never the text;
  *   - MinHash signatures are computed in one pass per document (no
  *     shuffle of shingles); only (id, band-key) pairs shuffle, and
  *     candidate verification joins back by id;
  *   - Jaccard verification is bounded to LSH/bucket candidates — the
  *     all-pairs form here is for oracle checking at test scale and takes
  *     an explicit bucket column to keep the join co-partitioned.
  */
object Dedup {

  /** Exact duplicate groups by content hash. Emits one row per member of
    * every group with >1 member: (doc_id, text_hash, canonical_id,
    * group_size). Only the 16-byte md5 and the id ever shuffle. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("text_hash")
    df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("text_hash"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_id", min("doc_id").over(w))
      .where(col("group_size") > 1)
  }

  /** Paragraph-level exact dedup (the CCNet/C4 boilerplate pass, Wenzek
    * et al. 2019): split each document into paragraphs, drop every
    * paragraph whose exact content already occurred EARLIER in the corpus
    * ((doc_id, position) order — first occurrence survives), and rebuild
    * each document from its survivors. Returns (doc_id, n_paras, n_kept,
    * clean_hash) with clean_hash = md5 of the rebuilt text (md5("") for a
    * fully-deduplicated document).
    *
    * `paraWords` segments text into fixed-width word windows — the
    * single-line test corpus's stand-in for real paragraph breaks; a
    * production corpus splits on blank lines instead, same dataflow.
    * Scale shape: paragraphs shuffle ONCE by content hash (16-byte md5 +
    * ids — the CCNet shard-by-hash step), survivors shuffle once more by
    * doc to reassemble; no all-pairs anything. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     paraWords: Int): DataFrame = {
    require(paraWords > 0, s"paraWords must be positive: $paraWords")
    val toks = df
      .select(col(idCol).as("doc_id"), TextAnalysis.words(col(textCol)).as("ws"))
      .withColumn("n", size(col("ws")))
      .where(col("n") > 0)
    val paraArr = transform(
      sequence(lit(0), floor((col("n") - 1) / lit(paraWords)).cast("int")),
      i => array_join(slice(col("ws"), i * paraWords + 1, lit(paraWords)), " "))
    val keyed = toks.select(col("doc_id"), posexplode(paraArr))
      .select(col("doc_id"), col("pos"), col("col").as("para"),
        md5(col("col")).as("ph"))
    val w = Window.partitionBy("ph").orderBy("doc_id", "pos")
    val kept = keyed.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    // paragraph count is ceil(n / paraWords) — derived arithmetically on
    // the one-row-per-doc relation, NOT by re-aggregating the exploded
    // paragraphs (that would re-run the tokenize+md5 lineage and shuffle
    // every paragraph row a second time just to count them)
    val totals = toks.select(col("doc_id"),
      (floor((col("n") - 1) / lit(paraWords)) + 1).as("n_paras"))
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")), " ").as("clean"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(md5(col("clean")), md5(lit(""))).as("clean_hash"))
  }

  /** Distinct n-grams over an ALREADY-MATERIALIZED words array attribute.
    * The words argument must be a plain column reference, not an expression:
    * interpreted higher-order lambdas re-evaluate their subexpressions per
    * element, so an inlined `split(text)` here executes O(words) times per
    * row (measured: 10x the whole join's cost). */
  def ngramsOfWords(words: Column, n: Int): Column =
    if (n == 1) array_distinct(words)
    else
      // guard: sequence(0, negative) counts DOWN in Spark, not empty
      when(size(words) < n, array().cast("array<string>")).otherwise(
        array_distinct(
          transform(sequence(lit(0), size(words) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*))))

  /** Distinct word n-grams of a text column as an array column. Only safe
    * for one-shot/narrow use — hot paths should materialize the words array
    * first (see ngramsOfWords). */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsOfWords(filter(split(text, " "), w => w =!= ""), n)

  /** Jaccard similarity of two (already distinct) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** All-pairs n-gram Jaccard within a blocking bucket via EXACT prefix
    * filtering (Bayardo et al. AllPairs / PPJoin family): under any fixed
    * global order of grams — ascending 64-bit hash here — J(A,B) >= t
    * implies the first |A|-ceil(t*|A|)+1 grams of A and the first
    * |B|-ceil(t*|B|)+1 grams of B share an element. Candidates are pairs
    * co-occurring under a prefix gram (plus the exact size-ratio bound
    * max <= min/t); only candidates are verified. No false negatives.
    *
    * Scale note: this replaces a within-bucket quadratic join with one
    * keyed by (bucket, prefix-gram) — candidate volume tracks actual gram
    * sharing, not bucket size. Prefixes are RAREST-FIRST (the canonical
    * AllPairs/PPJoin ordering): the global gram order for the prefix slice
    * is (ascending corpus frequency, hash tiebreak), so prefix grams are
    * the least-shared ones and candidate volume stays bounded under
    * skewed vocabularies — a stop-word-heavy corpus would otherwise put
    * the same ubiquitous gram in millions of prefixes. The VERIFY arrays
    * stay hash-sorted (the merge-walk kernel needs value order); PPJoin's
    * exactness only needs the prefix order to be some fixed global order,
    * independent of the verify order. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        bucketCol: String, n: Int, minSim: Double): DataFrame = {
    // sorted grams → the pair similarity is a codegen'd merge walk
    // (graft.functions.SortedIntersectSize) — no per-pair Scala conversion
    graft.functions.SortedIntersectSize.register(df.sparkSession)
    // Two explicit exchanges, both load-bearing:
    //  1. spread raw rows BEFORE the per-row tokenize/corpus expressions —
    //     otherwise they run at the scan's parallelism (often 1-2 tasks for
    //     small parquet inputs) while every other core idles;
    //  2. a barrier between the words projection and the n-gram lambda —
    //     without it CollapseProject inlines `words` into every element_at
    //     and split() re-executes per gram.
    // Explicit partition counts keep AQE from coalescing these byte-wise
    // tiny but CPU-heavy shuffles to one partition.
    val par = df.sparkSession.sparkContext.defaultParallelism
    // cache: g feeds the candidate prefixes and both verify joins — without
    // it the shingling of the whole corpus is recomputed per consumer.
    // Grams shuffle and compare as 64-bit hashes, not strings: the merge
    // walk is the hot loop and long compares are ~10x cheaper; distinct-gram
    // counts (and so Jaccard) are unchanged w.h.p. (64-bit collisions
    // within one document pair).
    // one native kernel instead of array_sort(transform(ngrams, xxhash64)):
    // no gram strings, no interpreted per-element lambdas (PPJoin's
    // exactness only needs SOME fixed global gram order — sorted 64-bit
    // combine-hashes serve as well as sorted string-hashes, and Jaccard
    // depends only on distinct-gram identities)
    graft.functions.NgramHashes.register(df.sparkSession)
    val g0 = df.repartition(par)
      .select(col(idCol).as("id"), col(bucketCol).as("bucket"),
        filter(split(col(textCol), " "), w => w =!= "").as("words"))
      .repartition(par, col("id"))
      .select(col("id"), col("bucket"),
        call_function("ngram_hashes", col("words"), lit(n)).as("grams"))
      .withColumn("sz", size(col("grams")))
      .cache()
    // Materialize the shingle cache BEFORE fan-out: the prefix leg, the
    // heavy-hitter legs, and both verify-join legs otherwise submit
    // concurrently and each re-shingles the corpus before any partition
    // lands in cache (the lazy-cache stampede). Round 4 measured the
    // eager count as +0.9 s on an idle host and kept laziness; with the
    // heavy-hitter reorder there are now five consumers instead of three
    // and the host is demonstrably time-shared, so the serial pass is the
    // cheaper side of the trade at every realistic deployment.
    g0.count()
    // the sz guard sits ABOVE the cache barrier: pushed into the scan it
    // would inline the whole interpreted shingling pipeline into the
    // single-file parquet scan task and run it serially (measured 18s of a
    // 26s job at sf0.1)
    val g = g0.where(col("sz") > 0)
    // rarest-first reorder via HEAVY HITTERS only. The PPJoin prefix
    // filter needs SOME consistent total gram order that pushes frequent
    // grams out of prefixes — it does not need every gram's exact rank
    // (exactness lives in the verify step). Order: non-heavy grams first
    // in hash order, then heavy grams ascending by (f, gram). That keeps
    // the selectivity win (prefixes avoid hot join keys) while replacing
    // the previous vocabulary-wide join-back + full collect_list re-sort
    // with:
    //  - one broadcast of the heavy table, bounded BY CONSTRUCTION:
    //    f0 > total/cap means |{gram : f >= f0}| <= cap (~1M) no matter
    //    the corpus size, and the 64 floor keeps tiny corpora from
    //    declaring everything heavy;
    //  - a doc-id co-partitioned join of per-doc heavy lists — only heavy
    //    OCCURRENCES shuffle (the Zipf head), never the whole gram stream.
    val cap = 1L << 20
    val freq = g.select(explode(col("grams")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("f"))
    val tot = g.agg(sum(col("sz").cast("long")).as("tot"))
    val heavy = freq.crossJoin(broadcast(tot))
      .where(col("f") >= greatest(lit(64L), (col("tot") / lit(cap)) + lit(1L)))
      .select(col("gram"), col("f"))
    val docHeavy = g.select(col("id"), explode(col("grams")).as("gram"))
      .join(broadcast(heavy), "gram")
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("f"), col("gram")))),
        x => x.getField("gram")).as("hv"))
    // array_except keeps the left array's (hash-sorted) order, so the
    // concatenation is the global (non-heavy by hash, heavy by rank) order
    val byFreq = g.join(docHeavy, Seq("id"), "left")
      .select(col("id"), col("bucket"), col("sz"),
        when(col("hv").isNull, col("grams"))
          .otherwise(concat(array_except(col("grams"), col("hv")), col("hv")))
          .as("fgrams"))
    // prefix length sz - floor(t*sz - eps) + 1 >= sz - ceil(t*sz) + 1: at
    // most one gram longer than the tight bound, immune to float edges on
    // either side of an integer t*sz
    val prefLen = (col("sz") - floor(col("sz").cast("double") * lit(minSim) - lit(1e-9)) + 1)
      .cast("int")
    // explicit partition count on the self-join key: the pref relation is
    // byte-wise tiny (ids + hashes), so AQE coalesces its exchange to 1-2
    // partitions — but the join OUTPUT fans out ~10x (shared prefix grams),
    // so those 1-2 tasks serialize the candidate enumeration. A fixed-N
    // repartition is exempt from AQE coalescing and is reused by both
    // sides of the self-join (one exchange, co-partitioned).
    val pref = byFreq.select(col("id"), col("bucket"), col("sz"),
      posexplode(slice(col("fgrams"), lit(1), prefLen)))
      .toDF("id", "bucket", "sz", "pos", "gram")
      .repartition(par, col("bucket"), col("gram"))
      // persisted: exchange reuse SHOULD make the self-join read this
      // exchange once, but the runtime stage profile shows both legs
      // re-running the heavy-hitter reorder + explode under AQE; the
      // narrow (ids + one hash) relation is cheap to pin (freed by the
      // runners' per-query cache clear)
      .persist()
    // positional filter (PPJoin): a shared gram at 0-based sorted positions
    // (i, j) bounds the overlap by min(i,j) + 1 + min(|A|-i-1, |B|-j-1)
    // (shared grams sort strictly before/after it on both sides); J >= t
    // needs overlap >= t/(1+t) * (|A|+|B|). Still exact — an occurrence
    // below the bound can never witness a qualifying pair, and a
    // qualifying pair's shared prefix grams all qualify.
    val alpha = (col("a.sz") + col("b.sz")).cast("double") *
      lit(minSim / (1 + minSim)) - lit(1e-9)
    val overlapBound = least(col("a.pos"), col("b.pos")) + 1 +
      least(col("a.sz") - col("a.pos") - 1, col("b.sz") - col("b.pos") - 1)
    val cand = pref.as("a").join(pref.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.gram") === col("b.gram") &&
          col("a.id") < col("b.id") &&
          greatest(col("a.sz"), col("b.sz")).cast("double") <=
            least(col("a.sz"), col("b.sz")) / lit(minSim) + lit(1e-6) &&
          overlapBound.cast("double") >= alpha)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val pairs = cand
      .join(g.select(col("id").as("a_id"), col("grams").as("a_grams"),
        col("sz").as("a_sz")), "a_id")
      .join(g.select(col("id").as("b_id"), col("grams").as("b_grams"),
        col("sz").as("b_sz")), "b_id")
      .withColumn("inter",
        expr("sorted_intersect_size(a_grams, b_grams)").cast("double"))
      .select(col("a_id"), col("b_id"),
        round(col("inter") / (col("a_sz") + col("b_sz") - col("inter")), 6)
          .as("jaccard"))
      .where(col("jaccard") >= minSim)
      // eager materialization of the (narrow) pair list so the working set
      // can be freed here instead of accumulating in the session cache
      // across invocations (the Multimodal convention)
      .localCheckpoint(true)
    pref.unpersist()
    g0.unpersist()
    pairs
  }

  /** Incremental (cross-snapshot) dedup — the production shape for a
    * continuously-crawled corpus: flag each NEW document that duplicates
    * the EXISTING corpus, exactly (byte-identical text) or nearly
    * (verified n-gram Jaccard ≥ t via MinHash banding), WITHOUT ever
    * pairing the old corpus against itself. Self-join dedup (p1/p3) is
    * O(corpus²) work per crawl; this is O(new × collisions) — the old
    * side contributes one md5 projection and one band-key index, both
    * reusable artifacts a real deployment would persist between crawls.
    *
    * Returns every new row with `exact_src` (smallest old id with
    * identical text, null if none) and `near_src`/`near_jaccard` (the
    * best-Jaccard old match at ≥ minSim, ties to the smallest old id,
    * nulls if none). Banding, hashing, and verification reuse the
    * [[minhashLshPairs]] machinery (portable [[PortableHash]] signatures,
    * native [[graft.functions.MinhashBandKeys]]/[[graft.functions.NgramHashes]]
    * kernels, codegen'd merge-walk verify), so an external oracle
    * reproduces every flag and score bit-for-bit.
    *
    * Scale shape (100 TB old + daily new): only (id, band-key) and
    * (id, md5) pairs shuffle for candidate generation; gram arrays join
    * back only for the candidate set. Neither corpus text ever shuffles.
    */
  def incrementalDedup(newDf: DataFrame, oldDf: DataFrame, idCol: String,
                       textCol: String, n: Int, numHashes: Int, bandRows: Int,
                       minSim: Double): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must divide into bands")
    import org.apache.spark.sql.expressions.Window
    graft.functions.SortedIntersectSize.register(newDf.sparkSession)
    graft.functions.NgramHashes.register(newDf.sparkSession)
    graft.functions.MinhashBandKeys.register(newDf.sparkSession)
    val par = newDf.sparkSession.sparkContext.defaultParallelism
    // same two load-bearing exchanges + eager cache as minhashLshPairs
    def prep(df: DataFrame): DataFrame = {
      val g = df.repartition(par)
        .select(col(idCol).as("id"), md5(col(textCol)).as("h"),
          filter(split(col(textCol), " "), w => w =!= "").as("words"))
        .repartition(par, col("id"))
        .select(col("id"), col("h"),
          call_function("ngram_hashes", col("words"), lit(n)).as("grams"),
          call_function("minhash_band_keys", col("words"),
            lit(n), lit(numHashes), lit(bandRows)).as("bands"))
        .withColumn("sz", size(col("grams")))
        .cache()
      g.count()
      g
    }
    val nw = prep(newDf)
    val od = prep(oldDf)

    val exact = nw.select(col("id"), col("h"))
      .join(od.select(col("h"), col("id").as("o_id")), Seq("h"))
      .groupBy("id").agg(min(col("o_id")).as("exact_src"))

    val nb = nw.where(col("sz") > 0)
      .select(col("id"), explode(col("bands")).as("band_key"))
    val ob = od.where(col("sz") > 0)
      .select(col("id").as("o_id"), explode(col("bands")).as("band_key"))
    val cand = nb.join(ob, "band_key").select("id", "o_id").distinct()
    val near = cand
      .join(nw.select(col("id"), col("grams").as("a_grams"),
        col("sz").as("a_sz")), "id")
      .join(od.select(col("id").as("o_id"), col("grams").as("b_grams"),
        col("sz").as("b_sz")), "o_id")
      .withColumn("inter",
        expr("sorted_intersect_size(a_grams, b_grams)").cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("a_sz") + col("b_sz") - col("inter")), 6))
      .where(col("jaccard") >= minSim)
    val best = near
      .withColumn("rn", row_number().over(Window.partitionBy("id")
        .orderBy(col("jaccard").desc, col("o_id"))))
      .where(col("rn") === 1)
      .select(col("id"), col("o_id").as("near_src"),
        col("jaccard").as("near_jaccard"))

    newDf.select(col(idCol).as("id"))
      .join(exact, Seq("id"), "left")
      .join(best, Seq("id"), "left")
      .select(col("id").as(idCol), col("exact_src"),
        col("near_src"), col("near_jaccard"))
  }

  /** Exact n-gram CONTAINMENT join — quote/excerpt detection, the
    * asymmetric near-dup case symmetric Jaccard blocking structurally
    * misses: a 20-word quote inside a 2000-word article has Jaccard
    * ≈ 0.01 but containment 1.0. Containment(q in c) =
    * |grams(q) ∩ grams(c)| / |grams(q)|.
    *
    * Exact prefix blocking by pigeonhole: if containment ≥ t then at most
    * ⌊(1−t)·|q|⌋ of q's grams are missing from c, so among the first
    * ⌊(1−t)·|q|⌋+1 grams of q (in the fixed hash-sorted order) at least
    * one appears in c — candidates are (query-prefix gram) ⋈ (corpus
    * inverted index), complete by construction. Two further exact prunes
    * ride the join: |c| ≥ t·|q| (c must hold the overlap), and the PPJoin
    * positional bound min(i,j)+1+min(|q|−i−1, |c|−j−1) ≥ t·|q| (shared
    * grams sort consistently on both sides).
    *
    * Scale shape (100 TB): the query side is the small one (quotes, eval
    * probes, suspected excerpts) — only its prefixes explode; the corpus
    * side contributes one inverted-index shuffle keyed by gram (the same
    * cost as the gram-frequency pass every set-similarity operator pays).
    * Verification re-joins the bounded candidate set against the cached
    * per-doc sorted hash arrays and runs the codegen'd merge walk
    * ([[graft.functions.SortedIntersectSize]]). On an adversarially
    * Zipf-skewed corpus, compose with [[ngramJaccardPairs]]'s
    * rarest-first heavy-hitter reorder so hot grams leave the prefixes;
    * the plain hash order is the right default everywhere else.
    */
  def containmentJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
                      textCol: String, n: Int, minCont: Double): DataFrame = {
    require(minCont > 0 && minCont <= 1, s"minCont=$minCont")
    graft.functions.SortedIntersectSize.register(queries.sparkSession)
    graft.functions.NgramHashes.register(queries.sparkSession)
    val par = queries.sparkSession.sparkContext.defaultParallelism
    def shingle(df: DataFrame): DataFrame = df
      .repartition(par)
      .select(col(idCol).as("id"),
        filter(split(col(textCol), " "), w => w =!= "").as("words"))
      .select(col("id"),
        call_function("ngram_hashes", col("words"), lit(n)).as("grams"))
      .withColumn("sz", size(col("grams")))
      .where(col("sz") > 0)
    val q = shingle(queries).persist()
    val c = shingle(corpus).persist()

    // prefix ⌊(1−t)·sz⌋+1, clamped into [1, sz]
    val prefLen = least(
      (floor(col("sz").cast("double") * lit(1 - minCont) + lit(1e-9)) + 1)
        .cast("int"), col("sz"))
    val qpref = q.select(col("id").as("q_id"), col("sz").as("q_sz"),
        posexplode(slice(col("grams"), lit(1), prefLen)))
      .toDF("q_id", "q_sz", "q_pos", "gram")
    val cindex = c.select(col("id").as("c_id"), col("sz").as("c_sz"),
        posexplode(col("grams")))
      .toDF("c_id", "c_sz", "c_pos", "gram")
      .repartition(par, col("gram"))
    val needed = col("q_sz").cast("double") * lit(minCont) - lit(1e-9)
    val posBound = least(col("q_pos"), col("c_pos")) + 1 +
      least(col("q_sz") - col("q_pos") - 1, col("c_sz") - col("c_pos") - 1)
    val cand = qpref.join(cindex,
        qpref("gram") === cindex("gram") && col("q_id") =!= col("c_id") &&
          col("c_sz").cast("double") >= needed &&
          posBound.cast("double") >= needed)
      .select(col("q_id"), col("c_id")).distinct()

    cand
      .join(q.select(col("id").as("q_id"), col("grams").as("q_grams"),
        col("sz").as("q_sz")), "q_id")
      .join(c.select(col("id").as("c_id"), col("grams").as("c_grams")), "c_id")
      .withColumn("inter",
        expr("sorted_intersect_size(q_grams, c_grams)").cast("double"))
      .select(col("q_id"), col("c_id"),
        round(col("inter") / col("q_sz"), 6).as("containment"))
      .where(col("containment") >= minCont)
  }

  /** MinHash+LSH near-duplicate pairs, verified with exact n-gram Jaccard.
    * numHashes must be divisible by bandRows. Pipeline:
    * shingle → signature (map-only) → band explode → bucket join on band
    * key → distinct candidate pairs → Jaccard verify against re-joined
    * shingle sets. Only (id, band_key) and (id, grams-of-candidates)
    * shuffle. Hashing is [[PortableHash]] (mod-1e9+7 integer math), so the
    * DuckDB oracle reproduces signatures and band keys exactly. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, numHashes: Int, bandRows: Int,
                      minSim: Double): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must divide into bands")
    // barrier + cache: g feeds signature generation and both verify joins;
    // see ngramJaccardPairs for why both exchanges are load-bearing
    val par2 = df.sparkSession.sparkContext.defaultParallelism
    // both per-document arrays come from native kernels over the words
    // array — no gram string is ever materialized, no interpreted UDF:
    // band keys from minhash_band_keys (bit-identical to the former
    // string-gram + ScalaUDF path, reproduced by the DuckDB oracle),
    // verify intersections on ngram_hashes' sorted 64-bit hashes
    // (codegen'd merge walk; distinct counts unchanged w.h.p. — same
    // trade as ngramJaccardPairs)
    graft.functions.SortedIntersectSize.register(df.sparkSession)
    graft.functions.NgramHashes.register(df.sparkSession)
    graft.functions.MinhashBandKeys.register(df.sparkSession)
    val g0 = df.repartition(par2)
      .select(col(idCol).as("id"),
        filter(split(col(textCol), " "), w => w =!= "").as("words"))
      .repartition(par2, col("id"))
      .select(col("id"),
        call_function("ngram_hashes", col("words"), lit(n)).as("hgrams"),
        call_function("minhash_band_keys", col("words"),
          lit(n), lit(numHashes), lit(bandRows)).as("bands"))
      .withColumn("sz", size(col("hgrams")))
      // collapse key INSIDE the cache: md5 over the stringified gram-hash
      // array is the expensive expression of the collapse, and as a
      // derived column below the cache every downstream reference (rep
      // table, membership, within-group pairs) re-ran the transform +
      // array_join + md5 pass — measured 5 full passes at sf0.1 (guide
      // §1.2 step 2: make the per-task work run once)
      .withColumn("gk",
        md5(array_join(transform(col("hgrams"), _.cast("string")), ",")))
      .cache()
    // materialized before fan-out — same stampede trade as
    // ngramJaccardPairs: the band leg and both verify-join legs would
    // otherwise each recompute the signature pipeline on a time-shared host
    g0.count()
    // gram-less docs can never pair. The guard sits ABOVE the cache barrier:
    // pushed below it, the size filter re-derives the shingling pipeline
    // inside the single-file parquet scan and runs it serially (measured
    // 14 s of p3's 21 s at sf0.1 — same trap as ngramJaccardPairs' guard).
    val g = g0.where(size(col("hgrams")) > 0)
    // exact-equal collapse BEFORE banding (the round-11 hot-bucket fix):
    // documents with identical distinct-gram sets — byte-identical texts,
    // trivially — band once through a representative, so an m-item
    // identical cluster contributes ONE signature per band bucket instead
    // of m (candidate generation O(m), never m²/2 before any verify).
    // Collapse key = md5 of the sorted gram-hash array (computed once in
    // the g0 cache above): equal key ⇔ equal gram set (w.h.p., the
    // documented gram-hash trade). Jaccard depends only on the gram set,
    // so every member pair inherits its representatives' verified
    // similarity EXACTLY, and same-set pairs are Jaccard 1 ≥ minSim by
    // definition — the expanded pair list is bit-identical to the
    // uncollapsed one.
    //
    // membership (id → rep = min id of its gram-set group) via ONE
    // narrow (id, gk) window shuffle instead of groupBy + join-back (two
    // exchanges over the same rows — guide §2.4); persisted because the
    // rep filter, the within-group pairs, and both expansion joins read
    // it (freed after the eager materialization of the result below)
    val memb = g.select(col("id"), col("gk"))
      .select(col("id"),
        min("id").over(Window.partitionBy("gk")).as("rep_id"))
      .persist()
    // persisted: the two band-explode legs of the candidate self-join and
    // both verify joins each re-derived this join (exchange reuse does not
    // cover self-join legs here — the p2 prefix-join lesson, confirmed in
    // the p23 stage profile: four ~12 s-CPU recomputes at sf0.1)
    val reps = g.join(
      memb.where(col("id") === col("rep_id")).select(col("id")), "id")
      .persist()
    val candidates = repBandCandidates(reps)
    val repPairs = candidates
      .join(reps.select(col("id").as("a_id"), col("hgrams").as("a_grams"),
        col("sz").as("a_sz")), "a_id")
      .join(reps.select(col("id").as("b_id"), col("hgrams").as("b_grams"),
        col("sz").as("b_sz")), "b_id")
      .withColumn("inter",
        expr("sorted_intersect_size(a_grams, b_grams)").cast("double"))
      .select(col("a_id"), col("b_id"),
        round(col("inter") / (col("a_sz") + col("b_sz") - col("inter")), 6)
          .as("jaccard"))
      .where(col("jaccard") >= minSim)
    // expansion: same-set member pairs (Jaccard exactly 1), then every
    // cross-set member pair under its representatives' verified score.
    // rep_id (a long) stands in for gk (32-char string) as the group key:
    // min-id-per-group is unique per group, so equality is equivalent —
    // and the self-join shuffles 16 bytes/row instead of ~48 (guide §2.3)
    val within = memb.as("a").join(memb.as("b"),
        col("a.rep_id") === col("b.rep_id") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        lit(1.0).as("jaccard"))
    val cross = repPairs
      .join(memb.select(col("rep_id").as("a_id"), col("id").as("ma")), "a_id")
      .join(memb.select(col("rep_id").as("b_id"), col("id").as("mb")), "b_id")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("jaccard"))
    // eager materialization of the (narrow) pair list so the working set
    // can be freed here instead of accumulating in the session cache
    // across invocations (the Multimodal convention)
    val pairs = within.unionByName(cross).localCheckpoint(true)
    g0.unpersist()
    memb.unpersist()
    reps.unpersist()
    pairs
  }

  /** The rep-level LSH band self-join [[minhashLshPairs]] verifies:
    * (a_id, b_id) pairs of representatives sharing at least one band key.
    * Package-visible so the hot-bucket fixture can count-assert that an
    * m-item exact-duplicate cluster — ONE representative after the
    * collapse — generates zero rep-level candidates instead of m²/2. */
  private[graft] def repBandCandidates(reps: DataFrame): DataFrame = {
    val banded = reps.select(col("id"), explode(col("bands")).as("band_key"))
    banded.as("a").join(banded.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** [[minhashLshPairs]]'s collapse front end, exposed for the hot-bucket
    * fixture: one representative row (id, hgrams, bands, sz) per DISTINCT
    * gram set in `df`. */
  private[graft] def minhashReps(df: DataFrame, idCol: String,
                                 textCol: String, n: Int, numHashes: Int,
                                 bandRows: Int): DataFrame = {
    graft.functions.NgramHashes.register(df.sparkSession)
    graft.functions.MinhashBandKeys.register(df.sparkSession)
    val g = df
      .select(col(idCol).as("id"),
        filter(split(col(textCol), " "), w => w =!= "").as("words"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"),
        call_function("ngram_hashes", col("words"), lit(n)).as("hgrams"),
        call_function("minhash_band_keys", col("words"),
          lit(n), lit(numHashes), lit(bandRows)).as("bands"))
      .withColumn("sz", size(col("hgrams")))
      .where(col("sz") > 0)
      .withColumn("gk",
        md5(array_join(transform(col("hgrams"), _.cast("string")), ",")))
    val uniq = g.groupBy("gk").agg(min("id").as("rep_id"))
    g.join(uniq.select(col("rep_id").as("id")), "id")
      .select("id", "hgrams", "bands", "sz")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked by
    * 15-bit signature chunks (a pair within distance d <= 3 shares at least
    * one of 4 chunks exactly — pigeonhole), so no all-pairs comparison.
    * The 60-bit signature is [[PortableHash.simhash60]], reproducible by
    * the DuckDB oracle. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-chunk blocking guarantees recall only for dist<=3")
    val shUdf = udf((text: String) =>
      PortableHash.simhash60(text.split(" ").filter(_.nonEmpty).toSeq))
    val g = df.select(col(idCol).as("id"), shUdf(col(textCol)).as("sh"))
    val chunked = g.select(col("id"), col("sh"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("sh"), c * 15).bitwiseAND(0x7FFFL).as("v"))): _*))
        .as("chunk"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.sh").as("a_sh"), col("b.sh").as("b_sh"))
      .distinct()
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .where(col("hamming") <= maxDist)
      .select("a_id", "b_id", "hamming")
  }

  /** Duplicated-span scrub (the RefinedWeb/C4 "remove repeated lines"
    * rule, formulated over fixed-width word spans because the corpus has
    * no line structure): chop every document into consecutive
    * `spanWords`-word spans, count in how many distinct documents each
    * span occurs corpus-wide, and drop every span seen in more than one
    * document. Emits per doc: span count, dropped count, and the md5 of
    * the scrubbed text (spans rejoined in document order).
    *
    * Scale: span TEXT never keys a shuffle — only (doc_id, span_idx,
    * 64-bit span hash) rows reach the frequency aggregation and the
    * duplicate semi-join, and the scrubbed text is rebuilt from each
    * doc's own spans array (one row per doc, partitioned by doc_id from
    * the start) by joining back just the small per-doc dropped-index
    * list. No corpus-wide broadcast: the earlier formulation broadcast
    * EVERY distinct span hash to the rebuild join — unboundable at
    * 100 TB — where the dropped-index side here is bounded by the
    * duplicated subset. Span identity is the 64-bit xxhash64, exact
    * w.h.p. (a collision needs two distinct spans with equal hashes in
    * the same corpus — same trade as ngramJaccardPairs' gram hashes).
    * Intra-document repeats are NOT dropped (n_docs counts distinct docs)
    * — that's the reference rule's semantics, not an accident. */
  def spanScrub(df: DataFrame, idCol: String, textCol: String,
                spanWords: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // same two load-bearing exchanges as ngramJaccardPairs: spread the
    // per-row lambdas off the tiny scan, then a barrier so CollapseProject
    // can't inline `words` into every slice()
    // cache: d (one row per doc) feeds the hash stream and the rebuild —
    // cheaper to hold than the exploded per-span rows, and the rebuild
    // reuses its doc_id partitioning (no second text shuffle)
    val d = df.repartition(par)
      .select(col(idCol).as("doc_id"),
        filter(split(col(textCol), " "), w => w =!= "").as("words"))
      .repartition(par, col("doc_id"))
      .select(col("doc_id"),
        when(size(col("words")) < 1, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), ((size(col("words")) - 1) / lit(spanWords)).cast("int")),
            i => array_join(slice(col("words"), i * spanWords + 1, lit(spanWords)), " ")))
          .as("spans"))
      .cache()
    // hashes-only from here to the dropped-index list
    val spanHashes = d.select(col("doc_id"), posexplode(col("spans")))
      .toDF("doc_id", "span_idx", "span")
      .select(col("doc_id"), col("span_idx"), xxhash64(col("span")).as("span_hash"))
    val dupHashes = spanHashes.groupBy("span_hash")
      .agg(countDistinct("doc_id").as("n_docs"))
      .where(col("n_docs") > 1)
      .select("span_hash")
    // ≤ one row per doc that HAS duplicated spans; the sorted index array
    // is bounded by document length
    val dropped = spanHashes.join(dupHashes, Seq("span_hash"), "left_semi")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("span_idx"))).as("dropped_idx"))
    // rebuild map-side per doc: d is already hash-partitioned by doc_id, so
    // only the small dropped table moves; zero-span docs drop out (the
    // rule's domain is docs with at least one span)
    d.join(dropped, Seq("doc_id"), "left")
      .where(size(col("spans")) > 0)
      .select(col("doc_id"),
        size(col("spans")).as("n_spans"),
        coalesce(size(col("dropped_idx")), lit(0)).as("n_dropped"),
        md5(array_join(filter(col("spans"),
          (_, i) => !array_contains(
            coalesce(col("dropped_idx"), array().cast("array<int>")), i)), " "))
          .as("clean_hash"))
  }

  /** Content-keyed anchor positions + grams over a (doc_id, text)
    * relation — the shared front end of [[exactSubstrSpans]] and
    * [[substrContamination]]. O(n) rolling-hash selection; gram strings
    * extracted only AT anchors (~n/stride of positions). Because the
    * anchor rule depends only on CONTENT, two copies of a duplicated
    * substring anchor at the same content-relative positions even across
    * relations. */
  private def contentAnchors(d: DataFrame, k: Int, stride: Int): DataFrame = {
    val par = d.sparkSession.sparkContext.defaultParallelism
    graft.functions.RollingAnchors.register(d.sparkSession)
    d.where(length(col("text")) >= k)
      .repartition(par)
      .select(col("doc_id"), col("text"),
        explode(call_function("rolling_anchors", col("text"), lit(k),
          lit(stride))).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos + 1, $k)").as("gram"))
  }

  /** Greedy both-direction extension of witness anchors against their
    * canonical occurrence, then per-doc maximal-island merge — the shared
    * back end of [[exactSubstrSpans]] and [[substrContamination]].
    * `pairs` carries (b_id, b_pos, a_pos, atext, btext); returns one row
    * per island (doc_id, span_start, span_len), offsets in code points.
    * Extension is row-local in CODE POINTS (matching Spark length/substr
    * and DuckDB length/substr — Java charAt would count UTF-16 units and
    * diverge beyond the BMP). */
  private def extendMergeIslands(pairs: DataFrame, k: Int,
                                 maxExt: Int): DataFrame = {
    val ext = udf((aText: String, aPos: Int, bText: String, bPos: Int) => {
      val ac = aText.codePoints().toArray
      val bc = bText.codePoints().toArray
      var el = 0
      while (el < maxExt && aPos - el - 1 >= 0 && bPos - el - 1 >= 0 &&
        ac(aPos - el - 1) == bc(bPos - el - 1)) el += 1
      var er = 0
      while (er < maxExt && aPos + k + er < ac.length &&
        bPos + k + er < bc.length &&
        ac(aPos + k + er) == bc(bPos + k + er)) er += 1
      (el, er)
    })
    val spans = pairs
      .withColumn("e", ext(col("atext"), col("a_pos"),
        col("btext"), col("b_pos")))
      .select(col("b_id").as("doc_id"),
        (col("b_pos") - col("e._1")).as("start"),
        (col("b_pos") + lit(k) + col("e._2")).as("endp"))
    // maximal-island merge: a span starts a new island iff it begins
    // strictly after every earlier span's end (touching spans are one
    // contiguous duplicated region). Equal-start ties are order-immune:
    // the later row's start can never exceed the earlier's end (≥ start+k)
    val iw = Window.partitionBy("doc_id").orderBy("start", "endp")
    spans
      .withColumn("prev_max",
        max("endp").over(iw.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nw",
        when(col("prev_max").isNull || col("start") > col("prev_max"), 1)
          .otherwise(0))
      .withColumn("island", sum("nw").over(iw))
      .groupBy("doc_id", "island")
      .agg(min("start").as("span_start"), max("endp").as("span_end"))
      .select(col("doc_id"), col("span_start").cast("int").as("span_start"),
        (col("span_end") - col("span_start")).cast("int").as("span_len"))
  }

  /** Exact duplicated-substring detection at ARBITRARY character offsets
    * — the operator [[spanScrub]]'s fixed word spans approximate. The
    * published standard is the suffix-array ExactSubstr dedup of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better"); a distributed suffix array is out of scope, so this is the
    * bounded-shuffle anchor-and-extend approximation with an explicit
    * contract:
    *
    *   - ANCHORS: every k-code-point gram whose poly31 rolling hash
    *     ([[graft.functions.RollingAnchors]], a native O(n) codegen
    *     expression — no gram string is materialized off-anchor) is
    *     ≡ 0 mod `stride`. The anchor choice depends only on CONTENT,
    *     so two copies of a duplicated substring anchor at the same
    *     content-relative positions: any duplicated run of ≥ k +
    *     stride·16 code points contains a shared anchor with probability
    *     ≈ 1 − (1−1/stride)^16 per 16-gram window (misses shrink
    *     geometrically; stride=1 is exact for runs ≥ k).
    *   - KEEP-FIRST per anchor gram: occurrence 1 in (doc_id, pos) order
    *     is canonical; occurrences 2..`bucketCap` become witnesses (a
    *     gram seen in > bucketCap places contributes bucketCap−1
    *     witnesses — heavier truncation only for pathologically common
    *     grams, the documented occupancy bound that keeps bucket work
    *     linear).
    *   - EXTEND-AND-VERIFY: each witness extends against its canonical,
    *     greedy both directions, capped at `maxExt` code points per side
    *     (longer duplicated runs are still fully covered — their interior
    *     anchors extend too and the spans union).
    *   - Overlapping witness spans per doc merge into maximal islands.
    *
    * Returns one row per island: (doc_id, span_start, span_len), offsets
    * in code points, 0-based. Canonical (first-in-corpus) occurrences are
    * never reported — they are what dedup keeps.
    *
    * Scale shape: gram explosion is map-side and the anchor filter runs
    * BEFORE any exchange, so only ~1/stride of positions shuffle (k-char
    * key + two ints); the bucket cap is a rank-limit window (partial
    * WindowGroupLimit below the exchange); witness↔canonical pairing is
    * a self-join on the anchor relation bounded by bucketCap; texts ship
    * only to PAIR rows (bounded by duplicated-anchor volume, not corpus
    * volume). Nothing is all-pairs, nothing is corpus-broadcast. */
  def exactSubstrSpans(df: DataFrame, idCol: String, textCol: String,
                       k: Int, stride: Int, maxExt: Int,
                       bucketCap: Int): DataFrame = {
    require(k >= 4, s"k=$k")
    require(stride >= 1, s"stride=$stride")
    require(maxExt >= 0, s"maxExt=$maxExt")
    require(bucketCap >= 2, s"bucketCap=$bucketCap")
    // read three times (gram stream + both extension sides): the
    // operator's working set, freed with the caller's caches. Serialized
    // + disk-spillable on purpose — this relation holds FULL corpus
    // texts, much heavier than the narrow (id, key) working sets the
    // other persists here cache, so deserialized-on-heap residency would
    // pressure execution memory for the rest of the session.
    val d = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val w = Window.partitionBy("gram").orderBy("doc_id", "pos")
    // persist: the canonical and witness sides both read this relation —
    // without it the gram explosion (the dominant O(n·k) map cost) and
    // the anchor shuffle run twice. Backs the lazily-returned result →
    // the operator's working set, freed with the caller's caches
    val ranked = contentAnchors(d, k, stride)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= bucketCap)
      .persist()
    val canon = ranked.where(col("rn") === 1)
      .select(col("gram"), col("doc_id").as("a_id"), col("pos").as("a_pos"))
    val wit = ranked.where(col("rn") > 1)
      .select(col("gram"), col("doc_id").as("b_id"), col("pos").as("b_pos"))
    val pairs = wit.join(canon, "gram")
      .join(d.select(col("doc_id").as("a_id"), col("text").as("atext")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("text").as("btext")), "b_id")
    extendMergeIslands(pairs, k, maxExt)
  }

  /** Substring-level benchmark decontamination — [[contaminationFlags]]'s
    * screen upgraded from fixed word n-grams to ARBITRARY character
    * offsets, by pointing [[exactSubstrSpans]]'s content-keyed anchor
    * machinery at an eval set: corpus anchors that match an eval-set
    * anchor gram extend against the eval occurrence, overlapping matches
    * merge into islands, and every corpus document reports
    * (doc_id, n_spans, contam_chars, contam_frac, contaminated) with
    * `contam_frac` = contaminated code points / document length and the
    * flag at `minFrac`. An eval sentence embedded mid-paragraph at an
    * unaligned offset — which shifts every fixed-width span boundary and
    * corrupts the boundary words' n-grams — is caught because anchors
    * are chosen by CONTENT, so the shared substring anchors at the same
    * content-relative positions in both relations.
    *
    * Scale shape: the corpus side anchors at ~1/stride of positions
    * map-side before any exchange; the eval side is the small side by
    * construction (eval sets are thousands of docs against a 100 TB
    * corpus) and keeps ONE canonical occurrence per gram; pairing is a
    * join on the anchor gram bounded by `bucketCap` corpus witnesses
    * per gram; texts ship only to matched-pair rows. */
  def substrContamination(corpus: DataFrame, evalSet: DataFrame,
                          idCol: String, textCol: String,
                          k: Int, stride: Int, maxExt: Int,
                          bucketCap: Int, minFrac: Double): DataFrame = {
    require(k >= 4, s"k=$k")
    require(stride >= 1, s"stride=$stride")
    require(maxExt >= 0, s"maxExt=$maxExt")
    require(bucketCap >= 1, s"bucketCap=$bucketCap")
    val dc = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val de = evalSet.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .persist()
    val w = Window.partitionBy("gram").orderBy("doc_id", "pos")
    // ONE canonical eval occurrence per gram (first in (doc_id, pos)
    // order) — extension against any occurrence of the shared content
    // yields the same island, so one witness-per-gram is lossless here
    val canon = contentAnchors(de, k, stride)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("gram"), col("doc_id").as("a_id"), col("pos").as("a_pos"))
    val wit = contentAnchors(dc, k, stride)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= bucketCap)
      .select(col("gram"), col("doc_id").as("b_id"), col("pos").as("b_pos"))
    val pairs = wit.join(canon, "gram")
      .join(de.select(col("doc_id").as("a_id"), col("text").as("atext")), "a_id")
      .join(dc.select(col("doc_id").as("b_id"), col("text").as("btext")), "b_id")
    val stats = extendMergeIslands(pairs, k, maxExt)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum("span_len").cast("long").as("contam_chars"))
    dc.select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"),
        round(when(col("len") > 0,
          coalesce(col("contam_chars"), lit(0L)).cast("double") / col("len"))
          .otherwise(lit(0.0)), 6).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= minFrac)
  }

  /** [[exactSubstrSpans]] applied: remove every reported island from its
    * document. Emits ALL documents: (doc_id, n_spans, dup_chars,
    * clean_hash) with clean_hash = md5 of the text with islands cut out
    * (the original text's md5 when nothing matched). */
  def exactSubstrScrub(df: DataFrame, idCol: String, textCol: String,
                       k: Int, stride: Int, maxExt: Int,
                       bucketCap: Int): DataFrame = {
    val islands = exactSubstrSpans(df, idCol, textCol, k, stride, maxExt,
        bucketCap)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_len"))))
        .as("cuts"))
    val cut = udf((text: String, cuts: Seq[org.apache.spark.sql.Row]) => {
      val cps = text.codePoints().toArray
      val keep = Array.fill(cps.length)(true)
      cuts.foreach { r =>
        val s = r.getInt(0); val e = math.min(s + r.getInt(1), cps.length)
        var i = math.max(s, 0)
        while (i < e) { keep(i) = false; i += 1 }
      }
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < cps.length) { if (keep(i)) sb.appendCodePoint(cps(i)); i += 1 }
      sb.toString
    })
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(size(col("cuts")), lit(0)).as("n_spans"),
        coalesce(aggregate(col("cuts"), lit(0),
          (acc, c) => acc + c.getField("span_len")), lit(0)).as("dup_chars"),
        md5(cut(col("text"),
          coalesce(col("cuts"),
            array().cast("array<struct<span_start:int,span_len:int>>"))))
          .as("clean_hash"))
  }

  /** Benchmark-contamination screen (the n-gram-overlap decontamination
    * rule of GPT-3/PaLM-style training pipelines): for every training
    * document, the fraction of its distinct word n-grams that also occur
    * anywhere in the benchmark set, plus a flag at `minFrac`.
    *
    * Scale shape: the benchmark side is the SMALL side by construction
    * (eval sets are thousands of docs, the corpus is the 100 TB side) —
    * its distinct gram hashes become a broadcast build side, the corpus
    * explodes its grams map-side and joins without shuffling text, and
    * only (doc_id, hit) pairs reach the per-doc count. */
  def contaminationFlags(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int, minFrac: Double): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    graft.functions.NgramHashes.register(corpus.sparkSession)
    def grams(df: DataFrame) = df.repartition(par)
      .select(col(idCol).as("doc_id"),
        filter(split(col(textCol), " "), w => w =!= "").as("words"))
      .repartition(par, col("doc_id"))
      // both sides hash grams with the same native kernel, so membership
      // is preserved without materializing gram strings
      .select(col("doc_id"),
        call_function("ngram_hashes", col("words"), lit(n)).as("grams"))
    val benchGrams = grams(benchmark)
      .select(explode(col("grams")).as("gram")).distinct()
    // explode_outer: a doc shorter than n words keeps its row (null gram,
    // zero hits) instead of silently vanishing from the screen table
    val corpusGrams = grams(corpus)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode_outer(col("grams")).as("gram"))
    corpusGrams
      .join(broadcast(benchGrams.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy("doc_id", "n_grams")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(when(col("n_grams") > 0,
          col("n_contaminated").cast("double") / col("n_grams")).otherwise(0.0), 6)
          .as("contaminated_frac"))
      .withColumn("flagged", col("contaminated_frac") >= minFrac)
  }

  /** Dedup resolution: near-dup PAIRS (from any of the generators above)
    * become duplicate CLUSTERS via connected components, and each cluster
    * keeps exactly one representative — the minimum doc id (swap in a
    * quality-ranked min by re-keying ids if curation wants "best", not
    * "first"). Returns every corpus doc with its cluster and keep flag, so
    * the keep-list is `where(keep)`.
    *
    * Transitivity is the point: A≈B and B≈C dedup {A,B,C} to one doc even
    * when A,C were never compared (LSH won't compare every pair at scale).
    */
  /** Sorted-neighborhood blocking (Hernández–Stolfo SNM): sort the corpus
    * by a cheap blocking key, slide a window of `w` records, and emit
    * every in-window pair as a dedup candidate — the classic complement
    * to hash blocking (LSH buckets miss near-misses that SORT adjacent,
    * e.g. typo'd prefixes; SNM catches exactly those).
    *
    * Distributed total rank without a global sort on one task:
    * `repartitionByRange(key, id)` range-partitions the corpus, the
    * per-partition rank is a window over `spark_partition_id()` (each
    * task sorts only its own range), and per-partition row counts —
    * a ≤numPartitions-row relation — cumulate into offsets that add to
    * the local rank. The corpus itself is sorted once, partition-local.
    * Global rank is well-defined regardless of where the range
    * boundaries fall because (key, id) is a total order.
    *
    * Pair generation never self-joins on an inequality: ranks bucket by
    * ⌊(rank−1)/(w−1)⌋, the right side replicates into its own and the
    * PREVIOUS bucket, and the equi-join on bucket + a rank-distance
    * filter yields exactly the pairs with 1 ≤ rank_b − rank_a ≤ w−1 —
    * shuffle volume 2·N tiny (id, key, rank) rows, text never moves. */
  def sortedNeighborhood(df: DataFrame, idCol: String, key: Column,
                         window: Int): DataFrame = {
    require(window >= 2, s"window=$window must be >= 2")
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val b = window - 1
    val keyed = df.select(col(idCol).as("id"), key.as("key"))
      .repartitionByRange(par, col("key"), col("id"))
      .withColumn("pid", spark_partition_id())
    val localW = Window.partitionBy("pid").orderBy("key", "id")
    val local = keyed.withColumn("lrn", row_number().over(localW))
    // per-partition counts: ≤ par rows — the one single-partition window
    // in the operator runs over THIS relation, never the corpus
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum("cnt").over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("pid", "off")
    // persist: both pair sides read the ranked relation (tiny: id, key,
    // rank) — without it the range partition + local sort re-runs twice.
    // Backs the lazily-returned pairs → cannot unpersist here; the
    // operator's working set, freed with the caller's caches
    val ranked = local.join(broadcast(offsets), Seq("pid"))
      .select(col("id"), col("key"), (col("off") + col("lrn")).as("rn"))
      .persist()
    val aSide = ranked.select(col("id").as("a_id"), col("key").as("a_key"),
      col("rn").as("a_rn"), expr(s"(rn - 1) div $b").as("bucket"))
    val bSide = ranked.select(col("id").as("b_id"), col("key").as("b_key"),
        col("rn").as("b_rn"), expr(s"(rn - 1) div $b").as("bk"))
      .select(col("b_id"), col("b_key"), col("b_rn"),
        explode(array(col("bk"), col("bk") - 1)).as("bucket"))
    aSide.join(bSide, Seq("bucket"))
      .where((col("b_rn") - col("a_rn")).between(1, b))
      .select(col("a_id"), col("b_id"), col("a_key"), col("b_key"),
        (col("b_rn") - col("a_rn")).cast("int").as("rank_dist"))
  }

  def resolveByComponents(corpus: DataFrame, idCol: String,
                          pairs: DataFrame): DataFrame = {
    val labels = graft.geo.ConnectedComponents.label(
      corpus.sparkSession,
      pairs.select(col("a_id").as("a"), col("b_id").as("b")))
    corpus.select(col(idCol).as("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
  }
}
