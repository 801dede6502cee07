package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring (Robertson & Zaragoza 2009, "The Probabilistic
  * Relevance Framework: BM25 and Beyond") — the corpus-side ranking a
  * curation pipeline uses for query-driven subset selection ("find the
  * documents most relevant to this topic seed list").
  *
  * Distributed shape (100 TB):
  *  - ONE explode + hash-agg shuffle builds the (doc, term, tf) relation
  *    and per-doc lengths; document frequencies reduce from it with a
  *    second small aggregate over distinct (term, doc) rows;
  *  - the query set is broadcast (it is small by definition), so partial
  *    scores are map-side against the doc-term relation;
  *  - per-(query, doc) totals fold the partials in LEXICOGRAPHIC TERM
  *    ORDER (sort_array over collected (term, partial) structs →
  *    left-to-right aggregate), because float addition is not
  *    associative and Spark's aggregation order is not deterministic —
  *    the DuckDB oracle mirrors with `list_sum(list(x ORDER BY term))`.
  *
  * Scores use the idf form `ln(1 + (N − df + 0.5)/(df + 0.5))`
  * (guaranteed non-negative) with the standard k1 = 1.2, b = 0.75.
  */
object Retrieval {

  /** Top-k BM25 documents per query. `queries` must have (query_id,
    * query_text); scoring tokenizes both sides with the pipeline's
    * single-space convention. Emits (query_id, doc_id, score, rank).
    *
    * Plan shape — exactly ONE corpus-sized shuffle: doc length rides the
    * explode as `size(ws)` (so no doc-length re-aggregation), the corpus
    * stats reduce map-side to one row, and the query-term semi-join
    * (broadcast) runs BEFORE any other join, so document frequencies and
    * every later stage see only matching rows. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    // the one corpus shuffle: (doc, term) counts, doc length carried along
    // (functionally dependent on doc_id — free in the grouping key)
    val terms = toks
      .select(col("doc_id"), size(col("ws")).as("dl"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    // corpus stats in ONE bounded map-side aggregate: N = docs with at
    // least one term (empty docs can match nothing anyway), avgdl
    // exact-integer-sum over count — both engines compute
    // sum(long)/count in double
    val statsRow = toks.select(size(col("ws")).cast("long").as("dl"))
      .where(col("dl") > 0)
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    val nDocs = statsRow.getLong(0)
    // an all-empty corpus has no avg (null) — any placeholder works
    // because the scoring relation is empty too; result: zero rows, not
    // an opaque NPE at plan construction
    val avgdl = if (statsRow.isNullAt(1)) 1.0 else statsRow.getDouble(1)

    val qterms = broadcast(queries
      .select(col("query_id"),
        explode(array_distinct(TextAnalysis.words(col("query_text")))).as("term")))
    // prune to query terms FIRST; df for those terms falls out of the
    // pruned relation — a query-vocabulary-sized aggregate
    val qf = terms.join(qterms, "term")
    val df = broadcast(qf.groupBy("term")
      .agg(count_distinct(col("doc_id")).as("df")))

    val partial = qf
      .join(df, "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))

    val scored = partial
      .groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("part")))).as("ps"))
      .select(col("query_id"), col("doc_id"),
        round(aggregate(col("ps"), lit(0.0), (acc, x) => acc + x.getField("part")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * per-query rankings — the standard score-free way to combine a
    * lexical (BM25) and a dense (embedding-cosine) retriever into one
    * hybrid list: rrf(q, d) = Σ_systems 1/(c + rank_s(q, d)), with a
    * document absent from one system contributing only the other term.
    * Rank-based fusion needs no score normalization across systems —
    * which is the whole point: BM25 scores and cosine similarities are
    * not commensurable.
    *
    * Determinism: ranks are integers, each reciprocal is one
    * correctly-rounded double division, and the sum is a FIXED
    * two-term expression (lexical term first) — bit-identical across
    * engines; ties on the fused score break by doc id.
    *
    * Scale shape: both inputs are already top-k relations (|queries|·k
    * rows — bounded, never corpus-sized), so the full-outer fusion join
    * and the final rank window are trivially small; the heavy lifting
    * stays inside the upstream retrievers. `c = 60` is the constant the
    * paper found robust and everyone ships.
    */
  def rrfFuse(lexical: DataFrame, dense: DataFrame, k: Int,
              c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && c >= 0, s"k=$k c=$c")
    val l = lexical.select(col("query_id"), col("doc_id"),
      col("rank").as("lex_rank"))
    val r = dense.select(col("query_id"), col("doc_id"),
      col("rank").as("dense_rank"))
    val fused = l.join(r, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("dense_rank")), lit(0.0)), 9))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Per-document top-k keyword extraction by TF-IDF — the query-free
    * counterpart of [[bm25TopK]] (corpus labeling / topic tagging rather
    * than retrieval): score(d, t) = tf · (ln((N+1)/(df+1)) + 1), the
    * smoothed idf that never hits log(0) and keeps corpus-wide terms at
    * weight ≈ tf.
    *
    * Plan shape: ONE corpus-sized shuffle builds (doc, term, tf);
    * document frequencies are a vocabulary-sized aggregate OF that
    * relation (each (doc, term) row is already distinct — no
    * count_distinct pass over the corpus); the per-doc top-k window runs
    * as a Partial WindowGroupLimit below the final rank (SPARK-37099 —
    * the p29 pattern), so no doc's full term list crosses the last
    * exchange. Emits (doc_id, term, tf, score, rank), rank ≤ k. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val terms = toks
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // N = docs with at least one term, one bounded map-side aggregate
    val nDocs = toks.where(size(col("ws")) > 0).count()
    val dfRel = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = terms.join(dfRel, "term")
      .withColumn("score",
        round(col("tf") * (log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("doc_id", "term", "tf", "score", "rank")
  }
}
