package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — distributed train + apply in
  * one pass structure. The engine's stand-in for the fastText-style linear
  * classifier every curation pipeline runs (CCNet's language filter,
  * quality classifiers à la GPT-3/LLaMA data work): NB is the
  * closed-form member of that family, which is exactly what makes it
  * DETERMINISTIC — training is nothing but integer count aggregation, so
  * the trained model (and therefore every prediction) is reproducible
  * across runs, partitionings, and engines, with no SGD order
  * sensitivity.
  *
  * Model: vocabulary capped to the top `vocabK` words (count desc, word
  * asc — the p22/p58 convention), everything else folding into the ''
  * unk symbol; add-one smoothing over the mapped symbol space;
  * `score(d, c) = ln(N_c/N) + Σ_pos ln((C(c, w_pos)+1)/(T_c+V))`,
  * argmax over classes with class-name tie-break.
  *
  * Distributed shape (100 TB):
  *  - training is TWO hash aggregates: global word counts (top-k window
  *    for the vocab — rank-limit pushed down) and per-(class, symbol)
  *    counts, the latter bounded at |classes|·(vocabK+1) rows — a
  *    broadcast artifact no matter the corpus size;
  *  - scoring explodes each doc once, joins the BROADCAST count table
  *    (map-side), and folds per-(doc, class) log terms in POSITION
  *    order (sort_array over collected (pos, term) structs — float
  *    addition is not associative, so the fold order is pinned; the
  *    oracle mirrors with `list_sum(list(x ORDER BY pos))`);
  *  - the per-doc argmax is one |classes|-row window per doc.
  *
  * Docs with no tokens score prior-only for every class (the docs ×
  * classes frame is built first and log-term sums left-join onto it).
  */
object NaiveBayes {

  /** Whether the training/scoring passes should be widened to the session
    * parallelism. A SINGLE-partition input means less than one input split
    * of data — there the serial pipelines with overlapping broadcast
    * builds measured FASTER than full-width stages (round-12 A/B under
    * host contention), so it keeps its shape. An input that is
    * multi-partition yet well below the session's parallelism carries
    * multiple splits' worth of data on too few tasks — a pre-split
    * production corpus never hits this (its scan arrives ≥ parallelism
    * partitions), but a coalesced upstream would otherwise run every
    * tokenize pass nearly serially. */
  private[pipeline] def underParallel(inputParts: Int, parallelism: Int): Boolean =
    inputParts > 1 && inputParts < parallelism / 2

  /** Train on (`idCol`, `textCol`, `labelCol`) and classify every row.
    * Self-classification (train set = apply set) is the operator's
    * catalog shape; disjoint train/apply splits compose from the same
    * pieces. Returns (idCol, labelCol, pred, logp) — `pred` the argmax
    * class, `logp` its rounded-6 log posterior (up to the shared
    * evidence constant). */
  def trainPredict(df0: DataFrame, idCol: String, textCol: String,
                   labelCol: String, vocabK: Int = 50): DataFrame = {
    require(vocabK > 0, s"vocabK=$vocabK")
    val par = df0.sparkSession.sparkContext.defaultParallelism
    val df = if (underParallel(df0.rdd.getNumPartitions, par))
      df0.repartition(par, col(idCol)) else df0
    val toks = df.select(col(idCol), col(labelCol),
      TextAnalysis.words(col(textCol)).as("ws"))

    // vocab: top-k global words; everything else maps to '' (unk)
    val wordCounts = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // orderBy+limit plans as TakeOrderedAndProject — a distributed
    // top-k, not a single-task global window (the p24 lesson)
    val vocab = wordCounts
      .orderBy(col("cnt").desc, col("w").asc).limit(vocabK)
      .select(col("w"))

    val mapped = toks
      .select(col(idCol), col(labelCol), posexplode(col("ws")).as(Seq("pos", "w")))
      .join(broadcast(vocab.withColumn("in_vocab", lit(true))), Seq("w"), "left")
      .select(col(idCol), col(labelCol), col("pos"),
        when(col("in_vocab"), col("w")).otherwise(lit("")).as("tok"))

    // class priors and the bounded (class, symbol) count table
    val classes = df.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).as("n_docs"))
    val nDocs = df.count()
    val ct = mapped.groupBy(col(labelCol).as("c"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val tc = ct.groupBy("c").agg(sum("cnt").as("t_c"))
    // V = |mapped symbol space| actually observed (≤ vocabK + 1)
    val v = mapped.select("tok").distinct().count()

    // per-(doc, class) log-term sums, folded in position order; the
    // (class, cnt) side broadcasts — corpus rows never reshuffle for it
    val terms = mapped.select(col(idCol), col("pos"), col("tok"))
      .crossJoin(broadcast(classes.select(col("c"))))
      .join(broadcast(ct), Seq("c", "tok"), "left")
      .join(broadcast(tc), Seq("c"))
      .select(col(idCol), col("c"), col("pos"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("t_c") + lit(v)).cast("double")).as("term"))
    val sums = terms.groupBy(col(idCol), col("c"))
      .agg(sort_array(collect_list(struct(col("pos"), col("term")))).as("ps"))
      .select(col(idCol), col("c"),
        aggregate(col("ps"), lit(0.0), (acc, x) => acc + x.getField("term"))
          .as("lsum"))

    // docs × classes frame (empty docs score prior-only), then argmax
    val frame = df.select(col(idCol), col(labelCol))
      .crossJoin(broadcast(classes))
      .join(sums, Seq(idCol, "c"), "left")
      .withColumn("logp",
        log(col("n_docs").cast("double") / lit(nDocs.toDouble)) +
          coalesce(col("lsum"), lit(0.0)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("logp").desc, col("c").asc)
    frame.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col(labelCol), col("c").as("pred"),
        round(col("logp"), 6).as("logp"))
  }
}
