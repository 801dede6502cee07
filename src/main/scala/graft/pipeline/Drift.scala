package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift: compare the token distributions of two document sets —
  * the monitoring a continuously-ingested training corpus needs (did this
  * month's crawl shift topic/language mix? did a new source skew the
  * vocabulary?), and the per-token evidence (which words drove it).
  *
  * Per token over the UNION vocabulary with add-one smoothing:
  * p = (cA+1)/(NA+V), q = (cB+1)/(NB+V); emitted are both counts, both
  * probabilities, |p−q| (the total-variation contribution) and the KL
  * term p·ln(p/q). The top-k selection orders by the EXACT integer
  * cross-difference (cA+1)·(NB+V) − (cB+1)·(NA+V) — same sign and order
  * as p−q because the common denominator is a positive constant — so
  * which tokens make the cut never depends on floating-point rounding or
  * libm ulp differences between engines (the probabilities themselves are
  * display values, rounded).
  *
  * Scale shape (100 TB): one hash aggregation per side (only
  * (word, count) shuffles — map-side combined), a co-partitioned
  * full-outer join of the two vocabulary-sized count relations, scalar
  * totals as broadcast 1-row aggregates, and a TakeOrdered top-k (per-
  * partition heaps, no global sort). The cross-difference multiplies
  * token counts by corpus totals, so it accumulates in decimal(38,0) —
  * Long would wrap at ~10^9 tokens × 10^9 total (the Gram-matrix
  * lesson); DuckDB mirrors with HUGEINT.
  */
object Drift {

  /** Top-`k` drifted tokens between `a` and `b` (text in `textCol`,
    * whitespace tokenization, the corpus convention). Returns
    * (word, ca, cb, diff_num, pa, pb, abs_diff, kl_ab) ordered by the
    * exact |cross-difference| descending, word ascending; `diff_num`
    * stays decimal(38,0) — callers at bounded scale may cast it down. */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val par = a.sparkSession.sparkContext.defaultParallelism
    def counts(df: DataFrame, out: String): DataFrame =
      df.repartition(par)
        .select(explode(TextAnalysis.words(col(textCol))).as("word"))
        .groupBy("word").agg(count(lit(1)).as(out))
    val ca = counts(a, "ca")
    val cb = counts(b, "cb")
    // vocabulary-sized: cached because three aggregates read it (V and
    // the final projection; NA/NB also derive from it so the two corpus
    // explodes run exactly once)
    val joined = ca.join(cb, Seq("word"), "full_outer")
      .select(col("word"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .cache()
    val totals = broadcast(joined.agg(
      sum("ca").as("na"), sum("cb").as("nb"), count(lit(1)).as("v")))
    val scored = joined.crossJoin(totals)
      .withColumn("diff_num",
        (col("ca") + 1).cast("decimal(38,0)") * (col("nb") + col("v")) -
          (col("cb") + 1).cast("decimal(38,0)") * (col("na") + col("v")))
      .withColumn("pa", (col("ca") + 1) / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + 1) / (col("nb") + col("v")))
    scored
      .orderBy(abs(col("diff_num")).desc, col("word"))
      .limit(k)
      .select(col("word"), col("ca"), col("cb"),
        col("diff_num"),
        round(col("pa"), 9).as("pa"),
        round(col("pb"), 9).as("pb"),
        round(abs(col("pa") - col("pb")), 9).as("abs_diff"),
        round(col("pa") * log(col("pa") / col("pb")), 9).as("kl_ab"))
  }
}
