package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): rank raw-corpus documents by how much more likely
  * their hashed n-gram features are under a TARGET distribution (a seed
  * set of in-domain documents) than under the raw corpus distribution,
  * then keep the top slice. The standard recipe for "find me more data
  * like this high-quality seed set" at pretraining scale.
  *
  * Distributed shape (100 TB):
  *  - features are hashed unigrams + bigrams into `buckets` counters
  *    (the paper's hashed n-gram parameterization) — map-only per doc;
  *  - BOTH distributions reduce in ONE shuffle of (bucket) rows with
  *    map-side partials (≤ buckets rows per partition), giving two
  *    bucket-count vectors that are a bounded driver artifact
  *    (2·buckets longs);
  *  - the per-document log importance weight is a map-only fold over the
  *    doc's feature sequence against the broadcast log-ratio table.
  *
  * Determinism: features hash with the portable [[PortableHash.poly31Cp]]
  * code-point scheme (oracle-reproducible on all text, astral included);
  * bucket counts are integers; the
  * log-ratio table is computed once (driver) and the per-doc sum folds
  * features in DOCUMENT ORDER — unigrams by position, then bigrams by
  * position — so the oracle reproduces every weight.
  */
object Dsir {

  /** Hashed feature sequence of a token list, in document order:
    * unigram buckets by position, then bigram buckets by position.
    * Hashes CODE POINTS ([[PortableHash.poly31Cp]]) because the p39
    * oracle slices DuckDB characters — identical on BMP text, and on
    * astral/emoji input both engines now fold one value per character
    * instead of Spark splitting surrogates. */
  def features(ws: Seq[String], buckets: Int): Seq[Int] = {
    val uni = ws.map(w => (PortableHash.poly31Cp(w) % buckets).toInt)
    val bi = ws.iterator.sliding(2).withPartial(false)
      .map(p => (PortableHash.poly31Cp(p.head + " " + p(1)) % buckets).toInt)
    (uni ++ bi).toSeq
  }

  /** Log importance weight per document plus the top-k selection rank:
    * (id, dsir_logw, rank ≤ k). `isTarget` marks the seed rows (they
    * stay part of the raw distribution, as in the paper). Weights use
    * add-0.5 smoothing over `buckets` cells on both distributions. */
  def topKByImportance(df: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, k: Int,
                       buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // row-local featurization UDF (run twice over the corpus: counts +
    // scoring). The production path for the hot-loop allergic is a
    // MinhashBandKeys-style codegen kernel; at catalog scale the UDF is
    // ~1 s and keeps the portable hash in one place. The coalesce keeps
    // a NULL text from reaching the UDF as a null Seq (ScalaUDFs don't
    // null-check reference inputs): null docs score 0.0, matching the
    // oracle's NULL-feats coalesce.
    val featUdf = udf((ws: Seq[String]) => features(ws, buckets))
    val base = df.select(col(idCol), isTarget.as("is_target"),
      featUdf(coalesce(TextAnalysis.words(col(textCol)),
        array().cast("array<string>"))).as("feats"))

    // one shuffle: per-bucket target/raw occurrence counts
    val countRows = base
      .select(col("is_target"), explode(col("feats")).as("b"))
      .groupBy("b")
      .agg(sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("tc"),
        count(lit(1)).as("rc"))
      .collect()
    val tCnt = new Array[Long](buckets)
    val rCnt = new Array[Long](buckets)
    countRows.foreach { r =>
      tCnt(r.getInt(0)) = r.getLong(1); rCnt(r.getInt(0)) = r.getLong(2)
    }
    val nt = tCnt.sum.toDouble
    val nr = rCnt.sum.toDouble
    val half = buckets * 0.5
    val logw = Array.tabulate(buckets) { b =>
      math.log((tCnt(b) + 0.5) / (nt + half)) -
        math.log((rCnt(b) + 0.5) / (nr + half))
    }
    val lw = array(logw.map(lit): _*)

    val scored = base.select(col(idCol),
      round(aggregate(col("feats"), lit(0.0),
        (acc, f) => acc + element_at(lw, f + 1)), 6).as("dsir_logw"))
    // orderBy + limit plans TakeOrdered (per-partition top-k then a
    // bounded merge) — a bare global rank window would sort the whole
    // corpus through one task. The rank window then runs over k rows.
    val top = scored.orderBy(col("dsir_logw").desc, col(idCol)).limit(k)
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("dsir_logw").desc, col(idCol))))
  }
}
