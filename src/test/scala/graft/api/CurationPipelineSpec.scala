package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** End-to-end funnel semantics of [[CurationPipeline.curate]] on a
  * hand-built corpus where every drop reason has a known positive, plus
  * the precedence rule (first failing stage names the drop). */
class CurationPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("curation-pipeline")
    .getOrCreate()

  // long English filler: high stopword ratio, ~50 words → quality passes
  private val good =
    "the cat sat on a mat and the dog lay in the sun while the birds " +
      "sang of summer and the wind moved to the north over a quiet field " +
      "where the farmer walked to his barn and the day went on in peace"

  test("each funnel stage drops its known positive; keepers survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, good),                                  // keep
      (2L, good),                                  // exact dup of 1
      (3L, good.replace("quiet field", "green field")), // near dup of 1
      (4L, "answer key alpha beta gamma delta epsilon zeta eta theta"), // contaminated
      (5L, "le chat le chien le jour et la nuit et le vent est la"), // French
      // detected as English (stopword hit) but short + symbol-heavy →
      // fails quality, not language
      (6L, "the $$ ## @@ :: ;; !! ^^ && **")
    ).toDF("id", "text")
    val bench = Seq((100L, "key alpha beta gamma delta epsilon zeta eta"))
      .toDF("id", "text")

    val got = CurationPipeline.curate(corpus, bench, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("drop_reason"), r.getAs[Boolean]("keep")))).toMap

    assert(got(1L) === ((null, true)))
    assert(got(2L) === (("exact_duplicate", false)))
    assert(got(3L) === (("near_duplicate", false)))
    assert(got(4L) === (("contaminated", false)))
    assert(got(5L) === (("wrong_language", false)))
    assert(got(6L) === (("low_quality", false)))
  }

  test("precedence: an exact dup that is also contaminated reports exact_duplicate") {
    import spark.implicits._
    val contaminated = "answer key alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, contaminated), (2L, contaminated), (3L, good)).toDF("id", "text")
    val bench = Seq((100L, "key alpha beta gamma delta epsilon zeta eta"))
      .toDF("id", "text")
    val got = CurationPipeline.curate(corpus, bench, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("drop_reason")).toMap
    // doc 1 is the exact-dup canonical → survives dedup, then drops as
    // contaminated; doc 2 drops at the earlier exact stage
    assert(got(1L) === "contaminated")
    assert(got(2L) === "exact_duplicate")
    assert(got(3L) === null)
  }

  test("near-dup cluster members share cluster_id; lang=null disables the filter") {
    import spark.implicits._
    // long French: passes the (English-centric) quality score on length and
    // word-length alone, so with lang=null nothing drops it
    val french = "le grand chateau ancien se trouve pres de la riviere et " +
      "les arbres verts entourent le jardin magnifique ou les oiseaux " +
      "chantent pendant la saison chaude et la lumiere douce tombe sur " +
      "les pierres anciennes du vieux village tranquille"
    val corpus = Seq(
      (1L, good), (2L, good.replace("quiet field", "green field")),
      (5L, french))
      .toDF("id", "text")
    val bench = Seq((100L, "unrelated benchmark words only")).toDF("id", "text")
    val cfg = CurationPipeline.Config(lang = null)
    val rows = CurationPipeline.curate(corpus, bench, "id", "text", cfg)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[String]("drop_reason")))).toMap
    assert(rows(1L) === ((1L, null)))          // cluster canonical kept
    assert(rows(2L)._1 === 1L)                 // same cluster as doc 1
    assert(rows(2L)._2 === "near_duplicate")
    assert(rows(5L) === ((5L, null)))          // French kept when lang=null
  }
}
