package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Eval operators against hand math: NDCG on a fixed ranked list (perfect
  * ranking → 1.0, inverted ranking < 1, no-relevant → 0) and per-class
  * precision/recall/F1 on a hand-built confusion matrix, including the
  * never-predicted and never-true class rows. */
class EvalSpec extends AnyFunSuite {

  private def session() = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("eval-spec")
    .getOrCreate()

  private def log2(x: Double) = math.log(x) / math.log(2.0)
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ndcg: perfect, inverted, and empty relevance") {
    val spark = session()
    import spark.implicits._
    try {
      // q1: rel at ranks 1,2 of 4 (perfect); q2: rel at ranks 3,4
      // (worst placement); q3: nothing relevant
      val rows = Seq(
        (1L, 1, 1), (1L, 2, 1), (1L, 3, 0), (1L, 4, 0),
        (2L, 1, 0), (2L, 2, 0), (2L, 3, 1), (2L, 4, 1),
        (3L, 1, 0), (3L, 2, 0))
        .toDF("query_id", "rank", "rel")
      val out = Eval.ndcg(rows, "query_id", "rank", col("rel") === 1)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(3))).toMap

      val idcg2 = 1.0 / log2(2.0) + 1.0 / log2(3.0)
      assert(out(1L) == ((2, 1.0)))
      val dcg2 = 1.0 / log2(4.0) + 1.0 / log2(5.0)
      assert(out(2L) == ((2, r6(dcg2 / idcg2))))
      assert(out(2L)._2 < 1.0)
      assert(out(3L) == ((0, 0.0)))
    } finally spark.stop()
  }

  test("classifierEval: hand confusion matrix incl. degenerate classes") {
    val spark = session()
    import spark.implicits._
    try {
      // truth→pred: a→a ×3, a→b ×1, b→b ×2, b→a ×1, c→b ×1
      // class d is predicted once but never true
      val t = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "b"), ("b", "a"), ("c", "b"), ("a", "d"))
        .toDF("truth", "pred")
      val out = Eval.classifierEval(t, "truth", "pred")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3),
           r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap

      // a: tp=3, fp=1 (b→a), fn=2 (a→b, a→d)
      val (pa, ra) = (3.0 / 4.0, 3.0 / 5.0)
      assert(out("a") == ((3L, 1L, 2L, r6(pa), r6(ra),
        r6(2 * pa * ra / (pa + ra)))))
      // c: never predicted → precision 0, recall 0, f1 0 (guards, not NaN)
      assert(out("c") == ((0L, 0L, 1L, 0.0, 0.0, 0.0)))
      // d: predicted once, never true → fp=1, fn=0
      assert(out("d") == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
    } finally spark.stop()
  }
}
