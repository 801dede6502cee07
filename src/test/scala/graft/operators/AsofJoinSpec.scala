package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** AsofJoin.backward against a brute-force per-row maximum-≤ scan,
  * covering inclusive ties (right ts == left ts), right-side duplicate
  * timestamps (largest tiebreak wins), unmatched lefts (null payload),
  * and keys present on only one side. */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("asof-join")
    .getOrCreate()

  test("backward as-of join equals the brute-force definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // small ts domain forces plenty of exact ties
    val left = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
    val right = Seq.tabulate(200)(j =>
      (1000L + j, rnd.nextInt(7).toLong, rnd.nextInt(40).toLong, rnd.nextInt(100) / 4.0))

    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("view_id", "user_id", "ts", "view_value")
    val got = AsofJoin.backward(l, r, Seq("user_id"), "ts", "ts",
        payload = Seq("view_id", "view_value"), tiebreak = "view_id")
      .collect()
      .map(x => (x.getLong(0), (Option(x.get(3)), Option(x.get(4)))))
      .toMap

    left.foreach { case (eid, u, t) =>
      val best = right.filter(v => v._2 == u && v._3 <= t)
        .sortBy(v => (v._3, v._1)).lastOption
      val expect = (best.map(_._1: java.lang.Long).map(x => x: Any),
        best.map(_._4: java.lang.Double).map(x => x: Any))
      assert(got(eid) == expect, s"left=$eid user=$u ts=$t")
    }
    assert(got.size == left.size, "one output row per left row")
  }
}
