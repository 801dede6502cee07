package graft.pipeline

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Count-Min sketch invariants: one-sided error (never underestimates),
  * exactness when the sketch is wide enough to avoid collisions, the
  * cell-wise mergeability that makes it shard/stream-composable, and the
  * zero estimate for untouched cells. */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sketches-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def itemStream(rnd: scala.util.Random, n: Int) =
    (1 to n).map(_ => s"w${rnd.nextInt(80)}")

  test("estimates never underestimate, and a wide sketch is exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val items = itemStream(rnd, 5000)
    val df = items.toDF("item")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.toDF("item")

    // narrow sketch: admissible (est >= true) on EVERY item
    val narrow = Sketches.countMin(df, "item", depth = 4, width = 16)
    val estN = Sketches.estimate(narrow, probes, "item", 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (it, c) =>
      assert(estN(it) >= c, s"$it: CMS ${estN(it)} < true $c")
    }

    // wide sketch (4 x 4096 over 80 distinct items): collisions are
    // possible per row but the MIN over 4 independent rows recovers the
    // exact count for this fixture
    val wide = Sketches.countMin(df, "item", depth = 4, width = 4096)
    val estW = Sketches.estimate(wide, probes, "item", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW == exact)
  }

  test("sketches merge by cell-wise addition: shard-built == whole-built") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val items = itemStream(rnd, 3000)
    val (a, b) = items.splitAt(1400)
    val skA = Sketches.countMin(a.toDF("item"), "item", 4, 64)
    val skB = Sketches.countMin(b.toDF("item"), "item", 4, 64)
    val merged = skA.unionByName(skB)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.countMin(items.toDF("item"), "item", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("an item the sketch never saw estimates from untouched cells") {
    import spark.implicits._
    val sk = Sketches.countMin(Seq("a", "b", "a").toDF("item"), "item", 4, 4096)
    val est = Sketches.estimate(sk, Seq("a", "zzz-unseen").toDF("item"), "item", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") == 2L)
    // 3 items can touch at most 3 of 4096 buckets per row: the unseen
    // item's min is 0 w.h.p. (and never negative by construction)
    assert(est("zzz-unseen") == 0L)
  }
}
