package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Z-order layout key: interleave correctness against a scalar
  * reimplementation, bijectivity over the tile grid, and the prefix
  * property that makes it a useful file-clustering key (an aligned
  * 2^k × 2^k tile box shares one zkey prefix, so its rows land in a
  * contiguous key range → contiguous files after a range write). */
class ZorderSpec extends AnyFunSuite {

  private def scalarZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b))
    }.reduce(_ | _)

  test("zorderKey: matches scalar interleave, bijective, prefix-clusters aligned boxes") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("zorder-spec")
      .getOrCreate()
    import spark.implicits._
    try {
      val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
      val out = pts.select(col("x"), col("y"),
          GeoFunctions.zorderKey(col("x"), col("y"), 6).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      out.foreach { case (x, y, z) => assert(z == scalarZ(x, y, 6), s"($x,$y)") }
      // bijective over the full 6-bit grid: 4096 distinct keys covering 0..4095
      val keys = out.map(_._3)
      assert(keys.distinct.length == 64 * 64)
      assert(keys.min == 0L && keys.max == 64L * 64 - 1)

      // prefix property: every aligned 8x8 box (drop 3 low bits of x and
      // y) maps to one value of z >> 6 — the box IS a contiguous key range
      out.groupBy { case (x, y, _) => (x >> 3, y >> 3) }.foreach {
        case (_, rows) =>
          assert(rows.map(_._3 >> 6).distinct.length == 1)
      }
    } finally spark.stop()
  }
}
