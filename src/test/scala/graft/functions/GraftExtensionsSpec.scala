package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The extension injector must make every native function available to a
  * session that never calls a Scala register helper — the deployment path
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes all native functions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-extensions")
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT olc_encode(52.52, 13.405, 6) AS tile,
          |       cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,
          |       sorted_intersect_size(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS isz
          |""".stripMargin).head()
      assert(row.getString(0) == graft.geo.Olc.encode(52.52, 13.405, 6))
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
      assert(row.getInt(2) == 2)
    } finally spark.stop()
  }
}
