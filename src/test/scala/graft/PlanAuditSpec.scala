package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Plan-shape regression guard over the whole catalog: builds every
  * query's physical plan at sf0.001 and rejects accidental Cartesian
  * products — the plan shape that silently works at test SF and explodes
  * at 100 TB. (Broadcast nested-loop joins are allowed: the ANN probes and
  * threshold joins intentionally stream a broadcast small side.) */
class PlanAuditSpec extends AnyFunSuite {

  test("no catalog query plans a CartesianProduct") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("plan-audit")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      val offenders = QueryCatalog.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          // building the frame may run small driver-side probes (count
          // probes, vocabulary collects) — that's part of the query's
          // contract; the assertion is on the final plan only
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
      }
      assert(offenders.isEmpty, s"cartesian joins in: $offenders")
    } finally spark.stop()
  }
}
