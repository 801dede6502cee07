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
      .config("graft.curation.eagerStages", "false")
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

  test("no catalog query joins on a bare 20° tile key") {
    // A 2-char OLC cell is 20°×20° — one cell holds a subcontinent, so a
    // join keyed on tile2 ALONE between row-level relations is
    // |left|×|right| per cell: quadratic on a planetary corpus even though
    // it passes at test SF. Distance-bounded candidate generation
    // (GeoJoins.pairsWithin / HaversineJoinRule) is the required shape.
    // Tile-AGGREGATE rollup joins (e.g. tile6 counts × tile2 counts, i3)
    // are exempt: their per-cell cardinality is bounded by the tile
    // hierarchy fan-out (≤160k tile6 cells per tile2), not by data volume.
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.curation.eagerStages", "false")
      .appName("plan-audit-tile2")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
      def aggregated(p: LogicalPlan): Boolean =
        p.collectFirst { case a: Aggregate => a }.isDefined
      val offenders = QueryCatalog.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val joins = fn(spark, sf).queryExecution.optimizedPlan.collect {
            case j: Join if j.condition.exists(c =>
                c.references.nonEmpty && c.references.forall(_.name == "tile2")) &&
              !(aggregated(j.left) || aggregated(j.right)) => j
          }
          if (joins.nonEmpty) Some(name) else None
      }
      assert(offenders.isEmpty, s"joins keyed on tile2 alone in: $offenders")
    } finally spark.stop()
  }

  test("broadcast hints over raw corpus-scaled relations are pinned to known-bounded cases") {
    // An unconditional broadcast() hint materializes its relation on the
    // driver regardless of runtime size. That is fine for relations
    // bounded by something other than data volume (fixed dims like
    // nation/region, aggregates over bounded key spaces, explicit query
    // sets) and a scale-killer for anything that grows with the corpus
    // (the round-5 d5 defect: a hinted vocabulary-sized pair relation).
    // Guard: every broadcast hint whose subtree reaches a RAW scan of a
    // corpus-scaled table with no intervening Aggregate must be on this
    // allowlist, each entry bounded BY CONSTRUCTION:
    //   p5/p6/p13 — the ANN query set, a literal-bounded id slice the
    //   caller chooses (queries are small by the operator's contract).
    // Anything new fails until deliberately added here.
    val allowed = Set("p5_cosine_topk", "p6_ann_lsh", "p13_ann_ivf")
    val corpusTables =
      "(part|lineitem|orders|customer|supplier|documents|embeddings|events)\\.parquet".r
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.curation.eagerStages", "false")
      .appName("plan-audit-broadcast")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
      val offenders = QueryCatalog.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val hints = fn(spark, sf).queryExecution.analyzed.collect {
            case h: ResolvedHint if h.hints.strategy.exists(
                _.toString.contains("BROADCAST")) => h
          }
          val rawCorpusHint = hints.exists { h =>
            h.child.collectFirst { case a: Aggregate => a }.isEmpty &&
              h.child.collectLeaves()
                .exists(l => corpusTables.findFirstIn(l.toString).isDefined)
          }
          if (rawCorpusHint && !allowed(name)) Some(name) else None
      }
      assert(offenders.isEmpty,
        s"unbounded broadcast hints (raw corpus scan, no aggregate) in: $offenders")
    } finally spark.stop()
  }

  test("selective scans push filters; key-only scan prunes columns; dim joins broadcast") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.curation.eagerStages", "false")
      .appName("plan-audit-2")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      def plan(name: String): String =
        QueryCatalog.queries(name)(spark, sf).queryExecution.executedPlan.toString

      // At 100 TB these predicates are the difference between reading a
      // row group and reading the table: they must reach the parquet
      // reader, not evaluate above it.
      for (q <- Seq("a7_pruned_scan", "a9_point_lookup", "a10_log_window",
                    "b1_tombstone_filter")) {
        assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan(q)).isDefined,
          s"$q: no pushed filters reach the scan")
      }

      // a6 projects one key column; the scan must not read the other 15.
      assert(plan("a6_keys_only").contains("ReadSchema: struct<l_suppkey"),
        "a6: scan reads more than the projected key column")

      // Small-dimension joins must broadcast — a shuffle join here means
      // the big side is exchanged to meet a dimension table.
      for (q <- Seq("d7_enrichment_join", "pl4_merge_scoring"))
        assert(plan(q).contains("BroadcastHashJoin"),
          s"$q: expected a broadcast hash join for the small dimension side")
    } finally spark.stop()
  }
}
