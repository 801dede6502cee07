package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators from SURVEY §2 (scan / filter / project / CDC /
  * join / agg / sort / set-op / ordered groups), expressed over the driver's
  * testdata tables. Each query exercises the Spark primitive the
  * corresponding reference operator maps to.
  */
object CatalogCore {

  // ---- A. scans -----------------------------------------------------------

  /** A5 full scan + projection + pushed filter (OprOSMDataProvider.java:44-46). */
  private def a5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** A6 keys-only scan — column pruning (OprSummaryPlaceDataProvider.java:29-32). */
  private def a6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_suppkey").distinct().orderBy("l_suppkey")

  /** A7 key-pruned scan — tile-index analog (BaseOprPlaceDataProvider.java:202-208).
    * Uses the raw-column range helper so the predicate reaches the parquet
    * reader (a filter above the nanos→timestamp projection does not). */
  private def a7(s: SparkSession, d: String): DataFrame =
    Tables.eventsBetween(s, d, "2024-01-03", "2024-01-04")
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")

  /** A9 point lookup by key (OprHistoryChangesProvider.java:289,305). */
  private def a9(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(col("o_orderkey").isin(1L, 7L, 32L, 33L, 34L, 35L, 36L, 37L, 38L, 39L))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  /** A10 log scan by date window (OprHistoryChangesProvider.java:131-147). */
  private def a10(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("total"))
      .orderBy("day")

  // ---- B. filters / projections -------------------------------------------

  /** B1 tombstone filter (BaseOprPlaceDataProvider.java:213-215). */
  private def b1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(col("o_orderstatus") =!= "F")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** B9/B11 wide feature projection with title/subtitle derivation
    * (BaseOprPlaceDataProvider.java:211-301,326-341). */
  private def b9(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        concat_ws(" - ", col("c_mktsegment"), col("c_name")).as("title"),
        coalesce(nullif(col("c_mktsegment"), lit("")), lit("unknown")).as("subtitle"),
        (col("c_acctbal") > 0).as("active"),
        round(col("c_acctbal") * 2, 2).as("balance2x"))
      .orderBy("c_custkey")

  /** B5 change-key classification via pattern predicates
    * (OprHistoryChangesProvider.java:286-317) — regex key extraction. */
  private def b5(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"),
        when(col("event_type").isin("purchase", "signup"), "mutation")
          .when(col("event_type") === "error", "error")
          .otherwise("read").as("kind"))
      .where(col("k") > 90)
      .orderBy("event_id")

  // ---- C. CDC / change application ----------------------------------------

  /** C7 last-wins dedup per key within a batch (OsmSyncBot.java:671-687). */
  private def c7(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  /** C4 upsert decision: classify each key as create/edit/delete from its
    * first and last change (OsmSyncBot.java:689-719). */
  private def c4(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val firstLast = e.groupBy("user_id").agg(
      min("event_id").as("first_id"), max("event_id").as("last_id"))
    val first = e.select(col("event_id").as("first_id"), col("event_type").as("first_type"))
    val last = e.select(col("event_id").as("last_id"), col("event_type").as("last_type"))
    firstLast.join(first, "first_id").join(last, "last_id")
      .select(col("user_id"),
        when(col("first_type") === "signup",
          when(col("last_type") === "error", "create_then_error").otherwise("created"))
          .otherwise(when(col("last_type") === "error", "edit_then_error").otherwise("edited"))
          .as("decision"))
      .orderBy("user_id")
  }

  // ---- D. joins ------------------------------------------------------------

  /** D1 lookup join + max-version pick (OsmSyncBot.java:413-449). */
  private def d1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      // no broadcast hint: the lookup dimension scales WITH the corpus
      // (it is the osmid index, not a fixed-size dim) — AQE broadcasts it
      // at small runtime sizes and falls back to a shuffled join at scale
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("l_orderkey"),
        round(col("l_extendedprice"), 2).as("best_price"))
      .orderBy("p_partkey")
  }

  /** D6/H8 anti-join guard (MergePlaceBot.java:211-245): customers with no
    * order inside the window — the "no similar active neighbor" pattern. */
  private def d6(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                 col("o_orderdate") < lit("1995-07-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** D7 enrichment join chain with broadcast dims (MergeUtil.java:197-203). */
  private def d7(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("orders_cnt"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("r_name")

  /** D8 link-resolution join: lineitem → orders → customer semi-path
    * (Way.java:142-154 member resolution analog). */
  private def d8(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  // ---- E. aggregations ------------------------------------------------------

  /** E4 multi-aggregate stats per group (MergePlaceBot.java:89-98). */
  private def e4(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
           countDistinct("user_id").as("users"),
           round(sum("value"), 2).as("total_value"),
           round(avg("value"), 4).as("avg_value"),
           min("value").as("min_value"),
           max("value").as("max_value"))
      .orderBy("event_type")

  /** E5 weighted centroid: weighted average (OsmMapUtils.java:262-290). */
  private def e5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 2)
        .as("weighted_price"))
      .orderBy("l_suppkey")

  /** E1-adjacent: time rollup of the change log (OprSummaryPlaceDataProvider.java:26-59
    * prefix rollup; temporal analog over events). */
  private def e1t(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("date").as("day"),
               hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day", "hr")

  // ---- H. sorts / limits / set ops ------------------------------------------

  /** H3 top-k with deterministic tie-break (UserSchemaManager.java:210-228). */
  private def h3(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .orderBy(col("value").desc, col("event_id"))
      .select("event_id", "user_id", "value")
      .limit(10)

  /** H5 ordered distinct (TreeSet semantics, OprMapCollectionApiResult.java:22-24). */
  private def h5(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("event_type").distinct().orderBy("event_type")

  /** H6/H7 set difference (OsmSyncBot.java:254-300; PlaceOpObjectHelper.java:122-127):
    * parts never shipped in bulk (quantity > 40). */
  private def h6(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_partkey").as("k"))
      .except(Tables.lineitem(s, d).where(col("l_quantity") > 40)
        .select(col("l_partkey").as("k")))
      .orderBy("k")

  /** H9 union of per-partition results (OprHistoryChangesProvider.java:207-217). */
  private def h9(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), lit("c").as("src"))
    val views = e.where(col("event_type") === "view")
      .select(col("event_id"), lit("v").as("src"))
    clicks.unionByName(views).orderBy("event_id")
  }

  // ---- I. ordered / sequential ----------------------------------------------

  /** I1 merge-group formation: boundary where flag turns on after an
    * unflagged row (MergeUtil.java:99-113) — lag + running sum. */
  private def i1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, d)
      .withColumn("is_del", (col("event_type") === "error").cast("int"))
      .withColumn("prev_del", lag("is_del", 1, 0).over(w))
      .withColumn("boundary", (col("is_del") === 1 && col("prev_del") === 0).cast("int"))
      .withColumn("group_id", sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id")
      .agg((max("group_id") + 1).as("n_groups"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** I2-adjacent sessionization: 30-min-gap sessions per user — the
    * order-sensitive grouping pattern (OprHistoryChangesProvider.java:185-209). */
  private def i2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag("ms", 1).over(w))
      .withColumn("new_session",
        (col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L).cast("int"))
      .withColumn("session_id", sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** I4 (beyond ref): weekly cohort retention over the event log
    * ([[graft.pipeline.EventAnalytics.cohortRetention]]). */
  private def i4(s: SparkSession, d: String): DataFrame =
    graft.pipeline.EventAnalytics.cohortRetention(
        Tables.events(s, d), "user_id", "ts")
      .orderBy("cohort", "offset_w")

  /** I5 (beyond ref): ordered view→click→purchase funnel
    * ([[graft.pipeline.EventAnalytics.funnel]]) — first-touch
    * min-timestamp chaining. */
  private def i5(s: SparkSession, d: String): DataFrame =
    graft.pipeline.EventAnalytics.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("step_idx")

  /** H10 (beyond ref): CUBE grouping-sets aggregation — the OLAP rollup
    * surface (Spark plans one Expand + one hash aggregate; grouping_id
    * disambiguates the four grouping sets; subtotal placeholder 'ALL'
    * cannot collide with the real single-char flag values). */
  private def h10(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid").cast("int").as("gid"), col("sum_qty"), col("n"))
      .orderBy("gid", "rf", "ls")

  /** H11 (beyond ref): pivot — per-user event-type counts as columns
    * (explicit value list, so the plan is ONE aggregate with conditional
    * counts — no distinct-values pre-scan, no second shuffle). */
  private def h11(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("user_id")
  }

  /** I7 (beyond ref): per-user EWMA of event values
    * ([[graft.pipeline.EventAnalytics.ewma]]), α = ¼ (binary-exact). */
  private def i7(s: SparkSession, d: String): DataFrame =
    graft.pipeline.EventAnalytics.ewma(Tables.events(s, d),
        "user_id", "event_id", "value", alpha = 0.25)
      .orderBy("user_id")

  /** H12 (beyond ref): frame-windowed moving average — 3-row trailing
    * mean of event value per user. The frame sum runs on integer CENTS
    * (DuckDB's sliding-window aggregation uses a segment tree whose
    * float summation order differs from Spark's running frame; integer
    * sums are order-free), divided back in one fixed double shape. */
  private def h12(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(-2, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"),
        round(sum("cents").over(w).cast("double") / 100.0
          / count(lit(1)).over(w), 6).as("mavg"),
        count(lit(1)).over(w).cast("int").as("n_in_frame"))
      .orderBy("user_id", "event_id")
  }

  /** I6 (beyond ref): first-order Markov transition matrix over per-user
    * event sequences ([[graft.pipeline.EventAnalytics.transitionMatrix]]),
    * ordered by the unique event id. */
  private def i6(s: SparkSession, d: String): DataFrame =
    graft.pipeline.EventAnalytics.transitionMatrix(Tables.events(s, d),
        "user_id", "event_id", "event_type")
      .orderBy("from_type", "to_type")

  val entries: Seq[Q] = Seq(
    Q("h10_cube", h10,
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |       coalesce(l_linestatus, 'ALL') AS ls,
             |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
             |       round(sum(l_quantity), 2) AS sum_qty,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, rf, ls""".stripMargin)),
    Q("h11_pivot", h11,
      Some("""SELECT user_id,
             |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
             |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
             |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
             |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
             |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),
    Q("i7_ewma", i7,
      Some("""WITH t AS (SELECT user_id, list(value ORDER BY event_id) AS vs
             |           FROM events GROUP BY user_id)
             |SELECT user_id, CAST(len(vs) AS INT) AS n_events,
             |  round(list_reduce(vs, (acc, x) -> acc * 0.75 + x * 0.25), 6)
             |    AS ewma
             |FROM t ORDER BY user_id""".stripMargin)),
    Q("h12_moving_avg", h12,
      Some("""WITH c AS (SELECT user_id, event_id,
             |            CAST(round(value * 100) AS BIGINT) AS cents
             |          FROM events)
             |SELECT user_id, event_id,
             |  round(CAST(sum(cents) OVER w AS DOUBLE) / 100.0
             |        / (count(*) OVER w), 6) AS mavg,
             |  CAST(count(*) OVER w AS INT) AS n_in_frame
             |FROM c
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),
    Q("i6_transitions", i6,
      Some("""WITH t AS (SELECT user_id, event_id, event_type,
             |            lead(event_type) OVER (PARTITION BY user_id
             |              ORDER BY event_id) AS next_et
             |          FROM events),
             |c AS (SELECT event_type AS from_type, next_et AS to_type,
             |        count(*) AS cnt
             |      FROM t WHERE next_et IS NOT NULL
             |      GROUP BY event_type, next_et),
             |tot AS (SELECT from_type, sum(cnt) AS row_total FROM c
             |        GROUP BY from_type)
             |SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
             |       CAST(t2.row_total AS BIGINT) AS row_total,
             |       round(c.cnt::DOUBLE / t2.row_total, 6) AS p
             |FROM c JOIN tot t2 USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),
    Q("i4_cohort_retention", i4,
      Some("""WITH e AS (SELECT user_id,
             |            CAST(date_trunc('week', ts) AS DATE) AS wk
             |          FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
             |sz AS (SELECT cohort, count(*) AS cohort_size FROM f
             |       GROUP BY cohort),
             |act AS (SELECT DISTINCT f.cohort,
             |          date_diff('day', f.cohort, e.wk) // 7 AS offset_w,
             |          e.user_id
             |        FROM e JOIN f USING (user_id)),
             |c AS (SELECT cohort, CAST(offset_w AS INT) AS offset_w,
             |        count(*) AS active_users
             |      FROM act GROUP BY cohort, offset_w)
             |SELECT c.cohort, c.offset_w, c.active_users, s.cohort_size,
             |  round(c.active_users::DOUBLE / s.cohort_size, 6) AS retention
             |FROM c JOIN sz s USING (cohort)
             |ORDER BY cohort, offset_w""".stripMargin)),
    Q("i5_funnel", i5,
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
             |            WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             |       JOIN s1 ON s1.user_id = e.user_id
             |       WHERE e.event_type = 'click' AND e.ts > s1.t
             |       GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             |       JOIN s2 ON s2.user_id = e.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts > s2.t
             |       GROUP BY e.user_id)
             |SELECT 1 AS step_idx, 'view' AS step,
             |       (SELECT count(*) FROM s1) AS n_users
             |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
             |ORDER BY step_idx""".stripMargin)),
    Q("a5_full_scan", a5,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    Q("a6_keys_only", a6,
      Some("SELECT DISTINCT l_suppkey FROM lineitem ORDER BY l_suppkey")),
    Q("a7_pruned_scan", a7,
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-04'
             |ORDER BY event_id""".stripMargin)),
    Q("a9_point_lookup", a9,
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
             |WHERE o_orderkey IN (1,7,32,33,34,35,36,37,38,39)
             |ORDER BY o_orderkey""".stripMargin)),
    Q("a10_log_window", a10,
      Some("""SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("b1_tombstone_filter", b1,
      Some("""SELECT o_orderstatus, count(*) AS cnt FROM orders
             |WHERE o_orderstatus <> 'F' GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("b5_change_classify", b5,
      Some("""SELECT event_id,
             |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
             |       CASE WHEN event_type IN ('purchase','signup') THEN 'mutation'
             |            WHEN event_type = 'error' THEN 'error'
             |            ELSE 'read' END AS kind
             |FROM events
             |WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) > 90
             |ORDER BY event_id""".stripMargin)),
    Q("b9_feature_projection", b9,
      Some("""SELECT c_custkey,
             |       concat_ws(' - ', c_mktsegment, c_name) AS title,
             |       coalesce(nullif(c_mktsegment, ''), 'unknown') AS subtitle,
             |       c_acctbal > 0 AS active,
             |       round(c_acctbal * 2, 2) AS balance2x
             |FROM customer ORDER BY c_custkey""".stripMargin)),
    Q("c4_upsert_classify", c4,
      Some("""WITH fl AS (
             |  SELECT user_id, min(event_id) AS first_id, max(event_id) AS last_id
             |  FROM events GROUP BY user_id)
             |SELECT fl.user_id,
             |       CASE WHEN f.event_type = 'signup' THEN
             |              CASE WHEN l.event_type = 'error' THEN 'create_then_error' ELSE 'created' END
             |            ELSE
             |              CASE WHEN l.event_type = 'error' THEN 'edit_then_error' ELSE 'edited' END
             |       END AS decision
             |FROM fl
             |JOIN events f ON f.event_id = fl.first_id
             |JOIN events l ON l.event_id = fl.last_id
             |ORDER BY fl.user_id""".stripMargin)),
    Q("c7_last_wins_dedup", c7,
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
             |  FROM events) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),
    Q("d1_lookup_max_version", d1,
      Some("""SELECT p.p_partkey, p.p_name, t.l_orderkey,
             |       round(t.l_extendedprice, 2) AS best_price
             |FROM (
             |  SELECT l_partkey, l_orderkey, l_extendedprice,
             |         row_number() OVER (PARTITION BY l_partkey
             |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) t
             |JOIN part p ON p.p_partkey = t.l_partkey
             |WHERE t.rn = 1 ORDER BY p.p_partkey""".stripMargin)),
    Q("d6_anti_join_guard", d6,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01')
             |ORDER BY c_custkey""".stripMargin)),
    Q("d7_enrichment_join", d7,
      Some("""SELECT r_name, count(*) AS orders_cnt, round(sum(o_totalprice), 2) AS total
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),
    Q("d8_link_resolution", d8,
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |ORDER BY p_partkey""".stripMargin)),
    Q("e1_time_rollup", e1t,
      Some("""SELECT CAST(date_trunc('hour', ts) AS DATE) AS day,
             |       hour(ts) AS hr, count(*) AS cnt
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("e4_group_stats", e4,
      Some("""SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users,
             |       round(sum(value), 2) AS total_value, round(avg(value), 4) AS avg_value,
             |       min(value) AS min_value, max(value) AS max_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("e5_weighted_avg", e5,
      Some("""SELECT l_suppkey,
             |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS weighted_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("h3_topk", h3,
      Some("""SELECT event_id, user_id, value FROM events
             |ORDER BY value DESC, event_id LIMIT 10""".stripMargin)),
    Q("h5_ordered_distinct", h5,
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type")),
    Q("h6_set_difference", h6,
      Some("""SELECT p_partkey AS k FROM part
             |EXCEPT SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 40
             |ORDER BY k""".stripMargin)),
    Q("h9_union", h9,
      Some("""SELECT event_id, 'c' AS src FROM events WHERE event_type = 'click'
             |UNION ALL
             |SELECT event_id, 'v' AS src FROM events WHERE event_type = 'view'
             |ORDER BY event_id""".stripMargin)),
    Q("i1_merge_groups", i1,
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id,
             |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del
             |  FROM events),
             |bounds AS (
             |  SELECT user_id, event_id, is_del,
             |         lag(is_del, 1, 0) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_del
             |  FROM flagged),
             |groups AS (
             |  SELECT user_id,
             |         sum(CASE WHEN is_del = 1 AND prev_del = 0 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS group_id
             |  FROM bounds)
             |SELECT user_id, CAST(max(group_id) + 1 AS BIGINT) AS n_groups, count(*) AS n_events
             |FROM groups GROUP BY user_id ORDER BY user_id""".stripMargin)),
    Q("i2_sessionize", i2,
      Some("""WITH t AS (
             |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
             |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ms
             |  FROM events),
             |m AS (
             |  SELECT user_id,
             |         sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM t)
             |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)),
  )
}
