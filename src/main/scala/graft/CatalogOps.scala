package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Geometry

/** SURVEY §2 rows not covered by the other catalogs: tag-map algebra
  * (B8/B12/F4/F5), the change-diff write path (C1/H7), id generation and
  * match-id expressions (C5/C8/F10), derived-column maintenance (C10),
  * count-probe / adaptive work splitting (E3/I3), timestamp alignment
  * (F12), polygon area/winding and center dispatch (G7/G8/G12/E5), plus
  * sketch-based approximations (HLL distinct, quantile) the engine adds on
  * top of the reference.
  */
object CatalogOps {

  /** Spread a small single-file scan across cores before per-row interpreted
    * expression chains (map algebra, OLC encodes) — otherwise they run at the
    * scan's 1-2-task parallelism (see SNIPPETS/round-1 notes). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  // ---- B8/H1: placetype display dimension -----------------------------------

  /** B8 placeTypes projection + H1 display-name sort
    * (BaseOprPlaceDataProvider.java:161-200): value -> "Key - Pretty". */
  private def b8(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(lower(col("p_type")).as("value")).distinct()
      .select(col("value"),
        concat(lit("Type - "), upper(substring(col("value"), 1, 1)),
          substring(col("value"), 2, 1000000)).as("display"))
      .orderBy("display")

  // ---- B12/F4/F5: tag-map scrub + other-name extraction ---------------------

  private def tagEntries(k: Column): Column = filter(array(
    struct(lit("name").as("k"),
      concat(lit("Shop "), (k % 100).cast("string")).as("v")),
    struct(when(k % 4 === 0, "").otherwise(lit(null).cast("string")).as("k"),
      lit("junk").as("v")),
    struct(when(k % 3 === 0, "name:en").otherwise(lit(null).cast("string")).as("k"),
      concat(lit("Store "), (k % 100).cast("string")).as("v")),
    struct(when(k % 5 === 0, "old_name").otherwise(lit(null).cast("string")).as("k"),
      concat(lit("Old "), (k % 7).cast("string")).as("v")),
    struct(lit("website").as("k"),
      concat(lit("https://ex.com/"), (k % 11).cast("string")).as("v")),
    struct(lit("phone").as("k"), lit("555").as("v"))),
    e => e.getField("k").isNotNull)

  /** B12 empty-tag scrub (PlaceOpObjectHelper.java:90-95), F4 other-name
    * extraction (MergeUtil.java:128-136), F5 non-empty equality
    * (MergeUtil.java:121-126) over a synthesized tag map. */
  private def b12(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d)
      .select(k, map_from_entries(tagEntries(k)).as("tags"))
      .select(k,
        map_filter(col("tags"), (kk, _) => kk =!= "").as("tags"))
      .select(k.as("c_custkey"),
        size(col("tags")).as("n_tags"),
        array_join(array_sort(map_values(
          map_filter(col("tags"), (kk, _) =>
            kk.startsWith("name") || kk === "old_name"))), "|").as("other_names"),
        (length(element_at(col("tags"), "website")) > 0 &&
          element_at(col("tags"), "website") === "https://ex.com/3")
          .as("website_match"))
      .orderBy("c_custkey")
  }

  // ---- C1/H7: per-field diff --------------------------------------------------

  private def oldMap(k: Column): Column = map_from_entries(filter(array(
    struct(lit("status").as("k"), col("o_orderstatus").as("v")),
    struct(lit("prio").as("k"), col("o_orderpriority").as("v")),
    struct(when(k % 3 === 0, "tmp").otherwise(lit(null).cast("string")).as("k"),
      lit("x").as("v"))),
    e => e.getField("k").isNotNull))

  private def newMap(k: Column): Column = map_from_entries(filter(array(
    struct(lit("status").as("k"),
      when(k % 2 === 0, col("o_orderstatus")).otherwise(lit("X")).as("v")),
    struct(lit("prio").as("k"), col("o_orderpriority").as("v")),
    struct(when(k % 5 === 0, "note").otherwise(lit(null).cast("string")).as("k"),
      lit("added").as("v"))),
    e => e.getField("k").isNotNull))

  /** C1 generateDiff as map algebra (PlaceOpObjectHelper.java:120-148):
    * removed keys -> delete verbs, new/changed keys -> set verbs, emitted as
    * one sorted deterministic change string. */
  private def c1(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    // cache barrier: without it, PushDownPredicates re-derives the entire
    // interpreted diff pipeline into the single-task parquet scan filter
    // (measured: the whole query runs twice, once serially)
    val diffed = spread(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_orderpriority"))
      .select(k, oldMap(k).as("old_m"), newMap(k).as("new_m"))
      .select(k,
        transform(array_except(map_keys(col("old_m")), map_keys(col("new_m"))),
          kk => concat(kk, lit("=delete"))).as("removed"),
        transform(
          filter(map_keys(col("new_m")),
            kk => !(element_at(col("old_m"), kk) <=> element_at(col("new_m"), kk))),
          kk => concat(kk, lit("=set:"), element_at(col("new_m"), kk))).as("sets"))
      .select(k,
        array_join(array_sort(concat(col("removed"), col("sets"))), ";").as("changes"))
      .cache()
    diffed.where(col("changes") =!= "").orderBy("o_orderkey")
  }

  /** H7 removed-keys set difference (PlaceOpObjectHelper.java:122-127). */
  private def h7(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    // cache barrier against filter-pushdown re-derivation (see c1)
    val removed = spread(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_orderpriority"))
      .select(k, oldMap(k).as("old_m"), newMap(k).as("new_m"))
      .select(k,
        array_join(array_sort(
          array_except(map_keys(col("old_m")), map_keys(col("new_m")))), ",")
          .as("removed_keys"))
      .cache()
    removed.where(col("removed_keys") =!= "").orderBy("o_orderkey")
  }

  // ---- C5/C8/F10: id generation, match-id, codecs ----------------------------

  /** C5 deterministic id generation (OsmLocationTool.java:95-100 with the
    * documented deterministic-suffix deviation, SURVEY §7.4). */
  private def c5(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d).select(k,
        graft.geo.GeoFunctions.olcEncode(Synth.lat(k), Synth.lon(k), 6).as("tile"),
        substring(md5(concat(lit("node"), k.cast("string"), lit("2021-06-01"))), 1, 6)
          .as("suffix"))
      .select(k.as("c_custkey"), concat_ws(",", col("tile"), col("suffix")).as("opr_id"))
      .orderBy("c_custkey")
  }

  /** C8 match-id expression: set:all(place_loc, osm_tag, osm_value,
    * simple_name) as a sorted-distinct joined key (OsmSyncBot.java:452-462;
    * OprExprEvaluatorExt.java:37-83). */
  private def c8(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    val name = concat(lit("Cafe "), (k % 50).cast("string"))
    Tables.customer(s, d).select(k.as("c_custkey"),
        array_join(array_sort(array_distinct(array(
          graft.geo.GeoFunctions.olcEncode(Synth.lat(k), Synth.lon(k), 6),
          lit("amenity"),
          lower(col("c_mktsegment")),
          lower(regexp_replace(name, "[ -]", ""))))), "|").as("match_id"))
      .orderBy("c_custkey")
  }

  /** F10 id <-> string codec roundtrip (OprHistoryChangesProvider.java:487-493). */
  private def f10(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d)
      .select(k, concat(
        graft.geo.GeoFunctions.olcEncode(Synth.lat(k), Synth.lon(k), 6),
        lit(",s"), k.cast("string")).as("opr_id"))
      .select(k.as("c_custkey"), col("opr_id"),
        element_at(split(col("opr_id"), ","), 1).as("tile"),
        element_at(split(col("opr_id"), ","), 2).as("suffix"))
      .withColumn("roundtrip",
        concat_ws(",", col("tile"), col("suffix")) === col("opr_id"))
      .orderBy("c_custkey")
  }

  // ---- C10: derived-column maintenance ---------------------------------------

  /** C10 placetype drift repair (PlaceTypeBot.java:25-52): recompute the
    * derived column, emit a set-op per drifted row. */
  private def c10(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d)
      .select(k.as("key"),
        when(k % 13 === 0, "stale").otherwise(lower(col("c_mktsegment")))
          .as("current_type"),
        lower(col("c_mktsegment")).as("derived_type"))
      .where(col("current_type") =!= col("derived_type"))
      .select(col("key"), col("current_type"),
        concat(lit("placetype=set:"), col("derived_type")).as("edit_op"))
      .orderBy("key")
  }

  // ---- E3/I3: count probe + adaptive split ------------------------------------

  /** E3 count probe per coarse tile (OsmSyncBot.java:180,594-609): row count
    * + the 20k-style split decision flag. */
  private def e3(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    spread(Tables.customer(s, d).select("c_custkey"))
      .select(graft.geo.GeoFunctions.olcEncode(Synth.lat(k), Synth.lon(k), 2).as("tile2"))
      .groupBy("tile2")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("need_split", col("cnt") >= 25)
      .orderBy("tile2")
  }

  /** I3 quadtree work splitting as a declarative dataflow
    * (OsmSyncBot.java:503-535): descend to a finer tile while the cell
    * count is >= the split threshold; emit work units (cell, level, size). */
  private def i3(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    // ONE pass over the points (the finest-level count); every coarser
    // level is a rollup of that tiny tile relation, so the expensive OLC
    // encode runs once and nothing point-sized is joined or re-aggregated.
    // No cache barrier: the three consumers share the aggregation's
    // shuffle via exchange reuse, which (unlike the point-set cache this
    // replaced) also holds on a 1000-executor cluster.
    val c6 = spread(Tables.customer(s, d).select("c_custkey")).select(
        graft.geo.GeoFunctions.olcEncode(Synth.lat(k), Synth.lon(k), 6).as("tile6"))
      .groupBy("tile6").agg(count(lit(1)).as("cnt6"))
      .withColumn("tile4", substring(col("tile6"), 1, 4))
      .withColumn("tile2", substring(col("tile6"), 1, 2))
    val c2 = c6.groupBy("tile2").agg(sum("cnt6").as("cnt2"))
    val c4 = c6.groupBy("tile4").agg(sum("cnt6").as("cnt4"))
    c6.join(broadcast(c2), "tile2").join(broadcast(c4), "tile4")
      .withColumn("cell",
        when(col("cnt2") < 25, col("tile2"))
          .when(col("cnt4") < 25, col("tile4"))
          .otherwise(col("tile6")))
      .groupBy("cell")
      .agg(sum("cnt6").as("n_points"))
      .withColumn("level", length(col("cell")).cast("int"))
      .orderBy("cell")
  }

  // ---- F12: timestamp alignment ------------------------------------------------

  /** F12 15-minute alignment with a 3-minute safety lag
    * (OsmSyncBot.java:223-238), as epoch arithmetic. */
  private def f12(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        (expr("(unix_seconds(ts) - 180) div 900") * 900).as("aligned_epoch"))
      .where(col("event_id") <= 2000)
      .orderBy("event_id")

  // ---- G7/G8/G12/E5: polygon area, winding, center dispatch --------------------

  private def trails(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        Synth.lat(col("event_id")).as("lat"), Synth.lon(col("event_id")).as("lon"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_id"), col("lat"), col("lon"))))
        .as("trail"))
      .select(col("user_id"), col("trail.lat").as("lats"), col("trail.lon").as("lons"))

  /** G7 shoelace polygon area + G8 winding (OsmMapUtils.java:531-587,
    * 429-493) over per-user event rings. */
  private def g7(s: SparkSession, d: String): DataFrame = {
    val areaUdf = udf((lats: Seq[Double], lons: Seq[Double]) =>
      math.round(Geometry.areaM2(lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }) / 1e6))
    val cwUdf = udf((lats: Seq[Double], lons: Seq[Double]) =>
      Geometry.isClockwise(lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }))
    trails(s, d).select(col("user_id"),
        areaUdf(col("lats"), col("lons")).as("area_km2"),
        cwUdf(col("lats"), col("lons")).as("clockwise"))
      .orderBy("user_id")
  }

  /** G12 center-of-entity dispatch (OsmMapUtils.java:177-197): node ->
    * itself, way -> length-weighted centroid (E5), relation -> member mean. */
  private def g12(s: SparkSession, d: String): DataFrame = {
    val wLat = udf((lats: Seq[Double], lons: Seq[Double]) =>
      Geometry.weightedCentroid(lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }).get.lat)
    val wLon = udf((lats: Seq[Double], lons: Seq[Double]) =>
      Geometry.weightedCentroid(lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }).get.lon)
    val etype = when(col("user_id") % 3 === 0, "node")
      .when(col("user_id") % 3 === 1, "way").otherwise("relation")
    trails(s, d).select(col("user_id"), etype.as("entity_type"),
        when(etype === "node", element_at(col("lats"), 1))
          .when(etype === "way", wLat(col("lats"), col("lons")))
          .otherwise(aggregate(col("lats"), lit(0.0), (a, x) => a + x) / size(col("lats")))
          .as("clat"),
        when(etype === "node", element_at(col("lons"), 1))
          .when(etype === "way", wLon(col("lats"), col("lons")))
          .otherwise(aggregate(col("lons"), lit(0.0), (a, x) => a + x) / size(col("lons")))
          .as("clon"))
      .select(col("user_id"), col("entity_type"),
        round(col("clat"), 6).as("clat"), round(col("clon"), 6).as("clon"))
      .orderBy("user_id")
  }

  // ---- sketches: additions beyond the reference --------------------------------

  /** HLL distinct-count sketch vs exact (engine addition — the reference
    * has no approximate aggregates; SURVEY §2 E note). The oracle pins the
    * exact count and asserts the sketch lands within 10%. */
  private def x1(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"),
        approx_count_distinct("user_id", 0.01).as("approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          greatest(col("exact_users") * 0.1, lit(2.0))).as("approx_within_10pct"))
      .orderBy("event_type")

  /** Quantile sketch (percentile_approx) vs exact interpolated percentile,
    * within 2% relative — engine addition. */
  private def x2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("exact_p50"),
        expr("percentile_approx(value, 0.5, 100000)").as("approx_p50"))
      .select(col("event_type"), round(col("exact_p50"), 4).as("exact_p50"),
        (abs(col("approx_p50") - col("exact_p50")) <=
          abs(col("exact_p50")) * 0.02).as("approx_within_2pct"))
      .orderBy("event_type")

  /** Exact heavy hitters ([[graft.pipeline.HeavyHitters.frequentItems]]):
    * words above 1/40 of the corpus, Misra-Gries candidates recounted
    * exactly — the frequent-items member of the sketch family. */
  private def x3(s: SparkSession, d: String): DataFrame =
    graft.pipeline.HeavyHitters.frequentItems(
      Tables.documents(s, d).select(
        explode(graft.pipeline.TextAnalysis.words(col("text"))).as("word")),
      "word", k = 40)

  /** Count-Min sketch ([[graft.pipeline.Sketches]]): 4×256 sketch of the
    * corpus word stream, point-estimated at the exact heavy hitters (the
    * x3 item set) next to their true counts — demonstrating the one-sided
    * error guarantee (cms_cnt ≥ exact_cnt, always). The exact counts
    * exist here only because the oracle query needs both sides; the
    * OPERATOR estimates any probe set from the depth·width-bounded
    * sketch alone. */
  private def x4(s: SparkSession, d: String): DataFrame = {
    val items = Tables.documents(s, d)
      .select(explode(graft.pipeline.TextAnalysis.words(col("text"))).as("item"))
    val sketch = graft.pipeline.Sketches.countMin(items, "item", depth = 4, width = 256)
    // vocabulary-sized; materialized once for the three consumers below
    // (total-count scalar, probe filter, exact-count join)
    val exact = items.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint()
    val n = exact.agg(sum("exact_cnt")).head().getLong(0)
    val heavy = exact.where(col("exact_cnt") * 40 > n)
    graft.pipeline.Sketches.estimate(sketch, heavy, "item", depth = 4, width = 256)
      .join(heavy, "item")
      .select(col("item"), col("exact_cnt"), col("cms_cnt"),
        (col("cms_cnt") >= col("exact_cnt")).as("admissible"))
      .orderBy("item")
  }

  /** Mergeable HLL sketches (Datasketches, `hll_sketch_agg`/`hll_union_agg`):
    * per-(event_type, user-shard) sketches re-aggregated by sketch UNION —
    * the rollup pattern a 100 TB deployment stores (shard-level sketch
    * artifacts, merged at query time instead of re-scanning raw rows; x1's
    * one-shot approx_count_distinct cannot do this). The estimate is
    * deterministic but algorithm-specific, so the recorded check is the
    * exact count plus a 5%-tolerance flag, the x1 convention. */
  private def x5(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val merged = ev
      .groupBy(col("event_type"), pmod(col("user_id"), lit(16)).as("shard"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as long)")
        .as("merged_estimate"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("merged_estimate") - col("exact_users")) <=
          greatest(col("exact_users") * 0.05, lit(2.0))).as("merged_within_5pct"))
      .orderBy("event_type")
  }

  // ---- oracle SQL ---------------------------------------------------------------

  private def olc6For(keyExpr: String): String =
    s"(SELECT ${Synth.olcSql(6)} FROM (SELECT ${Synth.latvLonvSql(keyExpr)}))"

  private def olc2For(keyExpr: String): String =
    s"(SELECT ${Synth.olcSql(2)} FROM (SELECT ${Synth.latvLonvSql(keyExpr)}))"

  private val oldEntriesSql =
    """list_filter([
      |  struct_pack(kk := 'status', v := o_orderstatus),
      |  struct_pack(kk := 'prio', v := o_orderpriority),
      |  struct_pack(kk := CASE WHEN o_orderkey % 3 = 0 THEN 'tmp' END, v := 'x')],
      |  e -> e.kk IS NOT NULL)""".stripMargin

  private val newEntriesSql =
    """list_filter([
      |  struct_pack(kk := 'status',
      |    v := CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus ELSE 'X' END),
      |  struct_pack(kk := 'prio', v := o_orderpriority),
      |  struct_pack(kk := CASE WHEN o_orderkey % 5 = 0 THEN 'note' END, v := 'added')],
      |  e -> e.kk IS NOT NULL)""".stripMargin

  val entries: Seq[Q] = Seq(
    Q("b8_placetypes", b8,
      Some("""SELECT value, 'Type - ' || upper(substr(value, 1, 1)) || substr(value, 2) AS display
             |FROM (SELECT DISTINCT lower(p_type) AS value FROM part)
             |ORDER BY display""".stripMargin)),
    Q("b12_tag_scrub", b12,
      Some("""WITH e AS (
             |  SELECT c_custkey AS k, list_filter([
             |    struct_pack(kk := 'name', v := 'Shop ' || (c_custkey % 100)),
             |    struct_pack(kk := CASE WHEN c_custkey % 4 = 0 THEN '' END, v := 'junk'),
             |    struct_pack(kk := CASE WHEN c_custkey % 3 = 0 THEN 'name:en' END,
             |                v := 'Store ' || (c_custkey % 100)),
             |    struct_pack(kk := CASE WHEN c_custkey % 5 = 0 THEN 'old_name' END,
             |                v := 'Old ' || (c_custkey % 7)),
             |    struct_pack(kk := 'website', v := 'https://ex.com/' || (c_custkey % 11)),
             |    struct_pack(kk := 'phone', v := '555')
             |  ], x -> x.kk IS NOT NULL) AS entries FROM customer),
             |s AS (SELECT k, list_filter(entries, x -> x.kk <> '') AS scrubbed FROM e)
             |SELECT k AS c_custkey, CAST(len(scrubbed) AS INT) AS n_tags,
             |  array_to_string(list_sort(list_transform(
             |    list_filter(scrubbed, x -> x.kk LIKE 'name%' OR x.kk = 'old_name'),
             |    x -> x.v)), '|') AS other_names,
             |  (k % 11 = 3) AS website_match
             |FROM s ORDER BY c_custkey""".stripMargin)),
    Q("c1_field_diff", c1,
      Some(s"""WITH m AS (SELECT o_orderkey,
              |  $oldEntriesSql AS oe,
              |  $newEntriesSql AS ne
              |FROM orders),
              |diff AS (SELECT o_orderkey,
              |  list_transform(
              |    list_filter(list_transform(oe, x -> x.kk),
              |      kk -> NOT list_contains(list_transform(ne, x -> x.kk), kk)),
              |    kk -> kk || '=delete') AS removed,
              |  list_transform(
              |    list_filter(ne, e ->
              |      len(list_filter(oe, o -> o.kk = e.kk AND o.v = e.v)) = 0),
              |    e -> e.kk || '=set:' || e.v) AS sets
              |FROM m)
              |SELECT o_orderkey,
              |  array_to_string(list_sort(list_concat(removed, sets)), ';') AS changes
              |FROM diff
              |WHERE array_to_string(list_sort(list_concat(removed, sets)), ';') <> ''
              |ORDER BY o_orderkey""".stripMargin)),
    Q("h7_removed_keys", h7,
      Some(s"""WITH m AS (SELECT o_orderkey,
              |  $oldEntriesSql AS oe,
              |  $newEntriesSql AS ne
              |FROM orders)
              |SELECT o_orderkey,
              |  array_to_string(list_sort(
              |    list_filter(list_transform(oe, x -> x.kk),
              |      kk -> NOT list_contains(list_transform(ne, x -> x.kk), kk))), ',')
              |    AS removed_keys
              |FROM m
              |WHERE len(list_filter(list_transform(oe, x -> x.kk),
              |      kk -> NOT list_contains(list_transform(ne, x -> x.kk), kk))) > 0
              |ORDER BY o_orderkey""".stripMargin)),
    Q("c5_id_gen", c5,
      Some(s"""SELECT c_custkey,
              |  ${olc6For("c_custkey")} || ',' ||
              |  substr(md5('node' || c_custkey || '2021-06-01'), 1, 6) AS opr_id
              |FROM customer ORDER BY c_custkey""".stripMargin)),
    Q("c8_match_id", c8,
      Some(s"""SELECT c_custkey,
              |  array_to_string(list_sort(list_distinct([
              |    ${olc6For("c_custkey")},
              |    'amenity',
              |    lower(c_mktsegment),
              |    lower(regexp_replace('Cafe ' || (c_custkey % 50), '[ -]', '', 'g'))])), '|')
              |    AS match_id
              |FROM customer ORDER BY c_custkey""".stripMargin)),
    Q("f10_id_codec", f10,
      Some(s"""WITH t AS (SELECT c_custkey,
              |  ${olc6For("c_custkey")} || ',s' || c_custkey AS opr_id FROM customer)
              |SELECT c_custkey, opr_id,
              |  split_part(opr_id, ',', 1) AS tile,
              |  split_part(opr_id, ',', 2) AS suffix,
              |  split_part(opr_id, ',', 1) || ',' || split_part(opr_id, ',', 2) = opr_id
              |    AS roundtrip
              |FROM t ORDER BY c_custkey""".stripMargin)),
    Q("c10_derived_maintenance", c10,
      Some("""SELECT c_custkey AS key, 'stale' AS current_type,
             |       'placetype=set:' || lower(c_mktsegment) AS edit_op
             |FROM customer
             |WHERE c_custkey % 13 = 0 AND lower(c_mktsegment) <> 'stale'
             |ORDER BY key""".stripMargin)),
    Q("e3_count_probe", e3,
      Some(s"""SELECT ${olc2For("c_custkey")} AS tile2, count(*) AS cnt,
              |       count(*) >= 25 AS need_split
              |FROM customer GROUP BY 1 ORDER BY tile2""".stripMargin)),
    Q("i3_adaptive_split", i3,
      Some(s"""WITH pts AS (SELECT ${olc6For("c_custkey")} AS tile6 FROM customer),
              |t AS (SELECT tile6, substr(tile6, 1, 4) AS tile4, substr(tile6, 1, 2) AS tile2
              |      FROM pts),
              |w AS (SELECT tile6,
              |        count(*) OVER (PARTITION BY tile2) AS cnt2,
              |        count(*) OVER (PARTITION BY tile4) AS cnt4,
              |        tile4, tile2 FROM t)
              |SELECT CASE WHEN cnt2 < 25 THEN tile2
              |            WHEN cnt4 < 25 THEN tile4
              |            ELSE tile6 END AS cell,
              |       count(*) AS n_points,
              |       CAST(length(CASE WHEN cnt2 < 25 THEN tile2
              |            WHEN cnt4 < 25 THEN tile4 ELSE tile6 END) AS INT) AS level
              |FROM w GROUP BY 1 ORDER BY cell""".stripMargin)),
    Q("f12_ts_align", f12,
      Some("""SELECT event_id,
             |  ((epoch_ns(ts) // 1000000000 - 180) // 900) * 900 AS aligned_epoch
             |FROM events WHERE event_id <= 2000 ORDER BY event_id""".stripMargin)),
    Q("g7_area_winding", g7,
      Some(s"""WITH g AS (SELECT user_id, event_id,
              |            (${Synth.latSql.format("event_id")}) AS lat,
              |            (${Synth.lonSql.format("event_id")}) AS lon FROM events),
              |t AS (SELECT user_id,
              |        list(struct_pack(lat := lat, lon := lon) ORDER BY event_id) AS v
              |      FROM g GROUP BY user_id),
              |c AS (SELECT user_id, v, len(v) AS n,
              |        list_sum(list_transform(v, p -> p.lat)) / len(v) AS latref
              |      FROM t),
              |m AS (SELECT user_id, v, n,
              |        111319.49079327358 * cos(radians(latref)) AS mlon,
              |        111319.49079327358 AS mlat
              |      FROM c)
              |SELECT user_id,
              |  CAST(round(abs(list_sum(list_transform(range(n), i ->
              |    (v[i+1].lon * mlon) * (v[(i+1) % n + 1].lat * mlat) -
              |    (v[(i+1) % n + 1].lon * mlon) * (v[i+1].lat * mlat)))) / 2.0 / 1e6, 0)
              |    AS BIGINT) AS area_km2,
              |  list_sum(list_transform(range(n), i ->
              |    (v[(i+1) % n + 1].lon - v[i+1].lon) *
              |    (v[(i+1) % n + 1].lat + v[i+1].lat))) > 0 AS clockwise
              |FROM m ORDER BY user_id""".stripMargin)),
    Q("g12_center_dispatch", g12,
      Some(s"""WITH g AS (SELECT user_id, event_id,
              |            (${Synth.latSql.format("event_id")}) AS lat,
              |            (${Synth.lonSql.format("event_id")}) AS lon FROM events),
              |t AS (SELECT user_id,
              |        list(struct_pack(lat := lat, lon := lon) ORDER BY event_id) AS v
              |      FROM g GROUP BY user_id),
              |w AS (SELECT user_id, v, len(v) AS n,
              |        list_transform(range(len(v) - 1), i -> struct_pack(
              |          w := ${Synth.havSql("v[i+1].lat", "v[i+1].lon", "v[i+2].lat", "v[i+2].lon")},
              |          mlat := (v[i+1].lat + v[i+2].lat) / 2,
              |          mlon := (v[i+1].lon + v[i+2].lon) / 2)) AS segs
              |      FROM t)
              |SELECT user_id,
              |  CASE WHEN user_id % 3 = 0 THEN 'node'
              |       WHEN user_id % 3 = 1 THEN 'way' ELSE 'relation' END AS entity_type,
              |  round(CASE WHEN user_id % 3 = 0 THEN v[1].lat
              |       WHEN user_id % 3 = 1 THEN
              |         list_sum(list_transform(segs, s -> s.mlat * s.w)) /
              |         list_sum(list_transform(segs, s -> s.w))
              |       ELSE list_sum(list_transform(v, p -> p.lat)) / n END, 6) AS clat,
              |  round(CASE WHEN user_id % 3 = 0 THEN v[1].lon
              |       WHEN user_id % 3 = 1 THEN
              |         list_sum(list_transform(segs, s -> s.mlon * s.w)) /
              |         list_sum(list_transform(segs, s -> s.w))
              |       ELSE list_sum(list_transform(v, p -> p.lon)) / n END, 6) AS clon
              |FROM w ORDER BY user_id""".stripMargin)),
    Q("x1_sketch_distinct", x1,
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |       TRUE AS approx_within_10pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("x2_sketch_quantile", x2,
      Some("""SELECT event_type, round(quantile_cont(value, 0.5), 4) AS exact_p50,
             |       TRUE AS approx_within_2pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("x3_heavy_hitters", x3,
      // the output is EXACT (pass 2 recounts candidates), so the oracle
      // is the plain GROUP BY / HAVING definition
      Some("""WITH w AS (SELECT unnest(list_filter(string_split(text, ' '),
             |            x -> x <> '')) AS item FROM documents),
             |n AS (SELECT count(*) AS total FROM w)
             |SELECT item, CAST(count(*) AS BIGINT) AS cnt
             |FROM w, n GROUP BY item, n.total
             |HAVING count(*) * 40 > n.total
             |ORDER BY item""".stripMargin)),
    Q("x4_countmin", x4, {
      // the portable poly31 fold over a string expression (the p3/p4
      // pattern) and CMS row j's affine bucket map, reproduced exactly
      def ih(s: String) =
        s"""list_reduce(list_prepend(0::BIGINT,
           |      list_transform(range(length($s)),
           |        c -> ascii(substr($s, CAST(c + 1 AS INT), 1))::BIGINT)),
           |      (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
      val bucket =
        "(ih * (((2*t.j+1)*1103515245) % 1000000007) + (t.j+1)*12345) % 1000000007 % 256"
      Some(s"""WITH w AS (SELECT unnest(list_filter(string_split(text, ' '),
              |            x -> x <> '')) AS item FROM documents),
              |h AS (SELECT item, ${ih("item")} AS ih FROM w),
              |cells AS (SELECT t.j AS j, $bucket AS bucket FROM h, range(4) t(j)),
              |sk AS MATERIALIZED (SELECT j, bucket, count(*) AS cnt
              |                    FROM cells GROUP BY j, bucket),
              |exact AS MATERIALIZED (SELECT item, count(*) AS exact_cnt
              |                       FROM w GROUP BY item),
              |tot AS (SELECT sum(exact_cnt) AS n FROM exact),
              |heavy AS (SELECT item, exact_cnt FROM exact, tot
              |          WHERE exact_cnt * 40 > tot.n),
              |pc AS (SELECT item, t.j AS j, $bucket AS bucket
              |       FROM (SELECT item, ${ih("item")} AS ih FROM heavy), range(4) t(j)),
              |est AS (SELECT pc.item, min(coalesce(sk.cnt, 0)) AS cms_cnt
              |        FROM pc LEFT JOIN sk USING (j, bucket) GROUP BY pc.item)
              |SELECT e.item, CAST(hv.exact_cnt AS BIGINT) AS exact_cnt,
              |       CAST(e.cms_cnt AS BIGINT) AS cms_cnt,
              |       e.cms_cnt >= hv.exact_cnt AS admissible
              |FROM est e JOIN heavy hv USING (item) ORDER BY item""".stripMargin)
    }),
    Q("x5_hll_shard_merge", x5,
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |       TRUE AS merged_within_5pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("x7_kmv_intersect", x7, {
      // the same poly31 code-point fold as x4, over the customer id
      def ih(s: String) =
        s"""list_reduce(list_prepend(0::BIGINT,
           |      list_transform(range(length($s)),
           |        c -> ascii(substr($s, CAST(c + 1 AS INT), 1))::BIGINT)),
           |      (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
      Some(s"""WITH u AS (SELECT DISTINCT
              |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS key,
              |    CAST(o_custkey AS VARCHAR) AS item FROM orders),
              |hs AS (SELECT DISTINCT key,
              |         (${ih("item")} * 1103515245 + 12345) % 1000000007 AS ih
              |       FROM u),
              |sk AS MATERIALIZED (SELECT key, ih FROM
              |  (SELECT key, ih, row_number() OVER (PARTITION BY key
              |     ORDER BY ih) AS rn FROM hs) WHERE rn <= 128),
              |mo AS (SELECT DISTINCT key FROM sk),
              |pairs AS (SELECT a.key AS key_a, b.key AS key_b
              |          FROM mo a JOIN mo b ON b.key = strftime(
              |            (a.key || '-01')::DATE + INTERVAL 1 MONTH, '%Y-%m')),
              |mg AS (SELECT key_a, key_b, ih,
              |         max(in_a) AS in_a, max(in_b) AS in_b FROM (
              |         SELECT p.key_a, p.key_b, s.ih, 1 AS in_a, 0 AS in_b
              |         FROM pairs p JOIN sk s ON s.key = p.key_a
              |         UNION ALL
              |         SELECT p.key_a, p.key_b, s.ih, 0, 1
              |         FROM pairs p JOIN sk s ON s.key = p.key_b)
              |       GROUP BY key_a, key_b, ih),
              |tk AS (SELECT * FROM (SELECT *, row_number() OVER (
              |         PARTITION BY key_a, key_b ORDER BY ih) AS rn FROM mg)
              |       WHERE rn <= 128),
              |ag AS (SELECT key_a, key_b, count(*) AS msz, max(ih) AS theta,
              |         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
              |                       THEN 1 ELSE 0 END) AS BIGINT) AS rho
              |       FROM tk GROUP BY key_a, key_b)
              |SELECT key_a, key_b,
              |  CASE WHEN msz < 128 THEN msz
              |       ELSE 127000000889 // theta END AS union_est,
              |  CASE WHEN msz < 128 THEN rho
              |       ELSE rho * (127000000889 // theta) // 128
              |       END AS inter_est,
              |  rho, msz
              |FROM ag ORDER BY key_a""".stripMargin)
    }),
  )

  /** KMV sketch pipeline ([[graft.pipeline.Sketches.kmv]] /
    * `kmvIntersect`): per-month distinct-customer sketches (k = 128)
    * from orders, intersected for consecutive month pairs — the
    * "returning users month-over-month" rollup a 100 TB deployment
    * answers from stored per-shard sketch artifacts instead of
    * re-scanning raw rows (HLL can't intersect; KMV can). Estimates are
    * pure integer math, oracle-checked exactly. */
  private def x7(s: SparkSession, d: String): DataFrame = {
    val ords = Tables.orders(s, d).select(
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("key"),
      col("o_custkey").cast("string").as("item"))
    val sk = graft.pipeline.Sketches.kmv(ords, "key", "item", k = 128)
    val months = sk.select("key").distinct()
    val pairs = months.select(col("key").as("key_a"))
      .join(months.select(col("key").as("key_b")),
        expr("key_b = date_format(add_months(to_date(key_a || '-01'), 1), 'yyyy-MM')"))
    graft.pipeline.Sketches.kmvIntersect(sk, pairs, k = 128)
      .orderBy("key_a")
  }
}
