package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.{GeoFunctions, Geometry, Olc}

/** Geo operators from SURVEY §2 G/E1/D2 over the testdata tables.
  *
  * The testdata has no coordinates, so each entity gets deterministic
  * synthesized ones from its integer key (identical integer arithmetic on the
  * Spark and DuckDB sides → bit-identical doubles). Trig results may differ
  * by ulps between JVMs and libm, so every emitted distance is rounded and
  * thresholds are chosen away from any pair's boundary.
  */
object CatalogGeo {

  /** lat in [-85, 85), lon in [-180, 180), on a 0.01° grid. */
  private def synthLat(key: Column): Column = (key * 7919L % 17000L) / 100.0 - 85.0
  private def synthLon(key: Column): Column = (key * 104729L % 36000L) / 100.0 - 180.0

  private val synthLatSql = "((%s * 7919) %% 17000) / 100.0 - 85.0"
  private val synthLonSql = "((%s * 104729) %% 36000) / 100.0 - 180.0"

  /** Haversine in SQL, mirroring GeoFunctions.haversineM's operation order. */
  private def havSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""12745600.0 * asin(sqrt(
       |  pow(sin(radians(($lat2) - ($lat1)) / 2), 2) +
       |  pow(sin(radians(($lon2) - ($lon1)) / 2), 2)
       |    * cos(radians($lat1)) * cos(radians($lat2))))""".stripMargin

  /** 6-char OLC encode in SQL (pair sections, in-range inputs), mirroring
    * GeoFunctions.olcEncode digit arithmetic. Expects columns latv = 90+lat,
    * lonv = 180+lon. */
  private val olc6Sql =
    """concat(
      |  substr('23456789CFGHJMPQRVWX', CAST(least(floor(latv / 20.0), 19) AS INT) + 1, 1),
      |  substr('23456789CFGHJMPQRVWX', CAST(least(floor(lonv / 20.0), 19) AS INT) + 1, 1),
      |  substr('23456789CFGHJMPQRVWX', CAST(least(floor(latv - floor(latv / 20.0) * 20.0), 19) AS INT) + 1, 1),
      |  substr('23456789CFGHJMPQRVWX', CAST(least(floor(lonv - floor(lonv / 20.0) * 20.0), 19) AS INT) + 1, 1),
      |  substr('23456789CFGHJMPQRVWX', CAST(least(floor((latv - floor(latv / 20.0) * 20.0 - floor(latv - floor(latv / 20.0) * 20.0)) / 0.05), 19) AS INT) + 1, 1),
      |  substr('23456789CFGHJMPQRVWX', CAST(least(floor((lonv - floor(lonv / 20.0) * 20.0 - floor(lonv - floor(lonv / 20.0) * 20.0)) / 0.05), 19) AS INT) + 1, 1))""".stripMargin

  private def customerGeo(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      col("c_nationkey"),
      synthLat(col("c_custkey")).as("lat"),
      synthLon(col("c_custkey")).as("lon"))

  /** G1 haversine distance to a fixed point (OsmMapUtils.java:99-110). */
  private def g1(s: SparkSession, d: String): DataFrame =
    customerGeo(s, d)
      .where(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        round(GeoFunctions.haversineM(col("lat"), col("lon"), lit(48.15), lit(17.12)), 1)
          .as("dist_m"))
      .orderBy("c_custkey")

  /** G2/C5/F8 OLC tile-id encode — the engine's partition key
    * (OsmLocationTool.java:26-33). */
  private def g2(s: SparkSession, d: String): DataFrame =
    customerGeo(s, d)
      .select(col("c_custkey"),
        GeoFunctions.olcEncode(col("lat"), col("lon"), 6).as("tileid"))
      .orderBy("c_custkey")

  /** E1 tile-prefix rollup: 4-char OLC summary counts
    * (OprSummaryPlaceDataProvider.java:26-59), with decoded cell centers. */
  private def e1(s: SparkSession, d: String): DataFrame =
    customerGeo(s, d)
      .select(substring(GeoFunctions.olcEncode(col("lat"), col("lon"), 6), 1, 4).as("tile4"))
      .groupBy("tile4")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("center_lat", round(GeoFunctions.olcCenterLat(col("tile4")), 6))
      .withColumn("center_lon", round(GeoFunctions.olcCenterLon(col("tile4")), 6))
      .orderBy("tile4")

  /** D2/D4 tile-bucketed distance self-join: event-point pairs within 100 km
    * (OprHistoryChangesProvider.java:185-209; MergePlaceBot.java:169-182)
    * via the engine's GeoJoins operator (latitude-adaptive GeoBands
    * bucketing); the oracle brute-forces the same predicate. */
  private def d2(s: SparkSession, d: String): DataFrame = {
    val g = Tables.events(s, d).select(
      col("event_id").as("k"),
      synthLat(col("event_id")).as("lat"),
      synthLon(col("event_id")).as("lon"))
    graft.geo.GeoJoins.pairsWithin(g, "k", "lat", "lon", 100000.0)
      .select(col("a_key"), col("b_key"), round(col("dist_m"), 1).as("dist_m"))
      .orderBy("a_key", "b_key")
  }

  /** D2/D3-family distance join in its NAIVE form — a plain inner join
    * whose only spatial predicate is `haversine_m(...) < r` — relying on
    * graft.plans.HaversineJoinRule to rewrite it into the tile-bucketed
    * equi-join GeoJoins builds by hand. HaversineJoinRuleSpec pins the
    * rewritten plan shape (no nested-loop) and brute-force parity. */
  private def d9(s: SparkSession, d: String): DataFrame = {
    graft.plans.HaversineJoinRule.register(s)
    val a = Tables.events(s, d).select(col("event_id"),
      synthLat(col("event_id")).as("a_lat"), synthLon(col("event_id")).as("a_lon"))
    val b = customerGeo(s, d).select(col("c_custkey"),
      col("lat").as("b_lat"), col("lon").as("b_lon"))
    a.join(b, GeoFunctions.haversineM(col("a_lat"), col("a_lon"),
        col("b_lat"), col("b_lon")) < lit(60000.0))
      .select(col("event_id"), col("c_custkey"),
        round(GeoFunctions.haversineM(col("a_lat"), col("a_lon"),
          col("b_lat"), col("b_lon")), 1).as("dist_m"))
      .orderBy("event_id", "c_custkey")
  }

  /** G3 mercator tile numbers (OsmMapUtils.java:41-59). */
  private def g3(s: SparkSession, d: String): DataFrame =
    customerGeo(s, d)
      .select(col("c_custkey"),
        GeoFunctions.tileX(lit(10.0), col("lon")).cast("long").as("tile_x"),
        GeoFunctions.tileY(lit(10.0), GeoFunctions.checkLat(col("lat"))).cast("long").as("tile_y"))
      .orderBy("c_custkey")

  /** G15 Z-order layout key (beyond ref): Morton-interleaved zoom-10 tile
    * coordinates plus the derived file bucket (zkey >> 8) — the write-time
    * clustering the engine would apply before a 100 TB tile-partitioned
    * write so bbox scans touch contiguous files
    * ([[geo.GeoFunctions.zorderKey]]). */
  private def g15(s: SparkSession, d: String): DataFrame = {
    val tiles = customerGeo(s, d).select(col("c_custkey"),
      GeoFunctions.tileX(lit(10.0), col("lon")).cast("long").as("tile_x"),
      GeoFunctions.tileY(lit(10.0), GeoFunctions.checkLat(col("lat"))).cast("long").as("tile_y"))
    tiles
      .withColumn("zkey", GeoFunctions.zorderKey(col("tile_x"), col("tile_y"), 10))
      .withColumn("file_bucket", shiftright(col("zkey"), 8))
      .orderBy("c_custkey")
  }

  /** G16 Hilbert layout key (beyond ref): the stronger-locality companion
    * to [[g15]] — consecutive keys are edge-adjacent cells, so
    * Hilbert-sorted files give a bbox scan strictly fewer file runs than
    * Morton's diagonal jumps ([[geo.GeoFunctions.hilbertKey]]). */
  private def g16(s: SparkSession, d: String): DataFrame = {
    val tiles = customerGeo(s, d).select(col("c_custkey"),
      GeoFunctions.tileX(lit(10.0), col("lon")).cast("long").as("tile_x"),
      GeoFunctions.tileY(lit(10.0), GeoFunctions.checkLat(col("lat"))).cast("long").as("tile_y"))
    tiles
      .withColumn("hkey", GeoFunctions.hilbertKey(col("tile_x"), col("tile_y"), 10))
      .withColumn("file_bucket", shiftright(col("hkey"), 8))
      .orderBy("c_custkey")
  }

  /** The g16 oracle: the xy→d rotate-and-accumulate recurrence unrolled
    * into one CTE per bit (all-integer CASE logic; every step reads the
    * PREVIOUS step's x/y, exactly like the Spark fold). */
  private def hilbertOracleSql(bits: Int): String = {
    val steps = (0 until bits).map { i =>
      val k = bits - 1 - i
      s"""h${i + 1} AS (SELECT c_custkey, tile_x, tile_y,
         |  CASE WHEN ((y >> $k) & 1) = 0 THEN
         |    CASE WHEN ((x >> $k) & 1) = 1 THEN (1::BIGINT << $k) - 1 - y ELSE y END
         |  ELSE x END AS x,
         |  CASE WHEN ((y >> $k) & 1) = 0 THEN
         |    CASE WHEN ((x >> $k) & 1) = 1 THEN (1::BIGINT << $k) - 1 - x ELSE x END
         |  ELSE y END AS y,
         |  d + (1::BIGINT << ${2 * k}) * xor(3 * ((x >> $k) & 1), (y >> $k) & 1) AS d
         |FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT c_custkey,
       |    CAST(floor((($custLonSql) + 180.0) / 360.0 * pow(2.0, 10.0)) AS BIGINT) AS tile_x,
       |    CAST(floor((1.0 - ln(tan(radians(least(greatest($custLatSql, -85.0511), 85.0511)))
       |      + 1.0 / cos(radians(least(greatest($custLatSql, -85.0511), 85.0511)))) / pi())
       |      / 2.0 * pow(2.0, 10.0)) AS BIGINT) AS tile_y
       |  FROM customer),
       |h0 AS (SELECT c_custkey, tile_x, tile_y, tile_x AS x, tile_y AS y,
       |       0::BIGINT AS d FROM t),
       |$steps
       |SELECT c_custkey, tile_x, tile_y, d AS hkey, d >> 8 AS file_bucket
       |FROM h$bits ORDER BY c_custkey""".stripMargin
  }

  /** G9/G10 bbox containment + lat/lon normalization (QuadRect.java:23-69;
    * OsmMapUtils.java:62-93) over deliberately out-of-range inputs. */
  private def g9(s: SparkSession, d: String): DataFrame = {
    val rawLon = (col("c_custkey") * 13L % 720L).cast("double") - 360.0
    val rawLat = (col("c_custkey") * 17L % 200L).cast("double") - 100.0
    Tables.customer(s, d)
      .select(col("c_custkey"),
        GeoFunctions.checkLon(rawLon).as("lon"),
        GeoFunctions.checkLat(rawLat).as("lat"))
      .withColumn("in_bbox",
        GeoFunctions.bboxContains(lit(-40.0), lit(-90.0), lit(40.0), lit(90.0),
          col("lat"), col("lon")))
      .orderBy("c_custkey")
  }

  /** G4/G5 point-in-polygon + Douglas-Peucker — row-local geometry UDFs
    * (OsmMapUtils.java:496-524,317-427). Not SQL-expressible → rows-only
    * check; exactness covered by GeometrySpec. */
  private def g4(s: SparkSession, d: String): DataFrame = {
    val poly = Seq(
      Geometry.Pt(-30, -60), Geometry.Pt(30, -60), Geometry.Pt(45, 0),
      Geometry.Pt(30, 60), Geometry.Pt(-30, 60))
    val inPoly = udf((lat: Double, lon: Double) => Geometry.pointInPolygon(lat, lon, poly))
    customerGeo(s, d)
      .where(inPoly(col("lat"), col("lon")))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("inside_cnt"))
      .orderBy("c_nationkey")
  }

  /** G5/G7/G8 polyline simplification, area, winding over per-user event
    * trails (OsmMapUtils.java:317-427,531-587,429-493). Rows-only. */
  private def g5(s: SparkSession, d: String): DataFrame = {
    val simplifyCnt = udf((lats: Seq[Double], lons: Seq[Double]) => {
      val pts = lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }
      Geometry.simplify(pts, 0.5).size
    })
    val areaUdf = udf((lats: Seq[Double], lons: Seq[Double]) => {
      val pts = lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }
      math.round(Geometry.areaM2(pts) / 1e6) // km^2
    })
    val cwUdf = udf((lats: Seq[Double], lons: Seq[Double]) => {
      val pts = lats.zip(lons).map { case (a, b) => Geometry.Pt(a, b) }
      Geometry.isClockwise(pts)
    })
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        synthLat(col("event_id")).as("lat"), synthLon(col("event_id")).as("lon"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_id"), col("lat"), col("lon")))).as("trail"))
      .select(col("user_id"),
        col("trail.lat").as("lats"), col("trail.lon").as("lons"))
      .select(col("user_id"),
        simplifyCnt(col("lats"), col("lons")).as("simplified_points"),
        areaUdf(col("lats"), col("lons")).as("area_km2"),
        cwUdf(col("lats"), col("lons")).as("clockwise"))
      .orderBy("user_id")
  }

  private val custLatSql = synthLatSql.format("c_custkey")
  private val custLonSql = synthLonSql.format("c_custkey")

  /** Deterministic .poly region files for the region-assignment job —
    * exercised through the REAL PolyFile parser (A12). `delta` overlaps
    * `beta` (list order decides priority) and `gamma` carries a hole. */
  private val polyTexts: Seq[String] = Seq(
    """alpha
      |1
      |  -170.0 -50.0
      |  -170.0 10.0
      |  -120.0 25.0
      |  -70.0 10.0
      |  -70.0 -50.0
      |END
      |END""".stripMargin,
    """beta
      |1
      |  20.0 20.0
      |  20.0 70.0
      |  120.0 70.0
      |  120.0 20.0
      |END
      |END""".stripMargin,
    """gamma
      |1
      |  60.0 -75.0
      |  100.0 -25.0
      |  140.0 -75.0
      |END
      |!hole
      |  90.0 -65.0
      |  100.0 -45.0
      |  110.0 -65.0
      |END
      |END""".stripMargin,
    """delta
      |1
      |  80.0 30.0
      |  80.0 60.0
      |  160.0 60.0
      |  160.0 30.0
      |END
      |END""".stripMargin)

  /** G4/A12 composed as the region-assignment job the reference's
    * BorderSyncBot sketches: parse .poly regions, tag every point with its
    * first containing region (bbox prefilter + exact ray cast), map-side
    * through a broadcast region set — no shuffle at any point count. */
  private def g14(s: SparkSession, d: String): DataFrame = {
    val regions = polyTexts.map { t =>
      val lines = t.split("\n")
      graft.geo.PolyFile.parse(lines.iterator, lines.head.trim)
    }
    graft.geo.RegionAssign.assign(
        customerGeo(s, d).repartition(s.sparkContext.defaultParallelism),
        "lat", "lon", regions)
      .select("c_custkey", "region")
      .orderBy("c_custkey")
  }

  val entries: Seq[Q] = Seq(
    Q("g14_region_assign", g14,
      // same edge-by-edge ray cast as g4's oracle, generalized to several
      // regions and rings; holes subtract, min rid = list-order priority
      Some(s"""WITH pts AS (SELECT c_custkey, ($custLatSql) AS lat,
              |                    ($custLonSql) AS lon FROM customer),
              |v(rid, ring, hole, i, n, plat, plon) AS (SELECT * FROM (VALUES
              |  (0, 0, false, 0, 5, -50.0, -170.0), (0, 0, false, 1, 5, 10.0, -170.0),
              |  (0, 0, false, 2, 5, 25.0, -120.0), (0, 0, false, 3, 5, 10.0, -70.0),
              |  (0, 0, false, 4, 5, -50.0, -70.0),
              |  (1, 0, false, 0, 4, 20.0, 20.0), (1, 0, false, 1, 4, 70.0, 20.0),
              |  (1, 0, false, 2, 4, 70.0, 120.0), (1, 0, false, 3, 4, 20.0, 120.0),
              |  (2, 0, false, 0, 3, -75.0, 60.0), (2, 0, false, 1, 3, -25.0, 100.0),
              |  (2, 0, false, 2, 3, -75.0, 140.0),
              |  (2, 1, true, 0, 3, -65.0, 90.0), (2, 1, true, 1, 3, -45.0, 100.0),
              |  (2, 1, true, 2, 3, -65.0, 110.0),
              |  (3, 0, false, 0, 4, 30.0, 80.0), (3, 0, false, 1, 4, 60.0, 80.0),
              |  (3, 0, false, 2, 4, 60.0, 160.0), (3, 0, false, 3, 4, 30.0, 160.0)) t),
              |e AS (SELECT a.rid, a.ring, a.hole, a.plat AS ilat, a.plon AS ilon,
              |             b.plat AS jlat, b.plon AS jlon
              |      FROM v a JOIN v b ON a.rid = b.rid AND a.ring = b.ring
              |        AND b.i = (a.i + a.n - 1) % a.n),
              |cr AS (SELECT p.c_custkey, e.rid, e.ring, e.hole,
              |         count(*) FILTER ((e.ilat > p.lat) <> (e.jlat > p.lat)
              |           AND p.lon < e.ilon + (p.lat - e.ilat) / (e.jlat - e.ilat)
              |                        * (e.jlon - e.ilon)) AS crossings
              |       FROM pts p CROSS JOIN e GROUP BY 1, 2, 3, 4),
              |reg AS (SELECT c_custkey, rid,
              |          coalesce(bool_or(crossings % 2 = 1) FILTER (WHERE NOT hole),
              |                   false) AS in_outer,
              |          coalesce(bool_or(crossings % 2 = 1) FILTER (WHERE hole),
              |                   false) AS in_hole
              |        FROM cr GROUP BY 1, 2),
              |m AS (SELECT c_custkey, min(rid) AS rid FROM reg
              |      WHERE in_outer AND NOT in_hole GROUP BY 1)
              |SELECT p.c_custkey,
              |  CASE m.rid WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
              |             WHEN 2 THEN 'gamma' WHEN 3 THEN 'delta' END AS region
              |FROM pts p LEFT JOIN m USING (c_custkey)
              |ORDER BY c_custkey""".stripMargin)),
    Q("g1_haversine", g1,
      Some(s"""SELECT c_custkey,
              |  round(${havSql(custLatSql, custLonSql, "48.15", "17.12")}, 1) AS dist_m
              |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin)),
    Q("g2_olc_encode", g2,
      Some(s"""WITH v AS (
              |  SELECT c_custkey,
              |         90.0 + ($custLatSql) AS latv,
              |         180.0 + ((((($custLonSql) + 180.0) % 360.0) + 360.0) % 360.0 - 180.0) AS lonv
              |  FROM customer)
              |SELECT c_custkey, $olc6Sql AS tileid FROM v ORDER BY c_custkey""".stripMargin)),
    Q("e1_tile_rollup", e1,
      Some(s"""WITH v AS (
              |  SELECT 90.0 + ($custLatSql) AS latv,
              |         180.0 + ((((($custLonSql) + 180.0) % 360.0) + 360.0) % 360.0 - 180.0) AS lonv
              |  FROM customer),
              |t AS (
              |  SELECT concat(
              |    substr('23456789CFGHJMPQRVWX', CAST(least(floor(latv / 20.0), 19) AS INT) + 1, 1),
              |    substr('23456789CFGHJMPQRVWX', CAST(least(floor(lonv / 20.0), 19) AS INT) + 1, 1),
              |    substr('23456789CFGHJMPQRVWX', CAST(least(floor(latv - floor(latv / 20.0) * 20.0), 19) AS INT) + 1, 1),
              |    substr('23456789CFGHJMPQRVWX', CAST(least(floor(lonv - floor(lonv / 20.0) * 20.0), 19) AS INT) + 1, 1)) AS tile4
              |  FROM v)
              |SELECT tile4, count(*) AS cnt,
              |  round(-90.0 + (strpos('23456789CFGHJMPQRVWX', substr(tile4, 1, 1)) - 1) * 20.0
              |        + (strpos('23456789CFGHJMPQRVWX', substr(tile4, 3, 1)) - 1) * 1.0 + 0.5, 6) AS center_lat,
              |  round(-180.0 + (strpos('23456789CFGHJMPQRVWX', substr(tile4, 2, 1)) - 1) * 20.0
              |        + (strpos('23456789CFGHJMPQRVWX', substr(tile4, 4, 1)) - 1) * 1.0 + 0.5, 6) AS center_lon
              |FROM t GROUP BY tile4 ORDER BY tile4""".stripMargin)),
    Q("d2_distance_join", d2,
      Some(s"""WITH g AS (
              |  SELECT event_id AS k, (${synthLatSql.format("event_id")}) AS lat,
              |         (${synthLonSql.format("event_id")}) AS lon
              |  FROM events)
              |SELECT a.k AS a_key, b.k AS b_key,
              |       round(${havSql("a.lat", "a.lon", "b.lat", "b.lon")}, 1) AS dist_m
              |FROM g a JOIN g b ON a.k < b.k
              |WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} < 100000.0
              |ORDER BY a_key, b_key""".stripMargin)),
    Q("d9_radius_join_rule", d9,
      Some(s"""WITH a AS (
              |  SELECT event_id, (${synthLatSql.format("event_id")}) AS a_lat,
              |         (${synthLonSql.format("event_id")}) AS a_lon
              |  FROM events),
              |b AS (
              |  SELECT c_custkey, ($custLatSql) AS b_lat, ($custLonSql) AS b_lon
              |  FROM customer)
              |SELECT a.event_id, b.c_custkey,
              |       round(${havSql("a.a_lat", "a.a_lon", "b.b_lat", "b.b_lon")}, 1) AS dist_m
              |FROM a JOIN b ON ${havSql("a.a_lat", "a.a_lon", "b.b_lat", "b.b_lon")} < 60000.0
              |ORDER BY event_id, c_custkey""".stripMargin)),
    Q("g3_mercator_tiles", g3,
      Some(s"""SELECT c_custkey,
              |  CAST(floor((($custLonSql) + 180.0) / 360.0 * pow(2.0, 10.0)) AS BIGINT) AS tile_x,
              |  CAST(floor((1.0 - ln(tan(radians(least(greatest($custLatSql, -85.0511), 85.0511)))
              |    + 1.0 / cos(radians(least(greatest($custLatSql, -85.0511), 85.0511)))) / pi())
              |    / 2.0 * pow(2.0, 10.0)) AS BIGINT) AS tile_y
              |FROM customer ORDER BY c_custkey""".stripMargin)),
    Q("g15_zorder_layout", g15,
      Some(s"""WITH t AS (
              |  SELECT c_custkey,
              |    CAST(floor((($custLonSql) + 180.0) / 360.0 * pow(2.0, 10.0)) AS BIGINT) AS tile_x,
              |    CAST(floor((1.0 - ln(tan(radians(least(greatest($custLatSql, -85.0511), 85.0511)))
              |      + 1.0 / cos(radians(least(greatest($custLatSql, -85.0511), 85.0511)))) / pi())
              |      / 2.0 * pow(2.0, 10.0)) AS BIGINT) AS tile_y
              |  FROM customer),
              |z AS (SELECT c_custkey, tile_x, tile_y,
              |        CAST(list_sum(list_transform(range(10), b ->
              |          ((((tile_x >> b) & 1) << (2*b + 1))
              |           + (((tile_y >> b) & 1) << (2*b))))) AS BIGINT) AS zkey
              |      FROM t)
              |SELECT c_custkey, tile_x, tile_y, zkey, zkey >> 8 AS file_bucket
              |FROM z ORDER BY c_custkey""".stripMargin)),
    Q("g16_hilbert_layout", g16, Some(hilbertOracleSql(10))),
    Q("g9_bbox_normalize", g9,
      Some("""SELECT c_custkey,
             |  ((((CAST(c_custkey * 13 % 720 AS DOUBLE) - 360.0) + 180.0) % 360.0 + 360.0) % 360.0 - 180.0) AS lon,
             |  least(greatest(CAST(c_custkey * 17 % 200 AS DOUBLE) - 100.0, -85.0511), 85.0511) AS lat,
             |  (least(greatest(CAST(c_custkey * 17 % 200 AS DOUBLE) - 100.0, -85.0511), 85.0511) >= -40.0
             |   AND least(greatest(CAST(c_custkey * 17 % 200 AS DOUBLE) - 100.0, -85.0511), 85.0511) <= 40.0
             |   AND ((((CAST(c_custkey * 13 % 720 AS DOUBLE) - 360.0) + 180.0) % 360.0 + 360.0) % 360.0 - 180.0) >= -90.0
             |   AND ((((CAST(c_custkey * 13 % 720 AS DOUBLE) - 360.0) + 180.0) % 360.0 + 360.0) % 360.0 - 180.0) <= 90.0)
             |  AS in_bbox
             |FROM customer ORDER BY c_custkey""".stripMargin)),
    Q("g4_point_in_polygon", g4,
      // ray casting replicated edge-by-edge in SQL: +,-,*,/ and comparisons
      // are IEEE-exact in both engines, so crossing parity matches the UDF
      // bit-for-bit (only libm trig can diverge, and there is none here)
      Some(s"""WITH pts AS (SELECT c_custkey, c_nationkey,
              |        ($custLatSql) AS lat, ($custLonSql) AS lon FROM customer),
              |poly(i, plat, plon) AS (SELECT * FROM (VALUES
              |  (0, -30.0, -60.0), (1, 30.0, -60.0), (2, 45.0, 0.0),
              |  (3, 30.0, 60.0), (4, -30.0, 60.0)) v),
              |edges AS (SELECT a.plat AS ilat, a.plon AS ilon, b.plat AS jlat, b.plon AS jlon
              |          FROM poly a JOIN poly b ON b.i = (a.i + 4) % 5),
              |x AS (SELECT p.c_custkey, p.c_nationkey,
              |        count(*) FILTER ((e.ilat > p.lat) <> (e.jlat > p.lat)
              |          AND p.lon < e.ilon + (p.lat - e.ilat) / (e.jlat - e.ilat) * (e.jlon - e.ilon))
              |          AS crossings
              |      FROM pts p CROSS JOIN edges e GROUP BY 1, 2)
              |SELECT c_nationkey, count(*) AS inside_cnt FROM x WHERE crossings % 2 = 1
              |GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("g5_geometry_trail", g5,
      // Douglas-Peucker as a recursive segment-split CTE: each parent (lo,hi)
      // whose max orthogonal distance exceeds eps emits its two halves; kept
      // points = 2 endpoints + one split point per divided parent, so
      // |r| = 1 + 2*splits and kept = 2 + (|r|-1)/2. The distance kernel
      // mirrors Geometry.orthogonalDist op-for-op (sqrt/*,+ are IEEE-exact;
      // cos(x/180*pi) matches Math.toRadians' evaluation order). Area and
      // winding reuse the g7 oracle shapes.
      Some(s"""WITH RECURSIVE g AS (SELECT user_id, event_id,
              |            (${synthLatSql.format("event_id")}) AS lat,
              |            (${synthLonSql.format("event_id")}) AS lon FROM events),
              |t AS (SELECT user_id, list(struct_pack(lat := lat, lon := lon) ORDER BY event_id) AS v
              |      FROM g GROUP BY user_id),
              |base AS (SELECT user_id, v, len(v) AS n FROM t),
              |r AS (
              |  SELECT user_id, 0 AS lo, n - 1 AS hi FROM base WHERE n > 2
              |  UNION ALL
              |  SELECT p.user_id,
              |         CASE WHEN s.side = 0 THEN p.lo ELSE p.best END AS lo,
              |         CASE WHEN s.side = 0 THEN p.best ELSE p.hi END AS hi
              |  FROM (
              |    SELECT q.user_id, q.lo, q.hi,
              |           q.lo + list_position(q.ds, list_max(q.ds)) AS best
              |    FROM (
              |      SELECT r.user_id, r.lo, r.hi,
              |             list_transform(range(r.lo + 1, r.hi), i ->
              |               CASE WHEN w.len2 = 0.0 THEN
              |                 sqrt((b.v[i+1].lon * w.kx - w.ax) * (b.v[i+1].lon * w.kx - w.ax)
              |                    + (b.v[i+1].lat - w.ay) * (b.v[i+1].lat - w.ay))
              |               ELSE
              |                 sqrt((b.v[i+1].lon * w.kx - (w.ax + greatest(0.0, least(1.0,
              |                        ((b.v[i+1].lon * w.kx - w.ax) * w.dx + (b.v[i+1].lat - w.ay) * w.dy) / w.len2)) * w.dx))
              |                    * (b.v[i+1].lon * w.kx - (w.ax + greatest(0.0, least(1.0,
              |                        ((b.v[i+1].lon * w.kx - w.ax) * w.dx + (b.v[i+1].lat - w.ay) * w.dy) / w.len2)) * w.dx))
              |                    + (b.v[i+1].lat - (w.ay + greatest(0.0, least(1.0,
              |                        ((b.v[i+1].lon * w.kx - w.ax) * w.dx + (b.v[i+1].lat - w.ay) * w.dy) / w.len2)) * w.dy))
              |                    * (b.v[i+1].lat - (w.ay + greatest(0.0, least(1.0,
              |                        ((b.v[i+1].lon * w.kx - w.ax) * w.dx + (b.v[i+1].lat - w.ay) * w.dy) / w.len2)) * w.dy)))
              |               END) AS ds
              |      FROM r JOIN base b USING (user_id)
              |      CROSS JOIN LATERAL (
              |        SELECT kx, b.v[r.lo+1].lon * kx AS ax, b.v[r.lo+1].lat AS ay,
              |               b.v[r.hi+1].lon * kx - b.v[r.lo+1].lon * kx AS dx,
              |               b.v[r.hi+1].lat - b.v[r.lo+1].lat AS dy,
              |               (b.v[r.hi+1].lon * kx - b.v[r.lo+1].lon * kx) * (b.v[r.hi+1].lon * kx - b.v[r.lo+1].lon * kx)
              |             + (b.v[r.hi+1].lat - b.v[r.lo+1].lat) * (b.v[r.hi+1].lat - b.v[r.lo+1].lat) AS len2
              |        FROM (SELECT cos((b.v[r.lo+1].lat + b.v[r.hi+1].lat) / 2 / 180.0 * pi()) AS kx)
              |      ) w
              |      WHERE r.hi > r.lo + 1
              |    ) q
              |    WHERE list_max(q.ds) > 0.5
              |  ) p, (VALUES (0), (1)) s(side)
              |),
              |dp AS (SELECT b.user_id,
              |         CAST(CASE WHEN b.n <= 2 THEN b.n ELSE 2 + (c.cnt - 1) // 2 END AS INT)
              |           AS simplified_points
              |       FROM base b
              |       LEFT JOIN (SELECT user_id, count(*) AS cnt FROM r GROUP BY user_id) c
              |         USING (user_id)),
              |c2 AS (SELECT user_id, v, n,
              |         list_sum(list_transform(v, p -> p.lat)) / n AS latref FROM base),
              |m AS (SELECT user_id, v, n,
              |        111319.49079327358 * cos(radians(latref)) AS mlon,
              |        111319.49079327358 AS mlat
              |      FROM c2),
              |aw AS (SELECT user_id,
              |  CAST(round(abs(list_sum(list_transform(range(n), i ->
              |    (v[i+1].lon * mlon) * (v[(i+1) % n + 1].lat * mlat) -
              |    (v[(i+1) % n + 1].lon * mlon) * (v[i+1].lat * mlat)))) / 2.0 / 1e6, 0)
              |    AS BIGINT) AS area_km2,
              |  list_sum(list_transform(range(n), i ->
              |    (v[(i+1) % n + 1].lon - v[i+1].lon) *
              |    (v[(i+1) % n + 1].lat + v[i+1].lat))) > 0 AS clockwise
              |FROM m)
              |SELECT dp.user_id, dp.simplified_points, aw.area_km2, aw.clockwise
              |FROM dp JOIN aw USING (user_id) ORDER BY user_id""".stripMargin)),
  )
}
