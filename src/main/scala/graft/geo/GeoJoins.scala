package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance self-join: all point pairs within `radiusM` meters, as a
  * bucketed equi-join (never a cross join).
  *
  * Bucketing is (2-char OLC cell, latitude band): the 20°-cell neighbor
  * ring makes longitude coverage exact for radii up to ~194 km (the lon
  * span of a cell at |lat| = 85°), while the latitude band — sized to the
  * radius — refines the join key so candidate enumeration stays near-linear
  * in the true pair count instead of quadratic per cell. One side explodes
  * to its 9 neighbor cells × 3 adjacent bands; the other keeps its own
  * (cell, band). Exact: d <= R implies Δlat <= R/111,221 m/° <= bandDeg,
  * so a matching pair differs by at most one band and one cell ring.
  *
  * Reference semantics: the 150 m / 100 m proximity groupings of
  * OprHistoryChangesProvider.java:185-209 and MergePlaceBot.java:169-182,
  * generalized to any radius and SF.
  */
object GeoJoins {

  val MaxRadiusM = 190000.0 // single-ring lon coverage bound at |lat|<=85

  /** (a_key, b_key, dist_m) for all pairs with dist < radiusM, a_key < b_key.
    * `points` must have (keyCol, latCol, lonCol); keys must be unique. */
  def pairsWithin(points: DataFrame, keyCol: String, latCol: String,
                  lonCol: String, radiusM: Double): DataFrame = {
    require(radiusM <= MaxRadiusM, s"radius $radiusM exceeds single-ring bound $MaxRadiusM")
    val bandDeg = radiusM / 111000.0 // >= true Δlat bound R/111221 — safe
    // repartition BEFORE the per-row cell encode so it runs at full
    // parallelism (a single-file parquet scan is 1-2 tasks), and cache so
    // the probe and build legs don't each recompute the encode
    val par = points.sparkSession.sparkContext.defaultParallelism
    val pts = points.select(col(keyCol).as("k"), col(latCol).as("lat"),
        col(lonCol).as("lon"))
      .repartition(par)
      .withColumn("cell", GeoFunctions.olcEncode(col("lat"), col("lon"), 2))
      .withColumn("band", floor(col("lat") / bandDeg).cast("int"))
      .cache()
    // array_distinct (per-row, free) instead of a row distinct() — the only
    // duplicates Olc.neighbors produces are repeated codes at the poles
    val neighborsUdf = udf((code: String) => (Olc.neighbors(code) :+ code).distinct)
    val probe = pts.select(col("k").as("a_key"), col("lat").as("a_lat"),
        col("lon").as("a_lon"),
        explode(neighborsUdf(col("cell"))).as("cell"), col("band"))
      .select(col("a_key"), col("a_lat"), col("a_lon"), col("cell"),
        explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val build = pts.select(col("k").as("b_key"), col("lat").as("b_lat"),
      col("lon").as("b_lon"), col("cell"), col("band"))
    probe.join(build, Seq("cell", "band"))
      .where(col("a_key") < col("b_key") &&
        abs(col("a_lat") - col("b_lat")) <= lit(bandDeg))
      .withColumn("dist_m", GeoFunctions.haversineM(col("a_lat"), col("a_lon"),
        col("b_lat"), col("b_lon")))
      .where(col("dist_m") < radiusM)
      .select("a_key", "b_key", "dist_m")
  }
}
