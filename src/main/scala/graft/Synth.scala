package graft

import org.apache.spark.sql.Column

/** Deterministic synthesized geo/tags for testdata entities, shared by the
  * geo and places catalogs. Integer lattice arithmetic is identical on the
  * Spark and DuckDB sides, so derived doubles are bit-equal. */
object Synth {
  /** lat in [-85, 85), lon in [-180, 180), on a 0.01° grid. */
  def lat(key: Column): Column = (key * 7919L % 17000L) / 100.0 - 85.0
  def lon(key: Column): Column = (key * 104729L % 36000L) / 100.0 - 180.0

  val latSql = "((%s * 7919) %% 17000) / 100.0 - 85.0"
  val lonSql = "((%s * 104729) %% 36000) / 100.0 - 180.0"

  /** Haversine in SQL, mirroring GeoFunctions.haversineM's operation order. */
  def havSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""12745600.0 * asin(sqrt(
       |  pow(sin(radians(($lat2) - ($lat1)) / 2), 2) +
       |  pow(sin(radians(($lon2) - ($lon1)) / 2), 2)
       |    * cos(radians($lat1)) * cos(radians($lat2))))""".stripMargin

  /** OLC pair-section encode in SQL for in-range inputs; expects latv =
    * 90+lat, lonv = 180+normalized lon. Emits `len` chars (2, 4 or 6). */
  def olcSql(len: Int): String = {
    val A = "'23456789CFGHJMPQRVWX'"
    def digit(v: String): String =
      s"substr($A, CAST(least(floor($v), 19) AS INT) + 1, 1)"
    val parts = Seq.newBuilder[String]
    if (len >= 2) { parts += digit("latv / 20.0"); parts += digit("lonv / 20.0") }
    if (len >= 4) {
      parts += digit("latv - floor(latv / 20.0) * 20.0")
      parts += digit("lonv - floor(lonv / 20.0) * 20.0")
    }
    if (len >= 6) {
      parts += digit("(latv - floor(latv / 20.0) * 20.0 - floor(latv - floor(latv / 20.0) * 20.0)) / 0.05")
      parts += digit("(lonv - floor(lonv / 20.0) * 20.0 - floor(lonv - floor(lonv / 20.0) * 20.0)) / 0.05")
    }
    "concat(" + parts.result().mkString(",\n  ") + ")"
  }

  /** `latv`/`lonv` CTE fragment for a key expression. */
  def latvLonvSql(keyExpr: String): String =
    s"""90.0 + (${latSql.format(keyExpr)}) AS latv,
       |180.0 + (((((${lonSql.format(keyExpr)}) + 180.0) % 360.0) + 360.0) % 360.0 - 180.0) AS lonv""".stripMargin
}
