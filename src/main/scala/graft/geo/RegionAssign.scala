package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Region assignment: tag every point with the first `.poly` region that
  * contains it — the places×regions point-in-polygon job the reference
  * sketches but never finished (BorderSyncBot.java:23-50 over its 1,900
  * shipped region files).
  *
  * Scale shape: the region set is a broadcast artifact (region polygons
  * are KBs each — thousands of regions fit comfortably in an executor),
  * so assignment is MAP-SIDE over any number of points: no shuffle, no
  * join. Per-point work is O(candidate regions), not O(#regions): a
  * coarse 20° tile → candidate-region index over the region bboxes is
  * built once (driver-side, bounded by regions × overlapped cells) and
  * shipped inside the same broadcast; each point looks up its cell, then
  * bbox-checks and exact-ray-casts only the candidates, in list order so
  * the first hit is the priority winner. */
object RegionAssign {

  private final case class Boxed(region: PolyFile.Region,
                                 minLat: Double, maxLat: Double,
                                 minLon: Double, maxLon: Double)

  private def box(r: PolyFile.Region): Boxed = {
    val pts = r.rings.iterator.filter(!_.hole).flatMap(_.points)
    var (mnLa, mxLa, mnLo, mxLo) = (90.0, -90.0, 180.0, -180.0)
    pts.foreach { p =>
      if (p.lat < mnLa) mnLa = p.lat; if (p.lat > mxLa) mxLa = p.lat
      if (p.lon < mnLo) mnLo = p.lon; if (p.lon > mxLo) mxLo = p.lon
    }
    Boxed(r, mnLa, mxLa, mnLo, mxLo)
  }

  /** 20° cell id of a point — the index granularity (matches the engine's
    * tile2 partition key). */
  private def cell(lat: Double, lon: Double): String = Olc.encode(lat, lon, 2)

  /** cell → region indices whose bbox overlaps the cell, ascending (list
    * order = priority, preserved by the ordered build). */
  private def index(boxed: Seq[Boxed]): Map[String, Array[Int]] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    boxed.zipWithIndex.foreach { case (b, i) =>
      var la = math.floor((b.minLat + 90.0) / 20.0) * 20.0 - 90.0
      while (la <= b.maxLat) {
        var lo = math.floor((b.minLon + 180.0) / 20.0) * 20.0 - 180.0
        while (lo <= b.maxLon) {
          // encode the cell's center so edge rounding can't skew the id
          val c = cell(math.min(89.9, la + 10.0), math.min(179.9, lo + 10.0))
          m.getOrElseUpdate(c, scala.collection.mutable.ArrayBuffer.empty) += i
          lo += 20.0
        }
        la += 20.0
      }
    }
    m.iterator.map { case (k, v) => k -> v.toArray }.toMap
  }

  /** Adds a `region` column: the name of the FIRST region (list order =
    * priority) containing the point, null when none or the coordinates
    * are null. */
  def assign(points: DataFrame, latCol: String, lonCol: String,
             regions: Seq[PolyFile.Region]): DataFrame = {
    val boxed = regions.map(box)
    val bc = points.sparkSession.sparkContext.broadcast((boxed.toArray, index(boxed)))
    val tag = udf((lat: java.lang.Double, lon: java.lang.Double) =>
      if (lat == null || lon == null) null
      else {
        val la = lat.doubleValue(); val lo = lon.doubleValue()
        val (all, idx) = bc.value
        val cands = idx.getOrElse(cell(la, lo), Array.emptyIntArray)
        var out: String = null
        var i = 0
        while (out == null && i < cands.length) {
          val b = all(cands(i))
          if (la >= b.minLat && la <= b.maxLat && lo >= b.minLon &&
              lo <= b.maxLon && b.region.contains(la, lo)) out = b.region.name
          i += 1
        }
        out
      })
    points.withColumn("region", tag(col(latCol), col(lonCol)))
  }
}
