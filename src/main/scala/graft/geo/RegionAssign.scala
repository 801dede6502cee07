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
  * join. Each point first passes a per-region bbox check (cheap,
  * branch-predictable) before the exact ray-cast; with very large region
  * counts the next lever is a coarse tile→candidate-region index over the
  * bboxes, which drops per-point work from O(#regions) to O(candidates) —
  * same broadcast, one more array lookup. */
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

  /** Adds a `region` column: the name of the FIRST region (list order =
    * priority) containing the point, null when none or the coordinates
    * are null. */
  def assign(points: DataFrame, latCol: String, lonCol: String,
             regions: Seq[PolyFile.Region]): DataFrame = {
    val boxed = regions.map(box)
    val bc = points.sparkSession.sparkContext.broadcast(boxed)
    val tag = udf((lat: java.lang.Double, lon: java.lang.Double) =>
      if (lat == null || lon == null) null
      else {
        val la = lat.doubleValue(); val lo = lon.doubleValue()
        bc.value.collectFirst {
          case b if la >= b.minLat && la <= b.maxLat &&
            lo >= b.minLon && lo <= b.maxLon && b.region.contains(la, lo) =>
            b.region.name
        }.orNull
      })
    points.withColumn("region", tag(col(latCol), col(lonCol)))
  }
}
