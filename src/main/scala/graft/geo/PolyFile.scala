package graft.geo

/** Osmosis `.poly` region-file parser (SURVEY §2 A12) — the reference
  * ships 1,900+ of these as country/region boundaries and has a reader
  * stub (BorderSyncBot.java:23-50). Format: a name line, then one or more
  * sections each holding "lon lat" coordinate pairs, a section per ring;
  * section names starting with '!' are holes; "END" closes sections and
  * the file.
  */
object PolyFile {

  final case class Ring(points: Vector[Geometry.Pt], hole: Boolean)
  final case class Region(name: String, rings: Vector[Ring]) {
    /** Point-in-region: inside any outer ring and inside no hole. */
    def contains(lat: Double, lon: Double): Boolean = {
      val inOuter = rings.exists(r => !r.hole &&
        Geometry.pointInPolygon(lat, lon, r.points))
      inOuter && !rings.exists(r => r.hole &&
        Geometry.pointInPolygon(lat, lon, r.points))
    }
  }

  def parse(lines: Iterator[String], name: String): Region = {
    val rings = Vector.newBuilder[Ring]
    var section: String = null
    var pts = Vector.newBuilder[Geometry.Pt]
    lines.drop(1).foreach { raw =>
      val line = raw.trim
      if (line == "END") {
        if (section != null) {
          rings += Ring(pts.result(), section.startsWith("!"))
          section = null
          pts = Vector.newBuilder[Geometry.Pt]
        }
      } else if (line.nonEmpty) {
        if (section == null) section = line
        else {
          val parts = line.split("\\s+").filter(_.nonEmpty)
          // .poly order is lon lat
          pts += Geometry.Pt(parts(1).toDouble, parts(0).toDouble)
        }
      }
    }
    Region(name, rings.result())
  }

  def parseFile(path: String): Region = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.getLines(), new java.io.File(path).getName.stripSuffix(".poly"))
    finally src.close()
  }
}
