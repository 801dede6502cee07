package graft.geo

/** Row-local geometry over point arrays — pure Scala, exposed as UDFs over
  * `array<struct<lat,lon>>`. Each function touches one row's geometry only,
  * so these never influence partitioning or shuffles.
  *
  * Semantics mirror the reference's geometry helpers:
  *   - haversine distance        OsmMapUtils.java:99-110
  *   - weighted way centroid     OsmMapUtils.java:199-290
  *   - point-in-polygon          OsmMapUtils.java:496-524,590-631
  *   - Douglas-Peucker simplify  OsmMapUtils.java:317-427
  *   - polygon area              OsmMapUtils.java:531-587
  *   - clockwise winding         OsmMapUtils.java:429-493
  */
object Geometry {

  final case class Pt(lat: Double, lon: Double)

  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.pow(math.sin(dLon / 2), 2) * math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2))
    2 * GeoFunctions.EarthRadiusKm * 1000.0 * math.asin(math.sqrt(a))
  }

  /** Mean centroid of a point list (node-average center). */
  def centroid(pts: Seq[Pt]): Option[Pt] =
    if (pts.isEmpty) None
    else Some(Pt(pts.map(_.lat).sum / pts.size, pts.map(_.lon).sum / pts.size))

  /** Length-weighted centroid for closed ways: each segment's midpoint
    * weighted by its length (reference: OsmMapUtils.java:262-290). */
  def weightedCentroid(pts: Seq[Pt]): Option[Pt] = {
    if (pts.isEmpty) return None
    if (pts.size == 1) return Some(pts.head)
    var sumLat = 0.0; var sumLon = 0.0; var sumW = 0.0
    var i = 0
    while (i < pts.size - 1) {
      val a = pts(i); val b = pts(i + 1)
      val w = haversineM(a.lat, a.lon, b.lat, b.lon)
      sumLat += (a.lat + b.lat) / 2 * w
      sumLon += (a.lon + b.lon) / 2 * w
      sumW += w
      i += 1
    }
    if (sumW == 0.0) centroid(pts)
    else Some(Pt(sumLat / sumW, sumLon / sumW))
  }

  /** Ray-casting point-in-polygon with implicit closing edge
    * (reference: OsmMapUtils.java:496-524). */
  def pointInPolygon(lat: Double, lon: Double, poly: Seq[Pt]): Boolean = {
    if (poly.size < 3) return false
    var inside = false
    var i = 0
    val n = poly.size
    var j = n - 1 // implicit closing edge poly(n-1) -> poly(0)
    while (i < n) {
      val pi = poly(i); val pj = poly(j)
      val intersects = ((pi.lat > lat) != (pj.lat > lat)) && {
        val t = (lat - pi.lat) / (pj.lat - pi.lat)
        lon < pi.lon + t * (pj.lon - pi.lon)
      }
      if (intersects) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Perpendicular distance from p to segment a-b in local-projected degrees
    * (reference: OsmMapUtils.java:133-174 project/orthogonal distance). */
  private def orthogonalDist(p: Pt, a: Pt, b: Pt): Double = {
    // local equirectangular projection around a (adequate at DP epsilon scale)
    val kx = math.cos(math.toRadians((a.lat + b.lat) / 2))
    val ax = a.lon * kx; val ay = a.lat
    val bx = b.lon * kx; val by = b.lat
    val px = p.lon * kx; val py = p.lat
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    // sqrt(x*x + y*y) rather than hypot: *, +, sqrt are correctly-rounded
    // IEEE ops, so the DuckDB oracle reproduces these bits exactly.
    if (len2 == 0.0) math.sqrt((px - ax) * (px - ax) + (py - ay) * (py - ay))
    else {
      val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
      val ex = px - (ax + t * dx); val ey = py - (ay + t * dy)
      math.sqrt(ex * ex + ey * ey)
    }
  }

  /** Douglas-Peucker polyline simplification; epsilon in degrees
    * (reference: OsmMapUtils.java:317-427; tile-space epsilon there, degree
    * epsilon here — callers convert). Preserves endpoints; closed rings keep
    * first == last.
    *
    * With `avoidNooses = true` (the reference's closed-ring mode,
    * OsmMapUtils.java:389-405): before accepting a shortcut segment
    * (pts(lo), pts(hi)) that would drop every interior point, the span is
    * re-split at the farthest interior point whenever the shortcut
    * properly crosses ANY segment of the ORIGINAL polyline. For lo > 0
    * the segments adjacent to / inside the span are skipped via the
    * reference's `i == start-1 → i = end; continue` jump; for lo == 0
    * that jump never fires (faithfully ported: the reference checks
    * in-span and end-adjacent segments too, and the shared-endpoint test
    * can report a phantom crossing there — the only consequence is extra
    * conservative re-splitting, never a wrong ring). Plain DP on a
    * concave ring can emit a self-intersecting ("noosed") ring; the
    * re-split keeps subdividing until the shortcut is crossing-free, so
    * simplified closed rings never self-intersect — `GeometrySpec`
    * property-tests this. */
  def simplify(pts: Seq[Pt], epsilon: Double, avoidNooses: Boolean = false): Seq[Pt] = {
    if (pts.size <= 2) return pts
    val keep = Array.fill(pts.size)(false)
    keep(0) = true; keep(pts.size - 1) = true
    // does the candidate shortcut (pts(lo), pts(hi)) properly cross any
    // original segment outside [lo, hi)? Adjacent/in-span segments are
    // skipped exactly as the reference does (i == lo-1 jumps to hi).
    def crossesOriginal(lo: Int, hi: Int): Boolean = {
      val a = pts(lo); val b = pts(hi)
      var i = 0
      var found = false
      while (i < pts.size - 1 && !found) {
        if (i == lo - 1) i = hi + 1 // reference: `i = end; continue` → i++
        else {
          if (segmentsIntersect(a, b, pts(i), pts(i + 1))) found = true
          i += 1
        }
      }
      found
    }
    def rec(lo: Int, hi: Int): Unit = {
      if (hi <= lo + 1) return
      var maxD = -1.0; var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val d = orthogonalDist(pts(i), pts(lo), pts(hi))
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD > epsilon || (avoidNooses && crossesOriginal(lo, hi))) {
        keep(maxI) = true
        rec(lo, maxI); rec(maxI, hi)
      }
    }
    rec(0, pts.size - 1)
    pts.indices.collect { case i if keep(i) => pts(i) }
  }

  /** Shoelace polygon area in m² via local equirectangular projection
    * (reference: OsmMapUtils.java:531-587 metric variant). */
  def areaM2(poly: Seq[Pt]): Double = {
    if (poly.size < 3) return 0.0
    val latRef = poly.map(_.lat).sum / poly.size
    val mPerDegLat = 111319.49079327358 // pi/180 * R_wgs84_mean
    val mPerDegLon = mPerDegLat * math.cos(math.toRadians(latRef))
    var s = 0.0
    var i = 0
    val n = poly.size
    while (i < n) {
      val a = poly(i); val b = poly((i + 1) % n)
      s += (a.lon * mPerDegLon) * (b.lat * mPerDegLat) -
           (b.lon * mPerDegLon) * (a.lat * mPerDegLat)
      i += 1
    }
    math.abs(s) / 2.0
  }

  /** Signed winding: true when the ring is clockwise (lat up, lon right). */
  def isClockwise(poly: Seq[Pt]): Boolean = {
    var s = 0.0
    var i = 0
    val n = poly.size
    while (i < n) {
      val a = poly(i); val b = poly((i + 1) % n)
      s += (b.lon - a.lon) * (b.lat + a.lat)
      i += 1
    }
    s > 0
  }

  /** Segment orientation / intersection tests (reference: OsmMapUtils.java:307-315). */
  def ccw(a: Pt, b: Pt, c: Pt): Boolean =
    (c.lat - a.lat) * (b.lon - a.lon) > (b.lat - a.lat) * (c.lon - a.lon)

  def segmentsIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean =
    ccw(a, c, d) != ccw(b, c, d) && ccw(a, b, c) != ccw(a, b, d)
}
