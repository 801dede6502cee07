package graft.geo

/** Latitude-adaptive (lat-band, lon-band) bucketing for radius joins.
  *
  * Replaces the earlier (20° OLC cell, lat band) key, which had two
  * scale/correctness defects: the cell ring stopped covering the radius
  * longitudinally above |lat| ≈ 85° (silently dropping polar pairs), and
  * the key's longitude extent was a whole 20° cell, so co-latitude dense
  * data (a coastal metro line, gridded rasters) piled into single keys
  * quadratically.
  *
  * Scheme: the globe is cut into latitude bands of height `bandDeg(r)` and,
  * per band, `lonBandCount` equal-width longitude bands covering the full
  * circle. The lon band count shrinks with cos(lat) — at the poles it
  * reaches 1 (the whole circle is one band), which keeps the key EXACT at
  * any latitude: where longitude stops discriminating, the scheme degrades
  * to the pure lat band instead of dropping pairs. A build row keys on its
  * own (band, lonIdx) packed into one long; a probe row owns ≤ 9 keys (3
  * lat bands × 3 wrapped lon indices, deduplicated).
  *
  * Coverage proof (d = haversine distance on radius [[EarthRadiusM]]):
  *  - lat: d < r ⇒ Δφ ≤ r/111,220 m/° < bandDeg = r/111,000 ⇒ the two
  *    floor-band indices differ by at most 1.
  *  - lon: sin²(d/2R) = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2) ⇒
  *    sin(Δλ/2) ≤ sin(r/2R)/cos(φcap) for any φcap ≥ max(|φ₁|,|φ₂|).
  *    `lonBandCount(b)` uses φcap = the max |lat| reachable in bands
  *    b-1..b+1 (where the probe row of any pair whose build row is in b
  *    must lie), so one lon band is at least the max wrapped Δλ of a
  *    qualifying pair ⇒ wrapped indices differ by at most 1 mod n.
  * Hence for every pair with d < r the build key is among the probe keys —
  * at all latitudes, across the antimeridian, for any radius ≥ [[MinRadiusM]].
  *
  * Reference semantics served: the 150 m / 100 m proximity groupings of
  * OprHistoryChangesProvider.java:185-209 and MergePlaceBot.java:169-182,
  * generalized to any radius.
  */
object GeoBands {

  val EarthRadiusM: Double = GeoFunctions.EarthRadiusKm * 1000.0

  /** Lower radius bound so both packed fields fit their bit budgets:
    * |latBand| < 2^30 and lonIdx < 2^33 hold for r ≥ 1 cm. */
  val MinRadiusM = 0.01

  private val PackShift = 33

  /** Latitude band height in degrees; ≥ the true Δlat bound r/111,220 m/°. */
  def bandDeg(radiusM: Double): Double = radiusM / 111000.0

  def latBand(lat: Double, radiusM: Double): Long =
    math.floor(lat / bandDeg(radiusM)).toLong

  /** Longitude bands for lat band `band`: the largest n such that one band
    * of width 360/n covers the max wrapped Δλ of a qualifying pair whose
    * build row lies in `band` (probe row within ±1 band). 1 near the poles
    * (longitude no longer discriminates — lat-band-only there is exact and
    * cheap: polar caps hold negligible data). */
  def lonBandCount(band: Long, radiusM: Double): Long = {
    val bd = bandDeg(radiusM)
    val phiCap = math.min(90.0,
      math.max(math.abs((band - 1) * bd), math.abs((band + 2) * bd)))
    val s = math.sin(math.min(radiusM / (2.0 * EarthRadiusM), math.Pi / 2.0))
    val cosCap = math.cos(math.toRadians(phiCap))
    if (cosCap <= s) 1L
    else {
      // 1e-9 relative inflation: the coverage argument is strict in real
      // arithmetic; this absorbs double rounding at band boundaries
      val wDeg = math.toDegrees(2.0 * math.asin(s / cosCap)) * (1.0 + 1e-9)
      math.max(1L, math.floor(360.0 / wDeg).toLong)
    }
  }

  /** Wrapped longitude band index in [0, n). */
  def lonIdx(lon: Double, n: Long): Long = {
    val x = (((lon + 180.0) % 360.0) + 360.0) % 360.0 // [0, 360)
    math.min((x * n / 360.0).toLong, n - 1) // min guards the x→360 ulp edge
  }

  private def pack(band: Long, idx: Long): Long = (band << PackShift) + idx

  /** Single build-side key. */
  def buildKey(lat: Double, lon: Double, radiusM: Double): Long = {
    val b = latBand(lat, radiusM)
    pack(b, lonIdx(lon, lonBandCount(b, radiusM)))
  }

  /** Probe-side key set: ≤ 9 distinct keys (3 lat bands × 3 wrapped lon
    * indices). Contains `buildKey(lat2, lon2, r)` for every (lat2, lon2)
    * within r meters. */
  def probeKeys(lat: Double, lon: Double, radiusM: Double): Array[Long] = {
    val out = new Array[Long](9)
    var m = 0
    val b0 = latBand(lat, radiusM)
    var b = b0 - 1
    while (b <= b0 + 1) {
      val n = lonBandCount(b, radiusM)
      val j = lonIdx(lon, n)
      var d = -1
      while (d <= 1) {
        val k = pack(b, (((j + d) % n) + n) % n)
        var dup = false
        var i = 0
        while (i < m) { if (out(i) == k) dup = true; i += 1 }
        if (!dup) { out(m) = k; m += 1 }
        d += 1
      }
      b += 1
    }
    java.util.Arrays.copyOf(out, m)
  }
}
