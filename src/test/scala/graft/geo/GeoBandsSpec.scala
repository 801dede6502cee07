package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Pins the exactness and boundedness of the latitude-adaptive band keys
  * that every radius join buckets on: (1) coverage — any pair within the
  * radius shares a key, at all latitudes and across the antimeridian;
  * (2) skew — a key's longitude extent tracks the radius, so co-latitude
  * dense data does not collapse into single quadratic buckets.
  */
class GeoBandsSpec extends AnyFunSuite {

  private def covered(lat1: Double, lon1: Double,
                      lat2: Double, lon2: Double, r: Double): Boolean =
    GeoBands.probeKeys(lat1, lon1, r).contains(GeoBands.buildKey(lat2, lon2, r))

  test("random qualifying pairs share a key, both probe directions") {
    val rnd = new scala.util.Random(42)
    val radii = Seq(0.5, 150.0, 5000.0, 150000.0)
    var checked = 0
    for (_ <- 0 until 20000) {
      val r = radii(rnd.nextInt(radii.length))
      // anchor anywhere; mate displaced by up to ~1.2r in a random direction
      val lat1 = rnd.nextDouble() * 180.0 - 90.0
      val lon1 = rnd.nextDouble() * 360.0 - 180.0
      val dDeg = r / 111000.0 * 1.2
      val lat2 = math.min(90.0, math.max(-90.0,
        lat1 + (rnd.nextDouble() * 2 - 1) * dDeg))
      val cosL = math.max(math.cos(math.toRadians(lat1)), 1e-6)
      val lon2raw = lon1 + (rnd.nextDouble() * 2 - 1) * dDeg / cosL
      val lon2 = (((lon2raw + 180.0) % 360.0) + 360.0) % 360.0 - 180.0
      if (GeoFunctions.haversineMScalar(lat1, lon1, lat2, lon2) < r) {
        checked += 1
        assert(covered(lat1, lon1, lat2, lon2, r),
          s"probe($lat1,$lon1) misses build($lat2,$lon2) at r=$r")
        assert(covered(lat2, lon2, lat1, lon1, r),
          s"probe($lat2,$lon2) misses build($lat1,$lon1) at r=$r")
      }
    }
    assert(checked > 5000, s"only $checked in-radius samples — generator broken")
  }

  test("polar pairs the old OLC-ring key dropped are covered") {
    // lat 89.5, 50° of longitude apart ≈ 48 km — the advisory's example
    assert(GeoFunctions.haversineMScalar(89.5, -120.0, 89.5, -70.0) < 150000.0)
    assert(covered(89.5, -120.0, 89.5, -70.0, 150000.0))
    // lat 86: a 20° cell spans ~155 km < the 190 km policy radius
    assert(covered(86.0, -40.0, 86.1, -12.0, 190000.0))
    // pole itself, any longitudes
    assert(covered(90.0, 13.0, 89.999, -178.0, 1000.0))
    assert(covered(-89.9999, 0.0, -90.0, 179.0, 500.0))
  }

  test("antimeridian pairs are covered") {
    assert(covered(10.0, 179.9999, 10.0, -179.9999, 150.0))
    assert(covered(-45.0, 179.999, -45.001, -179.999, 500.0))
  }

  test("lon bands subdivide a co-latitude strip; count degrades to 1 at poles") {
    // equator, 150 m radius: a 150 m lat strip must be cut into many lon
    // bands (the old key left it 20° wide — quadratic on a metro line)
    val nEq = GeoBands.lonBandCount(0L, 150.0)
    assert(nEq > 100000L, s"equator lon-band count $nEq too coarse")
    // band width ~= the radius at the equator (within a small factor)
    val wM = 360.0 / nEq * 111320.0
    assert(wM < 150.0 * 3 && wM >= 150.0 / 111320.0,
      s"equator lon band width $wM m not radius-sized")
    // at the pole the count must degrade to exactly 1 (lat-band-only, exact)
    val polarBand = GeoBands.latBand(89.9999, 150.0)
    assert(GeoBands.lonBandCount(polarBand, 150.0) == 1L)
  }

  test("probe key set is small and distinct") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val ks = GeoBands.probeKeys(rnd.nextDouble() * 180 - 90,
        rnd.nextDouble() * 360 - 180, 150.0)
      assert(ks.length <= 9 && ks.distinct.length == ks.length)
    }
  }
}
