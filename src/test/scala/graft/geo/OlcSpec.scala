package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class OlcSpec extends AnyFunSuite {

  test("encodes the reference fixture's ground-truth tile") {
    // merge/places.json: place id ["8FWV54", ...] with source at
    // (48.1503594, 17.1258664) — id[0] = OLC6(lat, lon) per OsmLocationTool
    assert(Olc.encode(48.1503594, 17.1258664, 6) == "8FWV54")
    // canonical OLC example: Zurich ~ (47.3666, 8.5166) → 8FVC
    assert(Olc.encode(47.3666, 8.5166, 4) == "8FVC")
  }

  test("decode center lies inside the encoded cell; re-encoding is stable") {
    val pts = Gen.zip(Gen.choose(-89.9, 89.9), Gen.choose(-179.9, 179.9))
    (0 until 500).foreach { i =>
      val (lat, lon) = pts.pureApply(Gen.Parameters.default, Seed(7L + i))
      val code = Olc.encode(lat, lon, 6)
      val (cLat, cLon) = Olc.decodeCenter(code)
      assert(Olc.encode(cLat, cLon, 6) == code, s"($lat,$lon) -> $code")
      val (s, w, h, ww) = Olc.decodeArea(code)
      assert(lat >= s && lat < s + h + 1e-9)
      assert(lon >= w && lon < w + ww + 1e-9)
    }
  }

  test("4-char prefix of a 6-char code equals the 4-char encoding (rollup contract)") {
    val pts = Gen.zip(Gen.choose(-89.9, 89.9), Gen.choose(-179.9, 179.9))
    (0 until 200).foreach { i =>
      val (lat, lon) = pts.pureApply(Gen.Parameters.default, Seed(99L + i))
      assert(Olc.encode(lat, lon, 6).take(4) == Olc.encode(lat, lon, 4))
    }
  }

  test("neighbors cover all adjacent cells and handle poles/antimeridian") {
    val n = Olc.neighbors("8FWV54")
    assert(n.size == 8 && n.distinct.size == 8)
    // pole-adjacent cell: fewer neighbors, no crash
    val polar = Olc.encode(89.9, 0.0, 2)
    assert(Olc.neighbors(polar).nonEmpty)
    // antimeridian wrap: all results are valid codes
    Olc.neighbors(Olc.encode(0.0, 179.99, 6)).foreach { c =>
      assert(c.length == 6 && c.forall(Olc.Alphabet.contains(_)))
    }
  }
}
