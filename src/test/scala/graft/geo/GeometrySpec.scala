package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import Geometry.Pt

/** Douglas-Peucker simplification, including the reference's closed-ring
  * `avoidNooses` mode (OsmMapUtils.java:389-405): plain DP on a concave
  * ring can emit a self-intersecting simplified ring; the noose-avoiding
  * variant re-splits any shortcut that crosses the original outline, so
  * its output rings are always simple. Pure row-local Scala — no Spark
  * session needed. */
class GeometrySpec extends AnyFunSuite {

  /** Proper self-intersection among non-adjacent segments of a closed
    * ring given as a point list with first == last (the wrap-adjacent
    * pair (0, m-2) is skipped like any other adjacency). */
  private def selfIntersects(out: Seq[Pt]): Boolean = {
    val m = out.size
    (0 until m - 1).exists { i =>
      (i + 2 until m - 1).exists { j =>
        !(i == 0 && j == m - 2) &&
          Geometry.segmentsIntersect(out(i), out(i + 1), out(j), out(j + 1))
      }
    }
  }

  /** Deterministic star-like closed ring: k spokes at equal angles with
    * seeded pseudo-random radii (first point repeated at the end). */
  private def ring(seed: Int): Seq[Pt] = {
    val rng = new scala.util.Random(seed)
    val k = 8 + rng.nextInt(13)
    val pts = (0 until k).map { t =>
      val ang = 2 * math.Pi * t / k
      val u = rng.nextDouble()
      val r = 0.1 + u * u * 2.0
      Pt(math.rint(r * math.sin(ang) * 1e4) / 1e4,
         math.rint(r * math.cos(ang) * 1e4) / 1e4)
    }
    pts :+ pts.head
  }

  test("plain DP leaves endpoints and epsilon monotonicity") {
    val line = Seq(Pt(0, 0), Pt(0.001, 1), Pt(-0.001, 2), Pt(0, 3))
    val out = Geometry.simplify(line, 0.01)
    assert(out.head == line.head && out.last == line.last)
    assert(out == Seq(line.head, line.last)) // wiggle below epsilon drops
    val keepAll = Geometry.simplify(line, 1e-9)
    assert(keepAll == line) // epsilon below the wiggle keeps everything
  }

  test("avoidNooses=false is the unchanged plain-DP output") {
    val r = ring(123)
    assert(Geometry.simplify(r, 0.3) == Geometry.simplify(r, 0.3, avoidNooses = false))
  }

  test("noose fixture: plain DP self-intersects, avoidNooses does not") {
    // found by seeded search: a 13-point concave ring where the eps=0.8
    // shortcut cuts across the outline
    val r = Seq(
      Pt(0.0, 1.8969), Pt(0.1914, 0.3646), Pt(0.0861, 0.0595),
      Pt(1.4384, 0.1747), Pt(0.1101, -0.0417), Pt(0.5168, -0.5833),
      Pt(0.42, -1.7041), Pt(-0.046, -0.1866), Pt(-0.0761, -0.0859),
      Pt(-0.4205, -0.1595), Pt(-0.2143, 0.026), Pt(-0.5821, 0.4018),
      Pt(-0.0497, 0.0947), Pt(0.0, 1.8969))
    val plain = Geometry.simplify(r, 0.8)
    assert(plain.size > 3 && selfIntersects(plain),
      s"fixture regressed: plain DP output ${plain.size} pts, no crossing")
    val noosed = Geometry.simplify(r, 0.8, avoidNooses = true)
    assert(!selfIntersects(noosed), noosed.toString)
    // the re-split keeps strictly more points than the noosed shortcut
    assert(noosed.size > plain.size)
    // and output is a subset of the input, endpoints preserved
    assert(noosed.forall(r.contains) && noosed.head == r.head && noosed.last == r.last)
  }

  test("property: simplified closed rings never self-intersect with avoidNooses") {
    var plainNooses = 0
    for (seed <- 0 until 400; eps <- Seq(0.1, 0.3, 0.5, 0.8, 1.2)) {
      val r = ring(seed)
      if (!selfIntersects(r)) { // only simple input rings are in scope
        val plain = Geometry.simplify(r, eps)
        if (plain.size > 3 && selfIntersects(plain)) plainNooses += 1
        val out = Geometry.simplify(r, eps, avoidNooses = true)
        assert(!selfIntersects(out), s"seed=$seed eps=$eps: $out")
      }
    }
    // the sweep must actually exercise cases where plain DP nooses,
    // otherwise the property above is vacuous
    assert(plainNooses > 0, "generator no longer produces noose cases")
  }
}
