package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.functions.{HaversineM, OlcEncodeExpr, OlcRing}

/** Rewrites naive distance joins into tile-bucketed equi-joins.
  *
  * A join whose condition contains the conjunct
  * `haversine_m(aLat, aLon, bLat, bLon) < r` (or `<=`, or the flipped
  * `r > ...`), with one point per side and a positive literal radius,
  * plans as a nested-loop: every left row against every right row. That
  * is the plan shape that works at test SF and is quadratic at 100 TB —
  * exactly the blow-up the reference fought with its hand-rolled quadtree
  * work splitting (OsmSyncBot.java:503-535).
  *
  * This rule turns that join into the shape [[graft.geo.GeoJoins]] builds
  * by hand: the side the stats estimate as smaller is exploded to its 3×3
  * OLC-cell neighbor ring × 3 adjacent latitude bands (27 keys — the 27×
  * amplification belongs on the cheaper side), the other side keeps its
  * single (cell, band), and the join becomes a hash/sort-merge equi-join on
  * those keys with the original haversine predicate kept as the exact
  * post-filter. Coverage argument (same as GeoJoins.pairsWithin):
  * d < r ⇒ Δlat ≤ r/111,000 m/° = one band, and for r ≤ 190 km the
  * neighbor ring of a 20° OLC cell covers the longitude span at any
  * |lat| ≤ 90 — so every qualifying pair shares at least one synthesized
  * key. Each right row carries exactly one (cell, band) and the 27 left
  * keys are pairwise distinct, so no duplicate output rows appear.
  * Null coordinates produce a null cell key and drop out of the
  * equi-join — identical to the original condition, where a null
  * haversine comparison is not true.
  *
  * Scope: Inner/Cross joins with deterministic point expressions whose
  * condition has NO equi-join conjunct — the joins that would otherwise
  * plan as nested loops. A join that already has an equality key (a
  * hand-bucketed GeoJoins plan, or `a.country = b.country AND
  * haversine < r`) already hash-partitions; re-exploding it would only
  * add work. The radius must be foldable and ≤
  * [[graft.geo.GeoJoins.MaxRadiusM]]; larger radii keep the nested-loop
  * plan (correct, and a 190 km+ radius join is closer to a cross join
  * anyway). Fires once per join — the synthesized `__graft_geo_*` keys
  * in the rewritten condition are themselves equi-conjuncts, so the
  * guard also holds across fixed-point optimizer iterations.
  */
object HaversineJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val Prefix = "__graft_geo_"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner | Cross, Some(cond), _)
        if j.resolved && !splitConjunctivePredicates(cond).exists(isEquiKey(j, _)) =>
      splitConjunctivePredicates(cond).iterator
        .map(matchRadiusConjunct(j, _)).collectFirst { case Some(m) => m }
        .fold(j: LogicalPlan)(rewrite(j, _))
  }

  /** True when `c` is an equality the planner can hash-join on (one side
    * per input). Such a join never nested-loops, so the rewrite would only
    * add explode work — and a rewritten join's own cell/band equalities
    * match here, making the rule a no-op on its own output. */
  private def isEquiKey(j: Join, c: Expression): Boolean = {
    def splits(l: Expression, r: Expression) =
      l.references.nonEmpty && r.references.nonEmpty &&
        ((l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
         (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet)))
    c match {
      case EqualTo(l, r)       => splits(l, r)
      case EqualNullSafe(l, r) => splits(l, r)
      case _                   => false
    }
  }

  /** (left lat/lon, right lat/lon, radius m) if `e` is a qualifying
    * distance conjunct of join `j`. */
  private case class RadiusMatch(latL: Expression, lonL: Expression,
                                 latR: Expression, lonR: Expression,
                                 radiusM: Double)

  private def matchRadiusConjunct(j: Join, e: Expression): Option[RadiusMatch] = {
    def radius(r: Expression): Option[Double] =
      if (r.foldable && r.dataType == DoubleType)
        Option(r.eval()).map(_.asInstanceOf[Double])
          .filter(d => d > 0 && d <= graft.geo.GeoJoins.MaxRadiusM)
      else None
    val hit = e match {
      case LessThan(h: HaversineM, r)           => radius(r).map((h, _))
      case LessThanOrEqual(h: HaversineM, r)    => radius(r).map((h, _))
      case GreaterThan(r, h: HaversineM)        => radius(r).map((h, _))
      case GreaterThanOrEqual(r, h: HaversineM) => radius(r).map((h, _))
      case _                                    => None
    }
    hit.flatMap { case (h, r) =>
      def from(side: LogicalPlan)(x: Expression) =
        x.deterministic && x.references.nonEmpty &&
          x.references.subsetOf(side.outputSet)
      val (fromL, fromR) = (from(j.left) _, from(j.right) _)
      if (fromL(h.first) && fromL(h.second) && fromR(h.third) && fromR(h.fourth))
        Some(RadiusMatch(h.first, h.second, h.third, h.fourth, r))
      else if (fromR(h.first) && fromR(h.second) && fromL(h.third) && fromL(h.fourth))
        Some(RadiusMatch(h.third, h.fourth, h.first, h.second, r))
      else None
    }
  }

  private def rewrite(j: Join, m: RadiusMatch): LogicalPlan = {
    val bandDeg = m.radiusM / 111000.0 // ≥ true Δlat bound r/111,221 — safe
    def cellOf(lat: Expression, lon: Expression) =
      OlcEncodeExpr(Cast(lat, DoubleType), Cast(lon, DoubleType), Literal(2))
    def bandOf(lat: Expression) =
      Floor(Divide(Cast(lat, DoubleType), Literal(bandDeg)))

    // Explode the side the stats estimate as SMALLER: the ring × band
    // explode is a 27× row amplification, and 27×|small| beats 27×|big| —
    // at cluster scale exploding a 100 TB probe against a 1 GB build would
    // be the wrong plan by five orders of magnitude. Coverage is symmetric
    // (if |a.band - b.band| ≤ 1 then b's window contains a's home band and
    // vice versa), so correctness doesn't depend on the choice. Ties (or
    // missing stats, which surface as equal defaults) explode the left,
    // matching the hand-built GeoJoins shape.
    val explodeLeft = j.left.stats.sizeInBytes <= j.right.stats.sizeInBytes
    val (probe, probeLat, probeLon) =
      if (explodeLeft) (j.left, m.latL, m.lonL) else (j.right, m.latR, m.lonR)
    val (build, buildLat, buildLon) =
      if (explodeLeft) (j.right, m.latR, m.lonR) else (j.left, m.latL, m.lonL)

    // probe: project the home cell/band, explode ring × band window
    val cell0 = Alias(cellOf(probeLat, probeLon), Prefix + "cell0")()
    val band0 = Alias(bandOf(probeLat), Prefix + "band0")()
    val projP = Project(probe.output :+ cell0 :+ band0, probe)

    val ringGen = Explode(OlcRing(cell0.toAttribute))
    val cellA = attrFor(ringGen, Prefix + "cell")
    // cell0 is consumed by the generator; don't carry it further
    val genCell = Generate(ringGen,
      Seq(projP.output.indexWhere(_.exprId == cell0.exprId)),
      outer = false, None, Seq(cellA), projP)

    val b0 = band0.toAttribute
    val bandGen = Explode(CreateArray(Seq(
      Subtract(b0, Literal(1L)), b0, Add(b0, Literal(1L)))))
    val bandA = attrFor(bandGen, Prefix + "band")
    val genBand = Generate(bandGen,
      Seq(genCell.output.indexWhere(_.exprId == band0.exprId)),
      outer = false, None, Seq(bandA), genCell)

    // build: single home key per row
    val cellB = Alias(cellOf(buildLat, buildLon), Prefix + "cellR")()
    val bandB = Alias(bandOf(buildLat), Prefix + "bandR")()
    val projB = Project(build.output :+ cellB :+ bandB, build)

    // equi keys in front (ExtractEquiJoinKeys finds them), original
    // condition — including the haversine conjunct — kept verbatim
    val newCond = And(And(EqualTo(cellA, cellB.toAttribute),
      EqualTo(bandA, bandB.toAttribute)), j.condition.get)
    val (newL, newR) = if (explodeLeft) (genBand, projB) else (projB, genBand)
    Project(j.output, Join(newL, newR, Inner, Some(newCond), j.hint))
  }

  /** Generator-output attribute with the generator's element type and
    * nullability (Generate requires an exact match). */
  private def attrFor(g: Explode, name: String): AttributeReference = {
    val f = g.elementSchema.head
    AttributeReference(name, f.dataType, f.nullable)()
  }

  /** Idempotently add the rule to a session that wasn't built with
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(HaversineJoinRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HaversineJoinRule
    }
  }
}
