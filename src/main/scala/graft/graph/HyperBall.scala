package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi–Vigna 2013) — the neighborhood function at graph
  * scale: per node, the (approximate) number of nodes within ≤ r hops,
  * for every radius r up to a bound. The classic inputs to effective-
  * diameter / closeness analyses ("In-Core Computation of Geometric
  * Centralities with HyperBall"), and at corpus scale the spam-mass /
  * link-farm signal (a farm's ball explodes at small r).
  *
  * The original keeps an HLL counter per node; this implementation keeps
  * the repo's KMV bottom-k sketch ([[graft.pipeline.Sketches]]) instead —
  * same mergeable-sketch recurrence and O(k) state per node, but the
  * sketch is a set of PORTABLE integer hashes, so a SQL oracle replays
  * the rounds bit-for-bit and the estimates are exact-checkable (the
  * datasketches HLL register layout is not).
  *
  *   ball_0(v)   = {h(v)}
  *   ball_r(v)   = bottomK( ball_{r-1}(v) ∪ ⋃_{(u,v)∈E} ball_{r-1}(u) )
  *
  * Scale shape (100 TB of edges): edges hash-partition by `src` once and
  * persist; per round ONE shuffled-hash join ships each node's sketch
  * ARRAY (≤ k hashes) to its out-neighbors — never ball SETS — and ONE
  * aggregation rebuilds the bottom-k: `slice(array_sort(collect_set), 1,
  * k)`, whose partial (map-side) collect_set collapses the duplicate-
  * heavy join fan-out BEFORE the exchange. Round 12 shape: this replaces
  * the former distinct → window(row_number ≤ k) → per-round estimate
  * chain — two extra exchanges and a per-round sort over the full
  * distinct ball volume — with estimates now read directly off the
  * sorted array (`msz` = size, θ = last element), exact `msz` when the
  * ball fit in the sketch, (k−1)·M div θ otherwise — float-free, and
  * the hint-forced shuffled-hash join stops sort-merge from re-sorting
  * the persisted edge relation every round.
  */
object HyperBall {

  private val M = 1000000007L

  /** Ball-size estimates for r = 0..rounds over the directed `edges`.
    * Returns (node, r, msz, ball_est): `msz` the sketch occupancy,
    * `ball_est` exact when msz < k, the KMV estimate otherwise. */
  def neighborhood(edges: DataFrame, srcCol: String, dstCol: String,
                   rounds: Int, k: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds=$rounds")
    require(k >= 2, s"k=$k")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .persist()
    // node-id hash: affine + one quadratic mixing round mod M (the
    // Projection.signComponent discipline — an affine map alone of
    // consecutive ids is a Weyl sequence, not KMV-uniform)
    val a = pmod(col("node"), lit(M))
    val h = pmod(a * lit(2654435761L) + lit(987654321L), lit(M))
    val ih = pmod(h * h + h * lit(1103515245L) + lit(12345L), lit(M))
    // seed src ∪ dst (the Hits.hits node set): a dst-only sink gets its
    // own r=0 singleton ball like every other node — src-only seeding
    // would drop it from ball_0 and exclude it from its own ball at
    // every radius, contradicting the ball_0(v) = {h(v)} recurrence
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // state: one row per node carrying the SORTED bottom-k hash array —
    // estimates are projections of it (no per-round estimate aggregate),
    // and the next round explodes it back to (node, hash) contributions
    var sketch = nodes.select(col("node"), array(ih).as("arr")).persist()
    val est = (r: Int, s: DataFrame) =>
      s.select(col("node"), lit(r).as("r"),
        size(col("arr")).cast("long").as("msz"),
        when(size(col("arr")) < k, size(col("arr")).cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * M} div element_at(arr, -1)"))
          .as("ball_est"))
    var out = est(0, sketch)
    for (r <- 1 to rounds) {
      // one aggregation rebuilds the bottom-k: the partial (map-side)
      // collect_set collapses the duplicate-heavy join fan-out BEFORE the
      // exchange (neighbors share ball members), exactly like the former
      // distinct's partial aggregate — but the sort + k-cut now happen
      // inside the same aggregate's result expression, where the former
      // chain paid a second exchange for distinct's (node, ih) keying, a
      // third for the window, and a per-round sort of the full distinct
      // ball volume. The shuffle_hash hint keeps the persisted edge
      // relation from being re-sorted every round (sort-merge default).
      val next = e.join(
          sketch.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), explode(col("arr")).as("ih"))
        .unionByName(sketch.select(col("node"), explode(col("arr")).as("ih")))
        .groupBy("node")
        .agg(slice(array_sort(collect_set(col("ih"))), 1, k).as("arr"))
        // localCheckpoint, not persist: round r+1 references sketch_r
        // twice (edge join + self union) and every round's estimate row
        // references its sketch again — un-truncated, the analyzed plan
        // (stringified per AQE event) grows ~2^rounds (the p49 lesson,
        // milder exponent)
        .localCheckpoint()
      sketch = next
      out = out.unionByName(est(r, sketch))
    }
    out
  }
}
