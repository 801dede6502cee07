package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * persist; per round ONE co-partitioned join ships (node, hash) sketch
  * rows — ≤ k per node, never ball SETS — a map-side-combinable
  * distinct, and the bottom-k cut via `row_number ≤ k` (SPARK-37099
  * plans a Partial WindowGroupLimit below the exchange, so a hub
  * forwards ≤ k rows per input partition). Estimates read off each
  * round's sketch with the [[graft.pipeline.Sketches.kmvIntersect]]
  * integer estimator: exact `msz` when the ball fit in the sketch,
  * (k−1)·M div θ otherwise — float-free.
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
    var sketch = nodes.select(col("node"), ih.as("ih")).persist()
    val w = Window.partitionBy("node").orderBy("ih")
    val est = (r: Int, s: DataFrame) => s.groupBy("node")
      .agg(count(lit(1)).as("msz"), max("ih").as("theta"))
      .select(col("node"), lit(r).as("r"), col("msz"),
        when(col("msz") < k, col("msz"))
          .otherwise(expr(s"${(k - 1).toLong * M} div theta")).as("ball_est"))
    var out = est(0, sketch)
    for (r <- 1 to rounds) {
      // distinct BEFORE the window on purpose: the raw join output is
      // duplicate-heavy (neighbors share ball members), and distinct's
      // map-side partial aggregation collapses those duplicates BEFORE
      // its exchange. The tempting fusion — repartition(node) + a
      // partition-local dedup feeding the window on one exchange — ships
      // every duplicate raw and benched slower; at 100 TB the pre-shuffle
      // combine is the difference between shipping O(distinct) and
      // O(edge-fanout) rows
      val next = e.join(sketch.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("ih"))
        .unionByName(sketch)
        .distinct()
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
        .select("node", "ih")
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
