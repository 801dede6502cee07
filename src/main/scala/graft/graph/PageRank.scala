package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point distributed PageRank — the domain/page centrality ranking
  * web-corpus curation pipelines use to pick what to crawl and keep
  * (CommonCrawl publishes exactly this ranking; the RefinedWeb/CCNet
  * lineage filters by it). Spark-first shape: the edge relation is the
  * only corpus-scale artifact, it is hash-partitioned by `src` ONCE and
  * cached, and every iteration shuffles only the (node, rank) pairs —
  * the classic "partition the links, ship the ranks" PageRank layout.
  *
  * Determinism (the driver's oracle hash-compares every value): ranks are
  * scaled integers (`2^scaleBits` = 1.0) and every step is integer
  * arithmetic — `rank div outdeg` per edge, `base + damping·Σ div 100`
  * per node — so the result is independent of partitioning and summation
  * order, and DuckDB reproduces it bit-for-bit with `//`. Overflow bound:
  * the total rank mass ≈ N·2^scaleBits is conserved across iterations
  * (damping redistributes, never creates), so `dampingPct · Σcontrib`
  * stays below 2^63 for N up to ~8·10^13 nodes at the default
  * scaleBits=20 — wide enough for a full web graph; raise precision only
  * with a correspondingly smaller node bound.
  *
  * Scale shape (100 TB): one shuffle to build (src, dst, outdeg), then
  * per iteration one co-partitioned join (edges side pre-partitioned, no
  * re-shuffle) + one aggregation keyed by dst with map-side combine — the
  * sum per node collapses before the exchange, so hub in-degree never
  * concentrates rows on one task. Lineage depth grows linearly with
  * `iterations` (each plan references the cached edges + previous ranks),
  * fine for the bounded iteration counts centrality ranking uses.
  */
object PageRank {

  /** Ranks after `iterations` rounds over the directed `edges`
    * (multi-edges act as weights; pre-`distinct` for a simple graph).
    * Returns (node: long, rank: long) with rank in 2^scaleBits units;
    * every node appearing as src or dst is ranked (dangling nodes keep
    * receiving the teleport base). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int, scaleBits: Int = 20,
            dampingPct: Int = 85): DataFrame =
    ranksImpl(edges, srcCol, dstCol, None, iterations, scaleBits, dampingPct)

  /** Personalized PageRank / TrustRank (Gyöngyi, Garcia-Molina & Pedersen
    * 2004): identical recurrence, but ALL teleport mass returns to the
    * `sources` seed set instead of spreading uniformly — initial rank and
    * the per-round base term are nonzero only for seeds. The result
    * measures closeness-to-trusted-seeds rather than global centrality:
    * the spam-demotion / seed-expansion ranking of web-corpus curation
    * (the weighted companion of [[Bfs]]'s hard hop cut). Same integer
    * determinism and partition-once scale shape as [[ranks]]; seeds
    * absent from the graph are ignored (they have no edges to push mass
    * through). Returns (node, rank) over the same node set as [[ranks]],
    * zero-rank nodes included — reachability is the caller's signal. */
  def personalizedRanks(edges: DataFrame, srcCol: String, dstCol: String,
                        sources: DataFrame, sourceCol: String,
                        iterations: Int, scaleBits: Int = 20,
                        dampingPct: Int = 85): DataFrame = {
    val seeds = sources.select(col(sourceCol).cast("long").as("node")).distinct()
    ranksImpl(edges, srcCol, dstCol, Some(seeds), iterations, scaleBits, dampingPct)
  }

  private def ranksImpl(edges: DataFrame, srcCol: String, dstCol: String,
                        seeds: Option[DataFrame], iterations: Int,
                        scaleBits: Int, dampingPct: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50, s"iterations=$iterations")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct=$dampingPct")
    val scale = 1L << scaleBits
    val base = scale * (100 - dampingPct) / 100

    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // (src, dst, outdeg), partitioned by the join key once — the
    // iteration joins reuse this layout so only ranks move per round
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src"))
      .persist()
    // all endpoints: sinks (no out-edges) still hold rank mass; in the
    // personalized form each node carries its seed flag (broadcast-joined
    // once — the seed relation is a curation artifact, tiny by design)
    val nodes0 = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val nodes = seeds match {
      case Some(sd) => nodes0
        .join(broadcast(sd.withColumn("is_seed", lit(true))), Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
        .repartition(col("node")).persist()
      case None => nodes0.withColumn("is_seed", lit(true))
        .repartition(col("node")).persist()
    }
    // uniform: every node starts at 1.0 and receives the teleport base;
    // personalized: only seeds do
    val init = if (seeds.isDefined) when(col("is_seed"), scale).otherwise(0L)
      else lit(scale)
    val baseTerm = if (seeds.isDefined) when(col("is_seed"), base).otherwise(0L)
      else lit(base)

    var ranks = nodes.select(col("node"), init.as("rank"))
    for (_ <- 1 to iterations) {
      val inSums = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(inSums, Seq("node"), "left")
        .select(col("node"),
          (baseTerm + expr(s"$dampingPct * coalesce(in_sum, 0L) div 100"))
            .as("rank"))
    }
    ranks
  }
}
