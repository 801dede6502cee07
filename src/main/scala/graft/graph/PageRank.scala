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
            dampingPct: Int = 85): DataFrame = {
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
    // all endpoints: sinks (no out-edges) still hold rank mass
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().repartition(col("node")).persist()

    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iterations) {
      val inSums = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(inSums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$dampingPct * coalesce(in_sum, 0L) div 100"))
            .as("rank"))
    }
    ranks
  }
}
