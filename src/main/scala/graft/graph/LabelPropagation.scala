package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation — community detection over the same
  * edge relations [[PageRank]] ranks: nodes repeatedly adopt the most
  * frequent label among their neighbors (plus their own current label,
  * the standard self-vote that damps the bipartite two-coloring
  * oscillation sync LPA is prone to). Communities group nodes that share
  * neighborhoods — on a customer↔supplier trade graph, market segments.
  *
  * Determinism (oracle hash-compares every row): the argmax is the
  * lexicographic max of (count, −label) — highest vote count, smallest
  * label on ties — computed as ONE `max(struct(...))` aggregation, no
  * window; labels are node ids (integers), so every step is exact and
  * partitioning-independent. A fixed round count is reported rather than
  * convergence detection (LPA's fixed point is not unique; the bounded
  * unrolled form is what an oracle can replay).
  *
  * Scale shape: per round, one join of the label relation against the
  * src-partitioned cached edge relation (edges never re-shuffle), then
  * two map-side-combined aggregations — (node, label) vote counts and
  * the per-node struct-max. Only (node, label) pairs ever move. Vote
  * counts bound at (node, distinct neighbor labels); a hub's votes
  * collapse map-side before the exchange.
  */
object LabelPropagation {

  /** Community labels after `rounds` of synchronous propagation over the
    * directed `edges` (make them bidirectional for the undirected
    * semantics). Returns (node: long, label: long); initial label =
    * node id. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds=$rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().repartition(col("node")).persist()

    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val votes = e.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels) // self-vote
        .groupBy("node", "label").agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    }
    labels
  }
}
