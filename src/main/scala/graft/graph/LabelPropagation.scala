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
  * Determinism (oracle hash-compares every row): the argmax — highest
  * vote count, smallest label on ties — is exact integer logic spelled
  * as max-count + equi-join + min-label, three HASH aggregations. (The
  * compact `max(struct(count, -label))` spelling is semantically
  * identical but structs can't hash-aggregate: Spark plans it as
  * partial+final SortAggregate, i.e. two full sorts of the vote relation
  * per round — verified in the plan, rejected.) A fixed round count is
  * reported rather than convergence detection (LPA's fixed point is not
  * unique; the bounded unrolled form is what an oracle can replay).
  *
  * Scale shape: per round, one join of the label relation against the
  * src-partitioned cached edge relation (edges never re-shuffle), then
  * the three map-side-combined hash aggregations; the best-count join is
  * co-partitioned (both sides exit aggregations keyed on `node`). Only
  * (node, label) pairs ever move; a hub's votes collapse map-side before
  * the exchange. Per-round `votes`/`labels` persists keep the plan
  * LINEAR in rounds — each round's labels feed two consumers (the
  * neighbor join and the self-vote), which otherwise doubles the lineage
  * every round — and they hold node-bounded relations only.
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
        .persist()
      val best = votes.groupBy("node").agg(max(col("c")).as("c"))
      // localCheckpoint, NOT persist: labels_r is referenced four times
      // by round r+1 (neighbor join + self-vote, each through votes and
      // best), so an un-truncated logical plan grows ~4^rounds. Execution
      // is fine either way (the cache dedups work), but Spark stringifies
      // the ANALYZED plan for every AQE event — measured 120+ s of pure
      // driver generateTreeString at 4 rounds, data-size-independent.
      // Truncating the lineage to a LogicalRDD leaf per round keeps the
      // plan (and its string) constant-size. (p46 PageRank doesn't need
      // this: its rank relation is referenced once per round — linear.)
      labels = votes.join(best, Seq("node", "c"))
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
