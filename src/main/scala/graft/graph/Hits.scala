package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) — hubs and authorities by mutual reinforcement:
  * a node is a good AUTHORITY when good hubs point at it, a good HUB
  * when it points at good authorities. The directional companion to
  * PageRank ([[PageRank]]): on a trade graph it separates "many buyers
  * trust this supplier" (authority) from "this buyer samples many good
  * suppliers" (hub) — two signals PageRank's single score conflates.
  *
  * Fixed-point integer recurrence (the p46 discipline): scores live on a
  * 2²⁰ grid, each half-round is one edge join + integer-sum aggregate,
  * and normalization divides by the round's max score with integer
  * division — every value is a pure function of the data, independent of
  * partitioning and engine. Max intermediate: 2²⁰·maxdeg·2²⁰ ≪ 2⁶³.
  *
  * Scale shape: edges partition once and persist; per half-round only
  * (node, score) longs move; the normalizing max is a broadcast scalar.
  */
object Hits {

  /** `rounds` full hub↔authority iterations over the directed `edges`.
    * Returns (node, authority, hub) in float units, rounded to 6. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds=$rounds")
    val one = 1048576L
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    def normalize(raw: DataFrame, c: String): DataFrame = {
      val full = nodes.join(raw, Seq("node"), "left")
        .select(col("node"), coalesce(col(c), lit(0L)).as("raw"))
      val m = full.agg(max("raw").as("m"))
      full.crossJoin(broadcast(m))
        .select(col("node"), expr(s"raw * $one div m").as(c))
    }
    var h = nodes.select(col("node"), lit(one).as("h"))
    var a = nodes.select(col("node"), lit(0L).as("a"))
    for (_ <- 1 to rounds) {
      a = normalize(
        e.join(h.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum("h").as("a")), "a")
        .persist()
      h = normalize(
        e.join(a.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node")).agg(sum("a").as("h")), "h")
        .persist()
    }
    nodes.join(a, "node").join(h, "node")
      .select(col("node"),
        round(col("a").cast("double") / one, 6).as("authority"),
        round(col("h").cast("double") / one, 6).as("hub"))
  }
}
