package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact triangle counting — the local-clustering signal
  * graph-shaped corpus curation uses (link-farm / spam-cluster detection
  * on web graphs ranks by triangle density; the same measure flags
  * template-duplicated doc families in a similarity graph).
  *
  * Spark-first shape is the degree-ordered node-iterator (Suri &
  * Vassilvitskii, WWW 2011): orient every undirected edge from its
  * lower to its higher endpoint in the (degree, id) total order, form
  * wedges only at each edge's LOW endpoint, and close them against the
  * oriented edge set. Every triangle {a,b,c} with a<b<c in that order
  * is emitted exactly once — as the wedge (b,c) at a closed by b→c.
  *
  * Why the orientation matters at 100 TB: wedge volume is
  * Σ outdeg(n)², and orienting toward higher degree bounds every
  * out-degree by O(√m) — a celebrity node with 10^8 undirected
  * neighbors contributes wedges only from edges where it is the LOW
  * endpoint, of which there are at most O(√m). The naive
  * id-ordered enumeration (what the DuckDB oracle runs) puts that
  * node's full neighborhood on one side and is quadratic in hub
  * degree; fine at oracle scale, fatal at web scale.
  *
  * Shuffle ledger: canonical distinct (1), degree agg (1, map-side
  * combined), two broadcast-or-shuffle degree joins, the wedge
  * self-join keyed on the shared low endpoint (co-partitioned — both
  * sides are the same cached relation), and the closing join keyed
  * (b, c). Only (node, node) pairs ever move; no payload.
  *
  * Determinism: counts are exact integers; the set of triangles is
  * orientation-independent, so per-node counts match any correct
  * enumeration (the oracle's id-ordered triple join included).
  */
object Triangles {

  /** Per-node triangle participation counts over the undirected simple
    * graph induced by `edges` (direction and multiplicity ignored;
    * self-loops dropped). Returns (node: long, triangles: long) for
    * nodes in ≥1 triangle. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()

    val deg = e.select(col("u").as("n")).unionByName(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))

    // Orient toward the (deg, id)-larger endpoint; carry the head's rank
    // so the wedge pair (b, c) can be ordered without re-joining degrees.
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("lo"),
        when(lowFirst, col("v")).otherwise(col("u")).as("hi"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("hideg"))
      .repartition(col("lo"))
      .persist()

    // Wedges at the low endpoint: ordered out-neighbor pairs (b, c).
    val wedges = oriented.select(col("lo"), col("hi").as("b"), col("hideg").as("bd"))
      .join(oriented.select(col("lo"), col("hi").as("c"), col("hideg").as("cd")), "lo")
      .where(col("bd") < col("cd") || (col("bd") === col("cd") && col("b") < col("c")))
      .select(col("lo").as("a"), col("b"), col("c"))
    // shuffle_hash on the edge side: sort-merge would sort the WEDGE
    // relation (Σ outdeg² rows — the largest relation in the query) to
    // close triangles; hashing the edge-bounded side streams the wedges
    // unsorted
    val tris = wedges
      .join(oriented.select(col("lo").as("b"), col("hi").as("c"))
        .hint("shuffle_hash"), Seq("b", "c"))

    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
