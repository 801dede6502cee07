package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction scores — the "which pairs are probably related"
  * primitive behind related-place suggestion, graph densification for
  * dedup candidate generation, and spam-ring discovery. Adamic–Adar
  * (2003) weights each common neighbor z by 1/ln(deg z): sharing a rare
  * neighbor is strong evidence, sharing a hub is weak.
  */
object LinkPrediction {

  /** Adamic–Adar over common OUT-neighborhood membership: for every
    * pair (a, b) with ≥ `minCommon` common in-neighbors z (i.e. edges
    * z→a and z→b), AA(a,b) = Σ_z 1/ln(deg_z).
    *
    * The weight is FIXED-POINT — w_z = ⌊2²⁰/ln(deg_z)⌋ summed as a
    * long — so the per-pair sum is associative integer math (identical
    * across partitionings and engines); the float division back happens
    * once per output row. Degree-1 hubs contribute no pairs and their
    * ln = 0 never divides (filtered); `maxDeg` is the standard hub cut —
    * a z of degree d contributes d(d−1)/2 candidate pairs, so one
    * celebrity node would otherwise dominate the pair volume (and its
    * 1/ln weight is near-noise anyway). Dropped hubs are a documented
    * approximation, not a silent one: the cut is part of the operator's
    * contract, mirrored by the oracle.
    *
    * Scale shape: degrees are one map-side-combinable aggregate; pair
    * generation is an equi-join on z (bounded ≤ maxDeg² per z, never a
    * global cross); pair scores hash-aggregate with partial combine. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDeg: Int, minCommon: Int = 2): DataFrame = {
    require(maxDeg >= 2, s"maxDeg=$maxDeg")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ez = e.join(deg, "src")
      .where(col("deg").between(2, maxDeg))
      .select(col("src").as("z"), col("dst").as("nbr"),
        floor(lit(1048576.0) / log(col("deg").cast("double")))
          .cast("long").as("w"))
    val a = ez.select(col("z"), col("nbr").as("a_id"), col("w"))
    val b = ez.select(col("z"), col("nbr").as("b_id"))
    a.join(b, Seq("z"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"), sum("w").as("w_fix"))
      .where(col("common") >= minCommon)
      .select(col("a_id"), col("b_id"), col("common"),
        round(col("w_fix").cast("double") / 1048576.0, 6).as("aa"))
  }
}
