package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Brute-force cosine top-k as the exact baseline; a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale notes (100 TB): the query set is broadcast (it is small by
  * definition); candidate scoring is map-side; only (query_id, candidate,
  * rounded score) rows shuffle into the per-query top-k window. The LSH
  * variant additionally prunes candidates to same-bucket rows so the scan
  * side never fans out by |queries|.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * a deterministic left-to-right fold. Native codegen expression
    * (graft.functions.CosineSim) — callers must have it registered; every
    * entry point in this object registers it on its input's session. */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Exact top-k by cosine: for each row of `queries`, the k nearest rows
    * of `corpus` (excluding the query row itself when ids collide).
    * Ranking uses the score rounded to 6 decimals with id tie-break, so
    * results are reproducible across engines and partitionings. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random unit-ish component for hyperplane j,
    * dimension i (splitmix64 finalizer → [-1, 1)). */
  def planeComponent(j: Int, i: Int): Double = {
    var z = (j.toLong << 32 | (i.toLong & 0xffffffffL)) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Random-hyperplane signature: bit j = sign(v · plane_j). */
  def rhSignature(vec: Seq[Float], numPlanes: Int): Int = {
    var sig = 0
    var j = 0
    while (j < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i) * planeComponent(j, i); i += 1 }
      if (dot >= 0) sig |= (1 << j)
      j += 1
    }
    sig
  }

  /** LSH-bucketed ANN top-k: corpus and queries are hashed into 2^numPlanes
    * buckets; scoring happens only within a query's bucket (plus buckets at
    * Hamming distance 1, to cut the miss rate at plane boundaries). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, numPlanes: Int): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    val sigUdf = udf((v: Seq[Float]) => rhSignature(v, numPlanes))
    val probeUdf = udf((sig: Int) => sig +: (0 until numPlanes).map(j => sig ^ (1 << j)))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      sigUdf(col(vecCol)).as("bucket"))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
          explode(probeUdf(sigUdf(col(vecCol)))).as("bucket")))
    val scored = c.join(q, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all corpus pairs with
    * cosine >= minSim, LSH-bucketed so only same-bucket pairs are scored.
    * Exact within a bucket; the all-pairs oracle form is only run at test
    * scale. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         minSim: Double, numPlanes: Int): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    val sigUdf = udf((v: Seq[Float]) => rhSignature(v, numPlanes))
    val expandUdf = udf((sig: Int) => sig +: (0 until numPlanes).map(j => sig ^ (1 << j)))
    val g = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sigUdf(col(vecCol)).as("sig"))
    val probe = g.select(col("id").as("a_id"), col("vec").as("a_vec"),
      explode(expandUdf(col("sig"))).as("bucket"))
    val build = g.select(col("id").as("b_id"), col("vec").as("b_vec"),
      col("sig").as("bucket"))
    probe.join(build, "bucket")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("a_vec"), col("b_vec")), 6).as("sim"))
      .where(col("sim") >= minSim)
      .distinct()
  }
}
