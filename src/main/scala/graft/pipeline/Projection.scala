package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-sign projection for embedding dimensionality reduction
  * (Achlioptas 2003, "Database-friendly random projections": R_ji ∈
  * {+1, −1} preserves pairwise distances in the Johnson-Lindenstrauss
  * sense with the same guarantees as Gaussian R, at integer cost) — the
  * standard pre-step before clustering / ANN when the embedding width
  * itself is the bottleneck.
  *
  * Distributed shape (100 TB): map-only — no shuffle, no driver artifact
  * at all; the projection matrix is IMPLICIT, each sign generated on the
  * fly from the deterministic integer hash
  * [[PortableHash.planeComponent]] (the same family the LSH hyperplanes
  * use), so every executor — and the DuckDB oracle — derives the
  * identical matrix without ever materializing or broadcasting it.
  *
  * Determinism: input components quantize to fixed-point
  * ([[PortableHash.quantize]]) and the per-output-dimension fold is an
  * exact integer sum; the only float ops are one division by 2^20 and
  * one by sqrt(outDims) — both EXACT when outDims is a power of four
  * (divisor a power of two), which [[project]] requires, making results
  * bit-identical across engines with no rounding slack consumed by the
  * scaling itself.
  */
object Projection {

  private val M = PortableHash.M

  /** Sign for matrix cell (j, i): the multiplicative
    * [[PortableHash.planeComponent]] alone is NOT usable here — over the
    * consecutive inputs j·4096+i it is a Weyl (arithmetic) sequence mod
    * M, so row j+1 is a 4096-step shift of row j and the rows correlate
    * (measured: JL distance ratios spread 0.11–4.9 instead of
    * concentrating; the LSH signatures get away with it because
    * bucketing only needs family-sameness, not row independence). One
    * quadratic mixing round breaks the linearity: a ↦ a² + a·1103515245
    * + 12345 mod M, then threshold at M/2 (same-seed measurement:
    * 0.66–1.53 at k=64). All intermediates < 2.2e18, below 2^63. */
  def signComponent(j: Int, i: Int): Long = {
    val a = ((j.toLong * 4096 + i) * 2654435761L + 987654321L) % M
    val b = (a * a + a * 1103515245L + 12345L) % M
    if (b >= M / 2) 1L else -1L
  }

  /** Distributed Gram matrix — the reduce step of PCA / whitening /
    * linear-probe training: G[i][j] = Σ_rows v_i·v_j over the corpus,
    * upper triangle, as ONE map-side-combinable aggregate. Each row
    * contributes its d(d+1)/2 cell products, but partial aggregation
    * collapses every partition to ≤ d(d+1)/2 rows before the shuffle —
    * the corpus never reshuffles and the matrix is a bounded driver
    * artifact (like the IVF centroids) for the downstream eigensolver,
    * which is deliberately out of engine scope (LAPACK on d×d is a
    * driver-side concern; the DISTRIBUTED part of PCA is exactly this
    * accumulation).
    *
    * Determinism: components quantize to fixed point and products sum
    * as DECIMAL(38,0) (integer addition is associative; a Long sum
    * could wrap at corpus scale — the k-means lesson), then one exact
    * power-of-two division back to float units, rounded. */
  def gramMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val cellsUdf = udf((v: Seq[Float]) => {
      val q = v.map(PortableHash.quantize).toArray
      // The per-cell product q(i)·q(j) is Long arithmetic: a component
      // with |q| > floor(√Long.Max) ≈ 3.037e9 (|x| ≳ 2896 in float
      // units) could wrap the product SILENTLY while the DuckDB oracle's
      // BIGINT multiply errors — fail loudly on the Spark side too
      // (embeddings are unit-norm-ish in practice; this guards the
      // contract, like project()'s 4096-dim packing require).
      q.foreach(c => require(math.abs(c) <= 3037000499L,
        s"gramMatrix component magnitude $c exceeds the Long product range"))
      val out = Array.newBuilder[(Int, Int, Long)]
      var i = 0
      while (i < q.length) {
        var j = i
        while (j < q.length) { out += ((i, j, q(i) * q(j))); j += 1 }
        i += 1
      }
      out.result().toSeq
    })
    df.select(explode(cellsUdf(col(vecCol))).as("c"))
      .select(col("c._1").as("i"), col("c._2").as("j"),
        col("c._3").cast("decimal(28,0)").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("s"))
      .select(col("i"), col("j"),
        round(col("s").cast("double") / lit(1099511627776.0), 6).as("gram"))
  }

  /** Project `vecCol` (array<float>) down to `outDims`, exploded as
    * (id, j, val): val = Σ_i q(v_i)·sign(j,i) / 2^20 / √outDims. */
  def project(df: DataFrame, idCol: String, vecCol: String, outDims: Int): DataFrame = {
    val rt = math.sqrt(outDims.toDouble)
    require(rt == math.rint(rt) && (rt.toLong & (rt.toLong - 1)) == 0,
      s"outDims must be a power of four for exact √-scaling, got $outDims")
    // row-local integer fold (the PortableHash vector-math convention:
    // no builtin computes a hash-driven signed dot product)
    val projUdf = udf((v: Seq[Float]) => {
      // (j, i) packs as j·4096 + i: a wider input would alias cell
      // (j, 4096+t) with (j+1, t), sharing sign segments between output
      // rows — the correlation failure the sign hash exists to prevent.
      // Fail loudly instead of returning silently-bad geometry.
      require(v.length <= 4096,
        s"input dimension ${v.length} exceeds the sign hash's 4096-dim packing")
      Array.tabulate(outDims) { j =>
        var acc = 0L
        var i = 0
        while (i < v.length) {
          acc += PortableHash.quantize(v(i)) * signComponent(j, i)
          i += 1
        }
        acc.toDouble / 1048576.0 / rt
      }
    })
    df.select(col(idCol), posexplode(projUdf(col(vecCol))))
      .select(col(idCol), col("pos").as("j"), round(col("col"), 6).as("val"))
  }

  /** Per-dimension z-score standardization of an embedding column — the
    * whitening prep every similarity/clustering pipeline runs so no
    * dimension dominates the metric. Moments come from FIXED-POINT
    * integer sums (the [[gramMatrix]] discipline): components quantize
    * to ⌊v·2²⁰+½⌋, Σq and Σq² accumulate as decimals (map-side
    * combinable, 64 groups — overflow-free at any corpus size), and
    * mean/variance divide back in one fixed expression shape, so both
    * engines standardize with bit-identical statistics. The moment
    * table is a broadcast artifact (d rows); the z-map itself is
    * stateless per row.
    *
    * var = E[q²]−E[q]² (exact population variance on the quantized
    * grid); a zero-variance dimension standardizes to 0 rather than
    * NaN. */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol).as("vec_id"), posexplode(col(vecCol)))
      .select(col("vec_id"), col("pos").as("i"),
        floor(col("col").cast("double") * 1048576.0 + 0.5)
          .cast("decimal(19,0)").as("q"))
    val m = e.groupBy("i").agg(
      sum(col("q")).as("s1"),
      sum(col("q") * col("q")).as("s2"),
      count(lit(1)).as("n"))
    val v = m.select(col("i"),
        (col("s1").cast("double") / 1048576.0 / col("n")).as("mean"),
        (col("s2").cast("double") / 1099511627776.0 / col("n")).as("msq"))
      .withColumn("variance", col("msq") - col("mean") * col("mean"))
    e.join(broadcast(v), Seq("i"))
      .select(col("vec_id"), col("i").cast("int").as("i"),
        round(when(col("variance") > 0,
          (col("q").cast("double") / 1048576.0 - col("mean"))
            / sqrt(col("variance"))).otherwise(0.0), 6).as("z"))
  }

  /** Top principal direction by power iteration over the DISTRIBUTED Gram
    * matrix — the PCA step [[gramMatrix]] exists to feed: the corpus-sized
    * work (the Σ v·vᵀ reduce) happened there; the iteration itself runs on
    * the d×d relation (≤ d² rows — for d=64, four thousand), so each round
    * is a join + hash-agg over a broadcast-sized input. `rounds` is fixed
    * and small (power iteration on a PSD Gram converges geometrically in
    * the λ₂/λ₁ gap; pipelines run 3–10 rounds).
    *
    * Returns one row per dimension: (i, component of the unit eigenvector
    * after the last round, λ estimate = ‖G·v‖ of that round — for a unit v
    * this is the Rayleigh-quotient-style top-eigenvalue estimate).
    *
    * Determinism across engines: every matvec/norm sum folds in explicit
    * index order (sort_array + ordered fold, the p38/BM25 convention —
    * DuckDB mirrors with `list_sum(list(… ORDER BY …))`), and each round's
    * vector re-rounds to 9 decimals, so both engines iterate on identical
    * doubles. The start vector is the uniform 1/√d (never orthogonal to
    * the top eigenvector of a PSD Gram unless the data is degenerate). */
  def powerIteration(gram: DataFrame, dims: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val spark = gram.sparkSession
    import spark.implicits._
    // symmetrize the upper triangle into the full matrix. NOT persisted:
    // the gram aggregation's exchange is reused across the rounds'
    // references (ReuseExchange), and an explicit cache barrier here
    // measured 3× SLOWER than letting AQE broadcast the tiny relation
    // into each round's join (1.0 s → 3.3 s at sf0.1)
    val full = gram.unionByName(
      gram.where(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("gram")))
    val v0 = (0 until dims).map(i =>
        (i, math.rint(1.0 / math.sqrt(dims.toDouble) * 1e9) / 1e9))
      .toDF("k", "v")
    val vFinal = (1 to rounds).foldLeft((v0, v0.sparkSession.emptyDataFrame)) {
      case ((v, _), _) =>
        val raw = full.join(v, full("j") === v("k"))
          .groupBy("i")
          .agg(round(aggregate(
            sort_array(collect_list(struct(col("j"), (col("gram") * col("v")).as("t")))),
            lit(0.0), (acc, x) => acc + x.getField("t")), 9).as("raw"))
        val norm = raw.agg(round(sqrt(aggregate(
            sort_array(collect_list(struct(col("i"), (col("raw") * col("raw")).as("t")))),
            lit(0.0), (acc, x) => acc + x.getField("t"))), 9).as("nrm"))
        val vNext = raw.crossJoin(broadcast(norm))
          .select(col("i").as("k"), round(col("raw") / col("nrm"), 9).as("v"),
            col("nrm"))
        (vNext.select("k", "v"), vNext)
    }._2
    vFinal.select(col("k").cast("int").as("i"), col("v").as("component"),
      col("nrm").as("lambda")).orderBy("i")
  }
}
