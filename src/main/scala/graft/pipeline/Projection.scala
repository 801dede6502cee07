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
}
