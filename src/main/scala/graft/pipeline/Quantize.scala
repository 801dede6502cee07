package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of an embedding column — the SQ8 compression
  * step a 100 TB ANN index runs before storing vectors (FAISS
  * `ScalarQuantizer` QT_8bit: 4× smaller than float32 for ~1e-2 recall
  * loss). Training finds per-dimension `[min, max]` ranges over the
  * corpus; encoding maps each component to
  * `round((x - min) / (max - min) * 255)`.
  *
  * Distributed shape:
  *  - training is ONE partially-aggregated scan: `2*dims` scalar min/max
  *    aggregates over `element_at` projections — codegen'd hash-agg with
  *    map-side partials, no explode, no shuffle of vector data; exactly
  *    `2*dims` numbers reach the driver (bounded, like the IVF sample);
  *  - encoding is a second map-only pass with the trained ranges inlined
  *    as literal arrays — whole-stage codegen, zero shuffles.
  *
  * All arithmetic is exact-order double math (`floor(x + 0.5)`, not
  * platform `rint`), so an external engine running the same formula
  * reproduces every code bit-for-bit — see the p27 oracle.
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus: one aggregate row. The
    * vector-width check rides in the same pass (two extra scalar aggs,
    * no second scan). Component access uses null-safe `get` (0-based,
    * null past the end) rather than `element_at`, which under Spark 4's
    * default ANSI mode would throw INVALID_ARRAY_INDEX on the first
    * short vector BEFORE the width `require` below could report the
    * actual problem; with `get`, ragged input reaches the require and
    * fails with the width message. */
  def trainMinMax(df: DataFrame, vecCol: String, dims: Int): (Array[Double], Array[Double]) = {
    val aggs = (0 until dims).flatMap { i =>
      Seq(min(get(col(vecCol), lit(i)).cast("double")).as(s"mn_$i"),
        max(get(col(vecCol), lit(i)).cast("double")).as(s"mx_$i"))
    } ++ Seq(min(size(col(vecCol))).as("sz_min"), max(size(col(vecCol))).as("sz_max"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(2 * dims),
      s"quantization training set is empty (no rows with a non-null $vecCol)")
    require(row.getInt(2 * dims) == dims && row.getInt(2 * dims + 1) == dims,
      s"$vecCol width [${row.getInt(2 * dims)}, ${row.getInt(2 * dims + 1)}] != dims=$dims")
    (Array.tabulate(dims)(i => row.getDouble(2 * i)),
      Array.tabulate(dims)(i => row.getDouble(2 * i + 1)))
  }

  /** Unsigned int8 codes (0..255, as ints) for one vector column, given
    * trained ranges: dimension i maps to
    * `floor((x - lo_i) / (hi_i - lo_i) * 255 + 0.5)` CLAMPED to
    * [0, 255]; a degenerate dimension (hi == lo) codes to 0. The clamp
    * matters whenever the ranges were sample-trained (the 100 TB shape:
    * train on a bounded sample, encode the full corpus): out-of-range
    * components are then expected, and without the clamp the tinyint
    * cast in [[encodeColumnI8]] would throw mid-job under Spark 4's
    * default ANSI mode — FAISS's ScalarQuantizer clamps for exactly
    * this reason. This is the PRESENTATION form (the p27 catalog
    * output); for storage/shuffle use [[encodeColumnI8]], which
    * actually realizes the 1-byte-per-dimension width. */
  def encodeColumn(vec: Column, lo: Array[Double], hi: Array[Double]): Column = {
    val loLit = array(lo.map(lit): _*)
    val hiLit = array(hi.map(lit): _*)
    transform(vec, (x, i) => {
      val l = element_at(loLit, i + 1)
      val h = element_at(hiLit, i + 1)
      when(h > l,
        least(greatest(
          floor((x.cast("double") - l) / (h - l) * 255 + lit(0.5)),
          lit(0L)), lit(255L)).cast("int"))
        .otherwise(lit(0))
    })
  }

  /** STORAGE form of [[encodeColumn]]: the same codes shifted by the
    * standard −128 zero-point into signed `array<tinyint>` — Spark's
    * UnsafeArrayData stores ByteType elements in 1 byte, so an inverted
    * list shipped in this form really is 4× narrower than the float32
    * vector it replaces (an `array<int>` of 0..255 values would be
    * byte-for-byte as wide as the floats). Decode with
    * `code.cast("double") + 128`. */
  def encodeColumnI8(vec: Column, lo: Array[Double], hi: Array[Double]): Column =
    transform(encodeColumn(vec, lo, hi), c => (c - 128).cast("tinyint"))

  /** Train + encode, with a per-vector reconstruction-error summary:
    * (vec_id, code_0, code_sum, codes_hash, max_err) where `max_err` is
    * the L∞ error of the dequantized vector `lo + code * (hi - lo) / 255`
    * against the original (rounded to 6 for cross-engine hash
    * stability). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String, dims: Int): DataFrame = {
    val (lo, hi) = trainMinMax(df, vecCol, dims)
    val loLit = array(lo.map(lit): _*)
    val hiLit = array(hi.map(lit): _*)
    val withCodes = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("codes", encodeColumn(col("v"), lo, hi))
    val errAt = (i: Column) => {
      val l = element_at(loLit, i + 1)
      val h = element_at(hiLit, i + 1)
      abs(l + element_at(col("codes"), i + 1).cast("double") * (h - l) / 255
        - element_at(col("v"), i + 1).cast("double"))
    }
    withCodes.select(col("vec_id"),
      element_at(col("codes"), 1).as("code_0"),
      aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
      md5(array_join(col("codes"), ",")).as("codes_hash"),
      round(aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
        (acc, i) => greatest(acc, errAt(i))), 6).as("max_err"))
  }
}
