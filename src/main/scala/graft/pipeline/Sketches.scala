package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") — the
  * approximate-counting member of the sketch family (x1 HLL distinct,
  * x2 quantile, x3 exact heavy hitters): `depth` hash rows × `width`
  * counters, point estimate = min over rows, guaranteed to never
  * UNDER-estimate (collisions only add).
  *
  * Distributed shape (100 TB):
  *  - the build is ONE map-side-combinable hash aggregate: each item
  *    explodes to `depth` (row, bucket) cells, but partial aggregation
  *    collapses every partition to ≤ depth·width rows before the
  *    shuffle — the corpus itself never reshuffles and the sketch is a
  *    bounded artifact (depth·width longs) regardless of input size;
  *  - estimation broadcasts the sketch against any probe relation
  *    (map-only per probe);
  *  - two sketches built with the same (depth, width) merge by cell-wise
  *    addition — a `unionByName.groupBy.sum`, the property that makes
  *    the sketch composable across corpus shards or streaming batches.
  *
  * Determinism: row j's hash is the affine map (poly31cp(item)·A_j + B_j)
  * mod 1e9+7 mod width, with the [[PortableHash.minhashA]]/`minhashB`
  * multipliers over the CODE-POINT fold ([[PortableHash.poly31Cp]], the
  * convention whose SQL form is DuckDB's character slicing on all text,
  * astral included) — pure integer math the oracle reproduces
  * bit-for-bit, so estimates (not just error bounds) are exact-checkable.
  * The fold runs as the native codegen `poly31_hash` (no UDF on the
  * build path).
  */
object Sketches {

  private val M = PortableHash.M

  /** Bucket of `itemHash` in sketch row j. */
  def cmsBucket(itemHash: Column, j: Int, width: Int): Column =
    pmod((itemHash * lit(PortableHash.minhashA(j)) + lit(PortableHash.minhashB(j))) % lit(M),
      lit(width.toLong))

  private def hashed(df: DataFrame, itemCol: String): DataFrame = {
    graft.functions.Poly31Hash.register(df.sparkSession)
    df.where(col(itemCol).isNotNull)
      .select(call_function("poly31_hash", col(itemCol).cast("string")).as("ih"))
  }

  /** Build the sketch over `df(itemCol)` (one occurrence per row):
    * (j, bucket, cnt), depth·width rows at most. */
  def countMin(df: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("j"), cmsBucket(col("ih"), j, width).as("bucket")))
    hashed(df, itemCol)
      .select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes(itemCol)` (distinct items): (item,
    * cms_cnt). The sketch is broadcast — estimation is map-side. An item
    * whose cells were never touched estimates 0 (min over absent cells),
    * exactly the sketch's zero-initialized counters. */
  def estimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
               depth: Int, width: Int): DataFrame = {
    graft.functions.Poly31Hash.register(probes.sparkSession)
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("j"), cmsBucket(col("ih"), j, width).as("bucket")))
    val probeCells = probes.select(col(itemCol).as("item")).distinct()
      .select(col("item"),
        call_function("poly31_hash", col("item").cast("string")).as("ih"))
      .select(col("item"), explode(array(cells: _*)).as("c"))
      .select(col("item"), col("c.j").as("j"), col("c.bucket").as("bucket"))
    probeCells
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
  }
}
