package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join — all (left, right) pairs within the same key
  * group whose [start, end] intervals intersect (inclusive bounds):
  * `l.start <= r.end AND r.start <= l.end`. Spark has no built-in range
  * join; the naive inequality-join spelling plans as a per-key cross
  * product (BroadcastNestedLoopJoin or a key-equi join whose per-key
  * groups multiply), quadratic in rows per key.
  *
  * This is the standard BUCKETIZED formulation: quantize the time axis
  * into fixed-width buckets, explode each interval to the buckets it
  * covers, equi-join on (keys, bucket), verify the exact overlap
  * predicate, and de-duplicate by keeping a pair only in the FIRST bucket
  * the overlap itself covers — `floor(max(l.start, r.start) / W)` — so
  * every overlapping pair is emitted exactly once without a distinct.
  * The join becomes a plain hash equi-join: ONE shuffle per side on
  * (keys, bucket), candidates bounded by per-bucket occupancy instead of
  * per-key row counts.
  *
  * `bucketWidth` tunes fan-out vs selectivity: ~the typical interval
  * length is right (each interval covers O(1) buckets and each bucket
  * pairs only temporal neighbors). Long-tail intervals degrade gracefully
  * — they explode to more buckets (linear in their length), never
  * quadratically. At 100 TB only (keys, id, start, end) shuffle; payload
  * columns should be joined back by id afterwards.
  */
object RangeJoin {

  private val Reserved = Seq("__bucket")

  /** @param left        intervals, columns renamed `l_`-prefixed in the output
    * @param right       intervals, `r_`-prefixed
    * @param keys        equality key columns present on both sides
    * @param startCol    interval start column name (numeric, both sides)
    * @param endCol      interval end column name (inclusive; >= start)
    * @param bucketWidth time-axis quantum (same unit as start/end)
    * @return one row per overlapping pair: keys, l_/r_-prefixed non-key
    *         columns, and `overlap` = min(ends) − max(starts) (>= 0)
    */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
              startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = (left.columns ++ right.columns).distinct.filter(Reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with RangeJoin's reserved scratch columns")

    def explodeBuckets(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (keys.contains(c)) d else d.withColumnRenamed(c, prefix + c)
      }
      val s = col(prefix + startCol); val e = col(prefix + endCol)
      renamed.withColumn("__bucket",
        explode(sequence(floor(s / bucketWidth), floor(e / bucketWidth))))
    }

    val l = explodeBuckets(left, "l_")
    val r = explodeBuckets(right, "r_")
    val ls = col("l_" + startCol); val le = col("l_" + endCol)
    val rs = col("r_" + startCol); val re = col("r_" + endCol)
    l.join(r, keys :+ "__bucket")
      .where(ls <= re && rs <= le)
      // emit each pair once: only in the bucket where the overlap starts
      .where(col("__bucket") === floor(greatest(ls, rs) / bucketWidth))
      .drop("__bucket")
      .withColumn("overlap", least(le, re) - greatest(ls, rs))
  }
}
