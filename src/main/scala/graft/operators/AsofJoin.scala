package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row with the
  * largest `rightTs` ≤ the left row's `leftTs` within the same key group
  * (the point-in-time enrichment join: "state of X as of this event").
  * Spark has no built-in as-of operator; the naive spelling is a range
  * join (`l.key = r.key AND r.ts <= l.ts` + a max-per-left reduction),
  * which Catalyst plans as a per-key cross product — quadratic in events
  * per key and unusable at scale.
  *
  * This formulation is the scalable composition: tag both inputs, UNION
  * them into one stream, and take a running `last(payload, ignoreNulls)`
  * over a window partitioned by key and ordered by (ts, side, tiebreak) —
  * right rows sort BEFORE left rows at equal ts, so the match is
  * inclusive (ties with the left timestamp are visible, the same contract
  * as SQL ASOF JOIN's `>=`). ONE shuffle on the key columns, no range
  * explosion: cost is sort + linear scan per key group. Right-side ties on
  * (key, ts) resolve deterministically to the largest `tiebreak`.
  *
  * Scale note: per-key data must fit a window sort partition — natural for
  * entity keys (users, places, instruments). A single pathological hot key
  * can instead be range-split by time: process each time slice with the
  * previous slice's final state unioned in as a synthetic right row (the
  * standard two-pass fix); not needed for any engine workload, documented
  * for 100 TB operators.
  */
object AsofJoin {

  /** @param left      probe rows, keeps ALL its columns
    * @param right     build rows; only `payload` columns are emitted
    * @param keys      equality key columns present on both sides
    * @param leftTs    left timestamp/ordering column name
    * @param rightTs   right timestamp/ordering column name (same type)
    * @param payload   right columns to attach (null when no right row ≤ ts)
    * @param tiebreak  right column ordering equal-(key, ts) rows — the
    *                  largest wins (must be non-null on the right)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String], tiebreak: String): DataFrame = {
    require(payload.nonEmpty, "as-of join with no payload columns")
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with a left column")

    val l = left.select(
      keyCols :+
        col(leftTs).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(right.schema(tiebreak).dataType).as("__ord") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(
            p, right.schema(p).dataType)))).as("__p"): _*)
    val r = right.select(
      keyCols :+
        col(rightTs).as("__t") :+
        lit(0).as("__side") :+
        col(tiebreak).as("__ord") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(payload.map(col): _*).as("__p"): _*)

    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // inclusive match; asc_nulls_first keeps left rows' null __ord from
    // sorting after right ties (irrelevant to the match, deterministic)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      payload.map(p => col("__m").getField(p).as(p))
    matched.select(out: _*)
  }
}
