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
  * can instead be range-split by time with [[backwardSliced]]: process each
  * time slice with the previous slice's final state injected as a synthetic
  * right row (the standard two-pass fix).
  */
object AsofJoin {

  private val Reserved = Seq("__t", "__side", "__ord", "__l", "__p", "__m",
    "__slice", "__carry")

  /** Inputs must not use the operator's scratch columns — a left or right
    * column literally named `__t`/`__side`/… would silently mis-resolve
    * inside the tagged union instead of erroring. */
  private def requireNoReserved(left: DataFrame, right: DataFrame): Unit = {
    val clash = (left.columns ++ right.columns).distinct.filter(Reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with AsofJoin's reserved __-prefixed scratch columns")
  }

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
    requireNoReserved(left, right)
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

  /** [[backward]] with a STALENESS BOUND (pandas `merge_asof`'s
    * `tolerance`): the matched right row must also satisfy
    * `leftTs − rightTs ≤ tolerance`, else the payload is null — "the
    * state as of this event, unless it is too old to trust". Implemented
    * as the plain backward join with the match's own timestamp carried
    * through the window (one extra struct field, no second shuffle) and
    * a map-side null-out; the timestamp columns must be numeric (epoch
    * units — the subtraction defines the tolerance's unit). */
  def backwardWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     payload: Seq[String], tiebreak: String,
                     tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be non-negative: $tolerance")
    require(!left.columns.contains("__mt") && !right.columns.contains("__mt"),
      "input columns collide with AsofJoin's reserved __-prefixed scratch columns")
    // ride the right timestamp inside the payload struct under a scratch
    // name, then age-filter each emitted payload column
    val r2 = right.withColumn("__mt", col(rightTs))
    val joined = backward(left, r2, keys, leftTs, rightTs,
      payload :+ "__mt", tiebreak)
    val fresh = col("__mt").isNotNull &&
      (col(leftTs) - col("__mt")) <= tolerance
    val out = left.columns.map(col) ++
      payload.map(p => when(fresh, col(p)).otherwise(lit(null)).as(p))
    joined.select(out.toSeq: _*)
  }

  /** Forward as-of join — the mirror of [[backward]]: for every left row,
    * the single right row with the SMALLEST `rightTs` ≥ the left row's
    * `leftTs` within the key group ("the next event after this one": next
    * purchase after a view, next maintenance after a failure). Inclusive
    * like SQL ASOF's `<=` mirror; right-side ties on (key, ts) resolve
    * deterministically to the SMALLEST `tiebreak` (backward takes the
    * largest — each direction prefers the match nearest its horizon).
    * Same one-shuffle union + running-window shape as [[backward]], with
    * the SORT reversed instead of the frame: a [current, following]
    * frame would execute as Spark's UnboundedFollowing window, which
    * recomputes the aggregate per row — O(n²) per key group, exactly the
    * blow-up this operator family exists to avoid — while descending
    * order keeps the incremental O(n) running-last scan. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              payload: Seq[String], tiebreak: String): DataFrame = {
    require(payload.nonEmpty, "as-of join with no payload columns")
    requireNoReserved(left, right)
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with a left column")

    val l = left.select(
      keyCols :+
        col(leftTs).as("__t") :+
        lit(0).as("__side") :+
        lit(null).cast(right.schema(tiebreak).dataType).as("__ord") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(
            p, right.schema(p).dataType)))).as("__p"): _*)
    val r = right.select(
      keyCols :+
        col(rightTs).as("__t") :+
        lit(1).as("__side") :+
        col(tiebreak).as("__ord") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(payload.map(col): _*).as("__p"): _*)

    // DESCENDING time: the running frame at a left row has seen exactly
    // the right rows with ts >= left ts. Right rows (side 1) sort before
    // left (side 0) at equal ts under `__side` desc → inclusive match;
    // equal-(key, ts) right rows order by __ord desc, so the running
    // `last` holds the SMALLEST tiebreak when the left row arrives.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").desc, col("__side").desc, col("__ord").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)

    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      payload.map(p => col("__m").getField(p).as(p))
    matched.select(out: _*)
  }

  /** [[backward]] with the hot-key escape hatch: the same result, but the
    * running-last window partitions on (keys, time-slice) instead of keys
    * alone, so one pathological key (half the fact table on a single
    * entity) spreads over `ts-range / sliceWidth` sort partitions instead
    * of serializing through one.
    *
    * Two passes:
    *  1. per (key, slice) summarize the right side to its FINAL payload
    *     (`max_by` over (ts, tiebreak) — a map-side-combinable aggregate,
    *     never more than |keys|·|slices| rows out), then running-last
    *     that summary over prior slices — the carry state each slice
    *     starts from. This window partitions by key, but over the
    *     bounded summary relation, not the data.
    *  2. union left rows, right rows, and one synthetic carry row per
    *     (key, slice) (null ts + `asc_nulls_first` sorts it before every
    *     real row of the slice; `__side = -1` keeps it before a right row
    *     at the exact slice start), then the same inclusive running-last
    *     as [[backward]], partitioned by (keys, slice).
    *
    * Works for numeric and TIMESTAMP ts columns alike: slices come from
    * `floor(ts / sliceWidth)` after a double cast (epoch seconds for
    * timestamps — monotone, so a coarser-than-exact slice at magnitudes
    * past 2^53 only affects granularity, never matches), while the
    * ORDER within a slice uses the raw column exactly like [[backward]],
    * so results are bit-identical to it. `AsofJoinSpec` proves equality
    * with [[backward]] on a skewed fixture; `d11_asof_sliced` records it
    * against d10's oracle on real timestamps.
    */
  def backwardSliced(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     payload: Seq[String], tiebreak: String,
                     sliceWidth: Long): DataFrame = {
    require(payload.nonEmpty, "as-of join with no payload columns")
    require(sliceWidth > 0, s"sliceWidth must be positive, got $sliceWidth")
    requireNoReserved(left, right)
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with a left column")

    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType)))
    def sliceOf(ts: Column) = floor(ts.cast("double") / sliceWidth).cast("long")

    // pass 1: per-(key, slice) final right payload, then the carry each
    // slice inherits from every earlier slice. Left-only slices must
    // appear too (a gap slice still needs the carry), so the summary is
    // the union of right summaries and left slice markers.
    val rightSummary = right
      .groupBy((keyCols :+ sliceOf(col(rightTs)).as("__slice")): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(col(rightTs), col(tiebreak))).as("__p"))
    val leftSlices = left
      .select((keyCols :+ sliceOf(col(leftTs)).as("__slice")): _*)
      .distinct()
      .withColumn("__p", lit(null).cast(payloadType))
    val carryW = Window.partitionBy(keyCols: _*).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = rightSummary.unionByName(leftSlices)
      // a slice can appear in both branches; collapse so each (key, slice)
      // contributes one summary row (right payload wins over the marker)
      .groupBy((keyCols :+ col("__slice")): _*)
      .agg(max_by(col("__p"), col("__p").isNotNull).as("__p"))
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(carryW))
      .where(col("__carry").isNotNull)
      .select((keyCols :+ col("__slice") :+
        lit(null).cast(left.schema(leftTs).dataType).as("__t") :+
        lit(-1).as("__side") :+
        lit(null).cast(right.schema(tiebreak).dataType).as("__ord") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          leftCols.map(c => org.apache.spark.sql.types.StructField(
            c, left.schema(c).dataType)))).as("__l") :+
        col("__carry").as("__p")): _*)

    // pass 2: the backward() union, sliced
    val l = left.select(
      keyCols :+
        sliceOf(col(leftTs)).as("__slice") :+
        col(leftTs).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(right.schema(tiebreak).dataType).as("__ord") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right.select(
      keyCols :+
        sliceOf(col(rightTs)).as("__slice") :+
        col(rightTs).as("__t") :+
        lit(0).as("__side") :+
        col(tiebreak).as("__ord") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(payload.map(col): _*).as("__p"): _*)

    val w = Window.partitionBy((keyCols :+ col("__slice")): _*)
      .orderBy(col("__t").asc_nulls_first, col("__side").asc,
        col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r).unionByName(carries)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      payload.map(p => col("__m").getField(p).as(p))
    matched.select(out: _*)
  }
}
