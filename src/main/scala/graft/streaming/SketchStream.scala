package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.pipeline.Sketches

/** Incremental Count-Min sketch materialized view — the streaming form of
  * the x4 sketch family: each micro-batch builds its own bounded sketch
  * (ONE map-side-combinable aggregate, ≤ depth·width rows) and cell-wise
  * ADDS it into a persisted sketch table, the mergeability that
  * `SketchesSpec` pins doing streaming work. The state is depth·width
  * counters REGARDLESS of stream length — the canonical "count
  * everything forever in bounded space" shape — and point estimates
  * serve from the table alone, never touching the stream.
  *
  * Exactly-once: additive counters are NOT naturally idempotent under
  * micro-batch replay, so the applied batch id rides IN the state table
  * itself (a constant `last_batch` column on the same bounded relation)
  * — state and watermark commit in one atomic parquet overwrite, and a
  * replayed batch sees `batchId <= max(last_batch)` and skips. The whole
  * table rewrites per batch, which is correct here precisely because the
  * sketch is bounded; contrast with `EventStreams.applyOpsStream`, whose
  * unbounded state demands partition-targeted dynamic overwrite.
  */
object SketchStream {

  /** Maintain `stateDir` as the running (j, bucket, cnt, last_batch)
    * sketch of `items(itemCol)`. */
  def countMinStream(items: DataFrame, itemCol: String, stateDir: String,
                     checkpointDir: String, depth: Int = 4,
                     width: Int = 256) = {
    items.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val existing = try {
          Some(spark.read.parquet(stateDir))
        } catch { case _: Throwable => None }
        val lastApplied = existing
          .map(_.agg(max("last_batch")).head().getLong(0)).getOrElse(-1L)
        if (batchId > lastApplied) {
          val batchSketch = Sketches.countMin(batch, itemCol, depth, width)
          val merged = (existing match {
            case Some(st) => st.select("j", "bucket", "cnt")
              .unionByName(batchSketch)
              .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
            case None => batchSketch
          }).withColumn("last_batch", lit(batchId))
            // materialize BEFORE the overwrite: the merge plan reads
            // stateDir and Spark refuses to overwrite a read path
            .localCheckpoint(true)
          merged.write.mode("overwrite").parquet(stateDir)
        }
        ()
      }
      .start()
  }

  /** Point estimates for `probes(itemCol)` from the persisted sketch —
    * a pure read of the bounded state table. */
  def estimate(spark: SparkSession, stateDir: String, probes: DataFrame,
               itemCol: String, depth: Int = 4, width: Int = 256): DataFrame =
    Sketches.estimate(spark.read.parquet(stateDir).select("j", "bucket", "cnt"),
      probes, itemCol, depth, width)
}
