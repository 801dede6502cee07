package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extraction /
  * frame-sampling run per-partition so one task amortizes decoder setup
  * over its whole batch (the Spark-side plumbing — schema, partitioning,
  * batch shape — is real; the codec itself is STUBBED, see decodeStub).
  *
  * Scale notes (100 TB): payload bytes never shuffle — features are
  * extracted map-side and the binary column is dropped before any wide
  * operation. Partition sizing is the reader's maxPartitionBytes concern,
  * not this operator's.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
                      lang: String, declared_chars: Long)

  /** Extracted features (deterministic byte math, stands in for decoded
    * image/audio features). */
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
                           checksum: Long, head_byte: Int,
                           frame_mean: Double, n_frames: Int)

  /** STUB decoder: a real implementation would decode image/audio here
    * (libs not present in this environment). The stand-in is deterministic
    * byte arithmetic with the same shape: whole-payload stats + a sampled
    * "frame" sequence (every `frameStep`-th byte). */
  def decodeStub(payload: Array[Byte], frameStep: Int): (Long, Int, Double, Int) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum += payload(i) & 0xff; i += 1 }
    var frameSum = 0L
    var n = 0
    i = 0
    while (i < payload.length) { frameSum += payload(i) & 0xff; n += 1; i += frameStep }
    val mean = if (n > 0) frameSum.toDouble / n else 0.0
    val head = if (payload.nonEmpty) payload(0) & 0xff else -1
    (checksum, head, mean, n)
  }

  /** Wrap a text corpus as a media table (payload = utf-8 bytes) — the
    * test-scale stand-in for a real binary asset source. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      col("lang"), col("n_chars").cast("long").as("declared_chars"))

  /** Per-partition feature extraction: decoder state is initialized once
    * per partition (the expensive part for a real codec), then streamed
    * over the batch. */
  def extractFeatures(media: DataFrame, frameStep: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      // real codec: open decoder handle here, once per partition
      rows.map { r =>
        val (checksum, head, mean, n) = decodeStub(r.payload, frameStep)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          checksum, head, mean, n)
      }
    }.toDF()
  }
}
