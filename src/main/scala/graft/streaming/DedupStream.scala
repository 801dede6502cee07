package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the state-store companion of
  * [[CurationStream]]'s parquet-index funnel and the streaming form of
  * [[graft.pipeline.Dedup.exactDedup]]: every document is verdicted
  * against all content seen before it, first arrival canonical, later
  * arrivals flagged with the canonical's id.
  *
  * State is ONE row per distinct content hash — (canonical id, last-seen
  * event time), never the text — so memory is O(|distinct hashes within
  * the TTL window|), not O(|documents|). Event-time TTL eviction is ON
  * BY DEFAULT (24 h, the [[EventStreams.asofEnrichStream]] posture): an
  * always-on ingestion stream over an open content domain must not grow
  * state forever by omission; `unboundedKeys = true` is the explicit
  * evictionless opt-in for bounded corpora. The documented TTL trade: a
  * duplicate arriving later than TTL after its content was last seen is
  * verdicted as a NEW canonical — exactly the row batch dedup over the
  * full history would have flagged.
  *
  * Parity contract (pinned in `DedupStreamSpec`): when no TTL expires
  * mid-stream, the kept set equals batch first-arrival dedup over the
  * concatenated log, for ANY micro-batch split whose batches respect
  * event-time order; within a batch, arrival order is (ts, doc_id) —
  * deterministic under replay.
  */
object DedupStream {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  case class DedupVerdict(doc_id: Long, ts: Timestamp, text_hash: String,
                          is_duplicate: Boolean, canonical_id: Option[Long])

  case class SeenState(canonicalId: Long, lastTs: Long)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def exactDedupStream(docs: Dataset[Doc],
                       watermark: String = "15 minutes",
                       stateTtlMs: Option[Long] = Some(24L * 3600 * 1000),
                       unboundedKeys: Boolean = false): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    val ttl = if (unboundedKeys) None else stateTtlMs
    require(ttl.isDefined || unboundedKeys,
      "stateTtlMs = None without unboundedKeys = true: an evictionless " +
        "dedup stream over an open content domain grows state forever; " +
        "pass a TTL or opt in explicitly")
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.withWatermark("ts", watermark)
      // the content hash IS the group key: text never shuffles past this
      // map side, and never enters state
      .groupByKey(d => md5hex(d.text))
      .flatMapGroupsWithState[SeenState, DedupVerdict](
        OutputMode.Append(), timeoutConf) {
        (hash: String, rows: Iterator[Doc], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            var cur = state.getOption
            val out = List.newBuilder[DedupVerdict]
            sorted.foreach { d =>
              cur match {
                case Some(s) =>
                  out += DedupVerdict(d.doc_id, d.ts, hash,
                    is_duplicate = true, Some(s.canonicalId))
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, d.ts.getTime)))
                case None =>
                  out += DedupVerdict(d.doc_id, d.ts, hash,
                    is_duplicate = false, None)
                  cur = Some(SeenState(d.doc_id, d.ts.getTime))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must land at or after the current watermark —
              // stale keys still get one full micro-batch of grace
              ttl.foreach { t =>
                state.setTimeoutTimestamp(
                  math.max(s.lastTs + t, state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
  }
}
