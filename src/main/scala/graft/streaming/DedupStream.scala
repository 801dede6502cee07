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

  /** One exploded stream row: a document's membership in one LSH band,
    * carrying its full MinHash signature for in-state verification. */
  case class BandInput(doc_id: Long, ts: Timestamp, band_key: Long,
                       sig: Array[Long])

  /** Per-band state: the band's FIRST toucher (its owner), the owner's
    * signature, and the last touch time for TTL eviction. Bounded: one
    * row per live band key — (id + numHashes longs + ts), never text. */
  case class BandOwner(ownerId: Long, sig: Array[Long], lastTs: Long)

  /** A near-dup candidate: `doc_id` shares `band_key` with the earlier
    * owner, `est_sim` = fraction of equal MinHash signature slots (the
    * standard unbiased Jaccard estimate). Ownership takeovers emit
    * nothing — a doc with no candidate rows is canonical by default. */
  case class NearCand(doc_id: Long, ts: Timestamp, band_key: Long,
                      owner_id: Long, est_sim: Double)

  /** Streaming NEAR-duplicate detection — [[exactDedupStream]]'s
    * state-store discipline extended from exact content hashes to
    * MinHash band keys, the streaming form of
    * [[graft.pipeline.Dedup.minhashLshPairs]]: each document's word
    * n-gram MinHash signature ([[graft.functions.MinhashBandKeys.sigOf]]
    * — bit-identical to the batch kernel) explodes into `numHashes /
    * bandRows` band keys; per band the FIRST toucher becomes the owner
    * and every later document sharing the band emits a verified
    * candidate (signature-slot similarity against the owner's stored
    * signature). State is one row per live band key — (owner id,
    * signature, last-seen) — never text; event-time TTL eviction is ON
    * BY DEFAULT exactly as [[exactDedupStream]], with the same trade:
    * a near-dup arriving past the TTL matches nothing and its bands
    * take fresh ownership.
    *
    * The per-band candidates compose into document verdicts with
    * [[resolveNearVerdicts]] (run at the sink / compaction step, the
    * [[CurationStream]] batch-finisher pattern): candidate edges at
    * `minSim` feed connected components, canonical = component minimum —
    * [[graft.pipeline.Dedup.resolveByComponents]]'s convention, so chains
    * (C matches B's band, B matches A's) resolve transitively even when
    * the extremes never share a band.
    *
    * Parity contract (pinned in `DedupStreamSpec`): when no TTL expires
    * mid-stream, candidates equal a batch fold of the same owner rule
    * over the concatenated log in (ts, doc_id) order, for ANY micro-batch
    * split whose batches respect event-time order — cross-batch
    * near-duplicates match the state left by earlier batches. */
  def nearDedupStream(docs: Dataset[Doc], n: Int = 2, numHashes: Int = 64,
                      bandRows: Int = 4,
                      watermark: String = "15 minutes",
                      stateTtlMs: Option[Long] = Some(24L * 3600 * 1000),
                      unboundedKeys: Boolean = false): Dataset[NearCand] = {
    import docs.sparkSession.implicits._
    require(numHashes % bandRows == 0, "numHashes must divide into bands")
    val ttl = if (unboundedKeys) None else stateTtlMs
    require(ttl.isDefined || unboundedKeys,
      "stateTtlMs = None without unboundedKeys = true: an evictionless " +
        "dedup stream over an open content domain grows state forever; " +
        "pass a TTL or opt in explicitly")
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      // signature + band explode are map-side: text never shuffles, the
      // stateful exchange carries only (id, ts, band, signature)
      .flatMap { d =>
        val words = d.text.split(" ").filter(_.nonEmpty)
        val sig = graft.functions.MinhashBandKeys.sigOf(words, n, numHashes)
        if (sig.isEmpty) Iterator.empty
        else graft.functions.MinhashBandKeys.bandsOf(sig, bandRows).iterator
          .map(b => BandInput(d.doc_id, d.ts, b, sig))
      }
      .withWatermark("ts", watermark)
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BandOwner, NearCand](
        OutputMode.Append(), timeoutConf) {
        (band: Long, rows: Iterator[BandInput], state: GroupState[BandOwner]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var cur = state.getOption
            val out = List.newBuilder[NearCand]
            sorted.foreach { r =>
              cur match {
                case Some(o) =>
                  var eq = 0
                  var i = 0
                  while (i < r.sig.length) {
                    if (r.sig(i) == o.sig(i)) eq += 1
                    i += 1
                  }
                  out += NearCand(r.doc_id, r.ts, band, o.ownerId,
                    eq.toDouble / numHashes)
                  cur = Some(o.copy(lastTs = math.max(o.lastTs, r.ts.getTime)))
                case None =>
                  cur = Some(BandOwner(r.doc_id, r.sig, r.ts.getTime))
              }
            }
            cur.foreach { o =>
              state.update(o)
              ttl.foreach { t =>
                state.setTimeoutTimestamp(
                  math.max(o.lastTs + t, state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
  }

  /** Batch finisher for [[nearDedupStream]] (the sink/compaction step):
    * candidates at `minSim` become edges, connected components become
    * duplicate clusters, canonical = component minimum — one verdict row
    * (doc_id, cluster_id, keep) per document in `docs`. */
  def resolveNearVerdicts(docs: org.apache.spark.sql.DataFrame,
                          cands: org.apache.spark.sql.DataFrame,
                          minSim: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.pipeline.Dedup.resolveByComponents(docs, "doc_id",
      cands.where(col("est_sim") >= minSim)
        .select(col("doc_id").as("a_id"), col("owner_id").as("b_id"))
        .distinct())
  }

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
