package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class DedupStreamSpec extends AnyFunSuite {

  private def withSpark[T](f: SparkSession => T): T = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("dedup-stream-spec")
      .getOrCreate()
    try f(spark) finally spark.stop()
  }

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming exact dedup matches batch first-arrival dedup across micro-batches") {
    withSpark { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      // duplicates within a batch, across batches, and unique docs; fed
      // in event-time order (the parity contract)
      val all = Seq(
        DedupStream.Doc(1, ts(0), "alpha content"),
        DedupStream.Doc(2, ts(1), "beta content"),
        DedupStream.Doc(3, ts(2), "alpha content"),  // within-batch dup of 1
        DedupStream.Doc(4, ts(10), "gamma content"),
        DedupStream.Doc(5, ts(11), "alpha content"), // cross-batch dup of 1
        DedupStream.Doc(6, ts(12), "beta content"),  // cross-batch dup of 2
        DedupStream.Doc(7, ts(20), "delta content"),
        DedupStream.Doc(8, ts(21), "gamma content")) // cross-batch dup of 4
      val mem = MemoryStream[DedupStream.Doc]
      val q = DedupStream.exactDedupStream(mem.toDS(), "5 minutes")
        .writeStream.format("memory").queryName("dedup")
        .outputMode(OutputMode.Append()).start()
      try {
        all.grouped(3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val got = spark.table("dedup").collect()
          .map(r => r.getLong(0) ->
            (r.getBoolean(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
        // batch reference: first (ts, doc_id) arrival per content is
        // canonical, everyone else points at it
        val want = all.groupBy(_.text).values.flatMap { g =>
          val sortedG = g.sortBy(d => (d.ts.getTime, d.doc_id))
          val canon = sortedG.head.doc_id
          sortedG.map(d =>
            d.doc_id -> ((d.doc_id != canon,
              if (d.doc_id != canon) Some(canon) else None)))
        }.toMap
        assert(got == want)
        assert(got.values.count(_._1) == 4, "fixture must exercise 4 duplicates")
      } finally q.stop()
    }
  }

  test("default TTL evicts: a repeat after 24h idle becomes a new canonical") {
    withSpark { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val day = 24 * 60
      val mem = MemoryStream[DedupStream.Doc]
      val q = DedupStream.exactDedupStream(mem.toDS(), "5 minutes")
        .writeStream.format("memory").queryName("dedup_ttl")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(DedupStream.Doc(1, ts(0), "recurring content"))
        q.processAllAvailable()
        // push the watermark past 1's timeout, then fire the timeout
        mem.addData(DedupStream.Doc(2, ts(day + 60), "other content"))
        q.processAllAvailable()
        mem.addData(DedupStream.Doc(3, ts(day + 61), "third content"))
        q.processAllAvailable()
        // same content re-arrives after eviction → new canonical, not dup;
        // a live key's dup still resolves to its canonical
        mem.addData(
          DedupStream.Doc(4, ts(day + 70), "recurring content"),
          DedupStream.Doc(5, ts(day + 70), "other content"))
        q.processAllAvailable()
        val got = spark.table("dedup_ttl").collect()
          .map(r => r.getLong(0) ->
            (r.getBoolean(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
        assert(got(4L) == ((false, None)), s"evicted key must re-canonicalize: $got")
        assert(got(5L) == ((true, Some(2L))))
      } finally q.stop()
    }
  }

  test("evictionless setup requires the explicit opt-in") {
    withSpark { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[DedupStream.Doc]
      intercept[IllegalArgumentException] {
        DedupStream.exactDedupStream(mem.toDS(), "5 minutes", stateTtlMs = None)
      }
      DedupStream.exactDedupStream(mem.toDS(), "5 minutes",
        stateTtlMs = None, unboundedKeys = true)
    }
  }
}
