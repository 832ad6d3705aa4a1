package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Drives the streaming operators through real incremental micro-batches
  * via MemoryStream + memory sink.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000)

  test("tumblingAgg aggregates event-time windows incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingAgg(df, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_test").outputMode("append").start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      mem.addData((ts(60), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test").collect()
      val clicks = rows.find(r => r.getString(2) == "click" && r.getLong(3) == 2)
      assert(clicks.isDefined, s"expected closed click window, got ${rows.mkString(";")}")
      assert(clicks.get.getDouble(4) == 3.0)
    } finally q.stop()
  }

  test("sessionAgg merges events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val q = StreamOps.sessionAgg(df, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("session_test").outputMode("append").start()
    try {
      mem.addData((ts(0), 1L, 1.0), (ts(5), 1L, 2.0), (ts(120), 1L, 5.0))
      q.processAllAvailable()
      mem.addData((ts(600), 1L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("session_test").collect()
      assert(rows.exists(r => r.getLong(3) == 2 && r.getDouble(4) == 3.0),
        s"expected merged 2-event session, got ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("conversionJoin matches purchases to in-window clicks across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long, Double)]
    val cdf = clicks.toDF().toDF("ts", "user_id", "event_id")
    val pdf = purchases.toDF().toDF("ts", "user_id", "event_id", "value")
    val q = StreamOps.conversionJoin(cdf, pdf, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("conv_join_test")
      .outputMode("append").start()
    try {
      // u1 clicks at t0, purchases at t10 (in window, across batches);
      // u2 clicks at t0 but purchases at t50 (outside the 30-min window);
      // u3 purchases with no click at all
      clicks.addData((ts(0), 1L, 100L), (ts(0), 2L, 200L))
      q.processAllAvailable()
      purchases.addData((ts(10), 1L, 101L, 9.0), (ts(50), 2L, 201L, 5.0),
        (ts(20), 3L, 301L, 7.0))
      q.processAllAvailable()
      // advance both watermarks so all joinable state resolves (distinct
      // users so the advancement events cannot join each other)
      clicks.addData((ts(600), 8L, 900L))
      purchases.addData((ts(600), 9L, 901L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("conv_join_test").collect()
      assert(rows.length == 1, s"expected one attribution, got ${rows.mkString(";")}")
      val r = rows.head
      assert(r.getLong(0) == 1L && r.getLong(1) == 101L && r.getLong(2) == 100L)
      assert(r.getLong(5) == 10L * 60000 && r.getDouble(6) == 9.0)
    } finally q.stop()
  }

  test("sessionizeWithState closes sessions by gap and by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double, String)]
    val df = mem.toDF().toDF("user_id", "ts", "value", "event_type")
    val q = StreamOps.sessionizeWithState(df)
      .writeStream.format("memory").queryName("state_sess_test").outputMode("append").start()
    try {
      // session A: 2 events 5 min apart; then an event 40 min later
      // closes A by gap and opens session B
      mem.addData((1L, ts(0), 1.0, "view"), (1L, ts(5), 2.0, "click"))
      q.processAllAvailable()
      mem.addData((1L, ts(45), 7.0, "click"))
      q.processAllAvailable()
      // advance the watermark far enough to time out session B
      mem.addData((2L, ts(600), 0.0, "view"))
      q.processAllAvailable()
      mem.addData((2L, ts(1300), 0.0, "view"))
      q.processAllAvailable()
      val rows = spark.table("state_sess_test").collect()
      val u1 = rows.filter(_.getLong(0) == 1L)
      assert(u1.exists(r => r.getLong(3) == 2 && r.getDouble(4) == 3.0 &&
          r.getString(5) == "view"),  // first-touch rides the closed row
        s"gap-closed session missing: ${rows.mkString(";")}")
      assert(u1.exists(r => r.getLong(3) == 1 && r.getDouble(4) == 7.0 &&
          r.getString(5) == "click"),
        s"timeout-closed session missing: ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("dedupByKey drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "k")
    val q = StreamOps.dedupByKey(df, "k", "10 minutes")
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      mem.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"))
      q.processAllAvailable()
      val rows = spark.table("dedup_test").collect()
      assert(rows.map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("urlDedupStream keys on the shared batch canonicalization") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "url")
    val q = StreamOps.urlDedupStream(df, "10 minutes")
      .writeStream.format("memory").queryName("url_dedup_test").outputMode("append").start()
    try {
      // all three canonicalize to https://site.example.com/a → first kept;
      // ?page=2 is a DIFFERENT page and survives
      mem.addData(
        (ts(0), 1L, "HTTPS://www.site.example.com/a/"),
        (ts(1), 2L, "https://site.example.com/a?utm_source=x#frag"),
        (ts(2), 3L, "https://site.example.com/a"),
        (ts(3), 4L, "https://site.example.com/a?page=2&utm_source=x"))
      q.processAllAvailable()
      val rows = spark.table("url_dedup_test").collect()
      assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 4L),
        s"expected first-winner per canon key, got ${rows.mkString(";")}")
      assert(rows.find(_.getLong(1) == 4L).get.getString(3) ==
        "https://site.example.com/a?page=2")
    } finally q.stop()
  }

  test("sourceMixMonitor reports per-window per-source doc/token counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val df = mem.toDF().toDF("ts", "source", "ntok")
    val q = StreamOps.sourceMixMonitor(df, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("mix_mon_test").outputMode("append").start()
    try {
      mem.addData((ts(0), "web", 10L), (ts(1), "web", 20L), (ts(2), "book", 5L))
      q.processAllAvailable()
      mem.addData((ts(60), "web", 1L)) // advance watermark, close window
      q.processAllAvailable()
      val rows = spark.table("mix_mon_test").collect()
      val web = rows.find(r => r.getString(2) == "web" && r.getLong(3) == 2)
      assert(web.isDefined, s"closed web window: ${rows.mkString(";")}")
      assert(web.get.getLong(4) == 30L)
      assert(rows.exists(r => r.getString(2) == "book" && r.getLong(4) == 5L))
    } finally q.stop()
  }

  test("velocityMonitor flags users over the per-window budget") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = StreamOps.velocityMonitor(df, maxPerWindow = 2, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("velocity_test").outputMode("append").start()
    try {
      // base ts is NOT window-aligned (22:13:20): minutes 0 and 1 share
      // the [22:10, 22:15) window, minute 2 would not
      mem.addData((ts(0), 1L), (ts(1), 1L), (ts(1), 1L), (ts(1), 2L))
      q.processAllAvailable()
      mem.addData((ts(60), 9L))
      q.processAllAvailable()
      val rows = spark.table("velocity_test").collect()
      val u1 = rows.find(r => r.getLong(2) == 1L)
      val u2 = rows.find(r => r.getLong(2) == 2L)
      assert(u1.exists(r => r.getLong(3) == 3 && r.getInt(4) == 1),
        s"user 1 over limit: ${rows.mkString(";")}")
      assert(u2.exists(r => r.getLong(3) == 1 && r.getInt(4) == 0))
    } finally q.stop()
  }
}
