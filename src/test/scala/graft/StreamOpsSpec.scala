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

  test("batch parity: tumblingAgg and sessionAgg equal their batch runs for every closed window") {
    // The aggregation duals' contract, same shape as the conversionJoin
    // parity below: the SAME plan over (a) MemoryStream micro-batches
    // and (b) a static frame of the identical timeline agrees on every
    // window the watermark has CLOSED; the only batch-side extras are
    // windows still open when the stream was sampled (here: only the
    // sentinel's own window).
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 3.0),
      (ts(7), "click", 4.0), (ts(12), "view", 5.0))
    val sentinel = (ts(600), "sent", 0.0)
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingAgg(df, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumb_parity_test")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(sentinel) // watermark → ~t590: closes every data window
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3),
          r.getDouble(4))).toSet
      val streamed = canon(spark.table("tumb_parity_test").collect())
      val batch = canon(StreamOps.tumblingAgg(
        (events :+ sentinel).toDF("ts", "event_type", "value"),
        "5 minutes", "10 minutes").collect())
      assert(streamed.nonEmpty)
      assert((batch -- streamed).forall(_._3 == "sent"),
        s"batch-only windows must be the open sentinel window: ${batch -- streamed}")
      assert(streamed.subsetOf(batch), s"stream emitted a window batch lacks")
      assert(streamed == batch.filterNot(_._3 == "sent"))
    } finally q.stop()
    // sessionAgg, same protocol: 2 sessions for u1 (gap split), 1 for u2
    val sEvents = Seq((ts(0), 1L, 1.0), (ts(5), 1L, 2.0), (ts(120), 1L, 5.0),
      (ts(3), 2L, 7.0))
    val sSentinel = (ts(900), 9L, 0.0)
    val smem = MemoryStream[(Timestamp, Long, Double)]
    val sdf = smem.toDF().toDF("ts", "user_id", "value")
    val sq = StreamOps.sessionAgg(sdf, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_parity_test")
      .outputMode("append").start()
    try {
      smem.addData(sEvents: _*)
      sq.processAllAvailable()
      smem.addData(sSentinel)
      sq.processAllAvailable()
      def canonS(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      val streamed = canonS(spark.table("sess_parity_test").collect())
      val batch = canonS(StreamOps.sessionAgg(
        (sEvents :+ sSentinel).toDF("ts", "user_id", "value"),
        "30 minutes", "10 minutes").collect())
      assert(streamed.nonEmpty)
      assert((batch -- streamed).forall(_._3 == 9L),
        s"batch-only sessions must be the open sentinel session: ${batch -- streamed}")
      assert(streamed == batch.filterNot(_._3 == 9L))
      // the gap split is real: u1 has exactly 2 closed sessions
      assert(streamed.count(_._3 == 1L) == 2)
    } finally sq.stop()
  }

  test("E28 streaming-batch parity: conversionJoin equals its batch dual up to the watermark contract") {
    // The streaming tier's core contract: the SAME conversionJoin plan,
    // driven (a) incrementally over MemoryStreams and (b) once over
    // static frames of the identical timeline, must produce row-identical
    // attributions for every event the watermark admits — and the ONLY
    // divergence is the documented one: input later than the watermark is
    // dropped by the stream but visible to batch. Timeline:
    //   u1: click t0, purchase t10  → attributed (on-time) in BOTH
    //   u2: click t0, purchase t50  → outside the 30-min window in BOTH
    //   u3: purchase t20, no click  → no attribution in BOTH
    //   u4: purchase t40 arrives FIRST, click t35 arrives a batch later
    //       but within the watermark → attributed in BOTH (late-inside)
    //   u5: purchase t110 buffered, then the watermark advances to ~t590,
    //       THEN its click t100 arrives → dropped by the stream,
    //       attributed by batch (late-beyond)
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long, Double)]
    val cdf = clicks.toDF().toDF("ts", "user_id", "event_id")
    val pdf = purchases.toDF().toDF("ts", "user_id", "event_id", "value")
    val q = StreamOps.conversionJoin(cdf, pdf, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("e28_parity_test")
      .outputMode("append").start()
    val clickRows = Seq((ts(0), 1L, 100L), (ts(0), 2L, 200L),
      (ts(35), 4L, 400L), (ts(600), 8L, 900L), (ts(100), 5L, 500L))
    val purchaseRows = Seq((ts(10), 1L, 101L, 9.0), (ts(50), 2L, 201L, 5.0),
      (ts(20), 3L, 301L, 7.0), (ts(40), 4L, 401L, 4.0),
      (ts(110), 5L, 501L, 6.0), (ts(600), 9L, 901L, 0.0))
    try {
      clicks.addData(clickRows(0), clickRows(1))
      purchases.addData(purchaseRows(0), purchaseRows(1), purchaseRows(2),
        purchaseRows(3))
      q.processAllAvailable()
      clicks.addData(clickRows(2)) // u4's late-inside click
      q.processAllAvailable()
      purchases.addData(purchaseRows(4)) // u5's purchase, buffered
      q.processAllAvailable()
      clicks.addData(clickRows(3)); purchases.addData(purchaseRows(5))
      q.processAllAvailable() // watermark advances to ~t590
      clicks.addData(clickRows(4)) // u5's click, now BEYOND the watermark
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5), r.getDouble(6))).toSet
      val streamed = canon(spark.table("e28_parity_test").collect())
      // batch dual: same function, static frames, same full timeline
      // (withWatermark is a no-op outside streaming)
      val batch = canon(StreamOps.conversionJoin(
        clickRows.toDF("ts", "user_id", "event_id"),
        purchaseRows.toDF("ts", "user_id", "event_id", "value"),
        "30 minutes", "10 minutes").collect())
      val u1 = (1L, 101L, 100L, 10L * 60000, 9.0)
      val u4 = (4L, 401L, 400L, 5L * 60000, 4.0)
      val u5 = (5L, 501L, 500L, 10L * 60000, 6.0)
      assert(batch == Set(u1, u4, u5), s"batch dual off: $batch")
      assert(streamed == Set(u1, u4),
        s"stream must match batch minus the beyond-watermark row: $streamed")
      assert(batch -- streamed == Set(u5),
        "the ONLY divergence must be the beyond-watermark attribution")
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

  test("minhashDedupStream drops identical-signature docs, keeps distinct and short ones") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.minhashDedupStream(df, "10 minutes")
      .writeStream.format("memory").queryName("mh_dedup_test").outputMode("append").start()
    try {
      val long1 = "the quick brown fox jumps over the lazy dog again and again"
      val long2 = "an entirely different document about spark streaming state stores"
      mem.addData(
        (ts(0), "a", long1), (ts(1), "b", long1), // same signature — b dropped
        (ts(2), "c", long2),                      // distinct — kept
        (ts(3), "s1", "too short"), (ts(4), "s2", "too short")) // no shingles — both kept
      q.processAllAvailable()
      val kept = spark.table("mh_dedup_test").collect().map(_.getString(1)).sorted.toSeq
      assert(kept == Seq("a", "c", "s1", "s2"))
    } finally q.stop()
  }

  test("hllRegisterStream: closed-window registers equal the batch build row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamOps.hllRegisterStream(df, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("hll_reg_test").outputMode("append").start()
    try {
      // window [ts(0), ts(10)): 4 users across 2 types; user 7 repeats
      val inWindow = Seq((ts(0), 7L, "click"), (ts(1), 42L, "click"),
        (ts(2), 7L, "click"), (ts(3), 999999L, "view"), (ts(4), 123L, "view"))
      mem.addData(inWindow: _*)
      q.processAllAvailable()
      mem.addData((ts(60), 1L, "click")) // advance watermark, close the window
      q.processAllAvailable()
      // append mode: only the closed first window is emitted (the
      // advancer's window stays open), so every emitted row is ours
      val streamed = spark.table("hll_reg_test").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val batch = graft.ext.Sketch.registers(
          inWindow.toDF("ts", "user_id", "event_type")
            .select(col("user_id"), col("event_type")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("cmsCellStream: closed-window cells equal the batch cell build cell-for-cell") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamOps.cmsCellStream(df, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("cms_cell_test").outputMode("append").start()
    try {
      val texts = Seq("spark shuffles the big table", "the table joins spark",
        "shuffles shuffles shuffles")
      mem.addData(texts.zipWithIndex.map { case (t, i) => (ts(i.toLong), t) }: _*)
      q.processAllAvailable()
      mem.addData((ts(60), "advance")) // close the first window
      q.processAllAvailable()
      val streamed = spark.table("cms_cell_test").collect()
        .map(r => ((r.getInt(1), r.getLong(2)), r.getLong(3))).toMap
      val vocab = texts.toDF("text")
        .select(explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val batch = graft.ext.Sketch.cmsCellsOf(vocab).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("kmvBottomKStream: closed-window bottom-k equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val df = mem.toDF().toDF("ts", "source", "text")
    // small k so the 30-doc fixture exercises truncation; 10-min grid
    val q = StreamOps.kmvBottomKStream(df, k = 8, windowMs = 600000L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("kmv_stream_test")
      .outputMode("append").start()
    try {
      // 30 distinct texts across 2 sources, all inside ONE 10-min window
      // (ts(0) sits mid-grid; the next boundary is ~ts(6.7), so stay at
      // ts(0..6)); one duplicate text exercises the DISTINCT contract.
      // Split across two addData calls so the bottom-k-of-union merge
      // law is exercised across REAL micro-batches, not one fold.
      val rows = (1 to 30).map(i =>
        (ts(i % 7L), if (i % 3 == 0) "sa" else "sb", s"doc number $i"))
      mem.addData(rows.take(13): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(13) :+ ((ts(0), "sa", "doc number 3")): _*)
      q.processAllAvailable()
      mem.addData((ts(60), "sx", "advance")) // close the window
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream_test").collect()
        .map(r => (r.getString(1), r.getSeq[Long](2).toSeq)).toMap
      // batch authority: distinct kmvHash per source, sorted, take k
      val batch = rows.toDF("ts", "source", "text")
        .select(col("source"), graft.ext.Sketch.kmvHash(col("text")).as("h"))
        .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (s, hs) =>
          s -> hs.map(_._2).toSeq.sorted.take(8) }
      assert(streamed.keySet == Set("sa", "sb"))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.values.forall(_.length == 8)) // truncation exercised
    } finally q.stop()
  }

  test("minhashRowSig equals the corpus-grain batch signature on the real table") {
    // the can't-drift contract: the stateless per-row signature the
    // streaming gate keys on reproduces the batch D3 signature
    // row-for-row over sf0.001 (docs with >= 1 shingle)
    import graft.ext.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val perRow = docs
      .select(col("doc_id"), Dedup.minhashRowSig(col("text")).as("sig"))
      .filter(element_at(col("sig"), 1).isNotNull)
      .collect().map(r => r.get(0).toString -> r.getSeq[Long](1).toSeq).toMap
    val batch = Dedup.minhashSig(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.get(0).toString ->
        (1 until r.length).map(r.getLong).toSeq).toMap
    assert(perRow.keySet == batch.keySet)
    assert(perRow.keys.forall(k => perRow(k) == batch(k)))
  }

  test("perplexityGateStream scores against the shared batch model and gates on mean NLL") {
    // Same model corpus and scored texts as ExtSpec's T34 fixture, so
    // the expected means are the batch scorer's exact values — the
    // can't-drift contract between the tiers (shared sbModel/sbNll).
    implicit val sqlCtx = spark.sqlContext
    val train = Seq("a b c a b c").toDF("text")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.perplexityGateStream(df, train, threshold = 1.0)
      .writeStream.format("memory").queryName("ppl_gate_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(0), 8L, "x b c a"),        // lvl2 + lvl3 → mean ≈ 0.805, keep
        (ts(1), 16L, "q r s"),         // OOV → mean ≈ 3.624, drop
        (ts(2), 19L, "a b"),           // unscored → keep
        (ts(3), 20L, "a b c a b c"))   // fluent → mean ≈ 0.173, keep
      q.processAllAvailable()
      mem.addData((ts(600), 99L, "z z z z")) // advance watermark, close window
      q.processAllAvailable()
      val rows = spark.table("ppl_gate_test").collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getBoolean(7)))).toMap
      def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      def mean6(nlls: Seq[Double], n: Int) =
        (nlls.map(r9).sum / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val m8 = mean6(Seq(-math.log(0.4 * (2.0 / 2.0)), -math.log(1.0 / 2.0)), 2)
      val m16 = mean6(Seq(-math.log(0.16 * (1.0 / 6.0))), 1)
      val m20 = mean6(Seq(0.0, 0.0, -math.log(1.0 / 2.0), 0.0), 4)
      assert(rows(8L) == ((2L, 1L, 1L, 0L, m8, true)))
      assert(rows(16L) == ((1L, 0L, 0L, 1L, m16, false)))
      assert(rows(19L) == ((0L, 0L, 0L, 0L, 0.0, true)))
      assert(rows(20L) == ((4L, 4L, 0L, 0L, m20, true)))
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

  test("windowStartMs matches Spark's window() epoch-floor for pre-1970 timestamps too") {
    // r18 ADVICE: `t.getTime / windowMs * windowMs` truncates toward
    // zero, misaligning negative epochs by one window; floorDiv is the
    // window() semantics. Pin both sides against Spark's own bucketing.
    val windowMs = 3600000L
    val samples = Seq(
      -1L,                 // 1969-12-31T23:59:59.999 — the divergence case
      -windowMs,           // exact negative boundary
      -windowMs - 1L,
      0L, 1L, windowMs - 1L, windowMs,
      1700000123456L)
    val sparkStarts = samples.map { ms =>
      val df = Seq(new Timestamp(ms)).toDF("ts")
        .select(window(col("ts"), "1 hour").getField("start").as("start"))
      ms -> df.head().getTimestamp(0).getTime
    }.toMap
    samples.foreach { ms =>
      assert(StreamOps.windowStartMs(ms, windowMs) == sparkStarts(ms),
        s"window start diverges from Spark window() at epochMs=$ms")
      // and the old idiom really is wrong for negative non-boundary epochs
      if (ms < 0 && ms % windowMs != 0)
        assert(ms / windowMs * windowMs != sparkStarts(ms))
    }
  }
}
