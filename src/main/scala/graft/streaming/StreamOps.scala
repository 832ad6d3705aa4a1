package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming slice. The reference has NO streaming surface
  * (SURVEY §2.9 — temporal composites are its unimplemented roadmap
  * Phase 7), so this package is pure extension: the streaming duals of
  * the batch `graft.ext.Events` operators, built on watermarks +
  * event-time windows so they run identically over `readStream` sources
  * at cluster scale (state store per key, late data dropped past the
  * watermark).
  *
  * All transforms take a DataFrame with an event-time `ts: Timestamp`
  * column and are source-agnostic: bind them to `readStream` (kafka,
  * files) in production or `MemoryStream` in tests — the unit specs
  * drive them through an actual streaming query with incremental
  * batches.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type (dual of E2). */
  def tumblingAgg(events: DataFrame,
                  windowDur: String = "5 minutes",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Event-time sessionization per user with a 30-min gap (dual of E1),
    * via `session_window` — Spark merges overlapping session state per
    * key; the watermark bounds state size.
    */
  def sessionAgg(events: DataFrame,
                 gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming dedup on a key with watermarked state (the streaming tier
    * of the dedup stack: exact-key within the watermark horizon).
    */
  def dedupByKey(events: DataFrame, keyCol: String,
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Per-window source-mixture monitor (streaming dual of W1): doc and
    * token counts per (window, source) — the live data card a streaming
    * ingest pipeline watches to catch a source going dark or flooding.
    * Shares are one division downstream of the sink; emitting raw
    * counts keeps the agg a single watermarked window state per
    * (window, source) key.
    */
  def sourceMixMonitor(docs: DataFrame,
                       windowDur: String = "5 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("source"), col("n_docs"), col("n_tokens"))

  /** Per-window activity velocity limit (streaming tier of E9): event
    * counts per (window, user) with a threshold flag — the bot/abuse
    * rate limiter. A z-score needs population moments (batch E9's job);
    * the streaming stage flags against a FIXED velocity budget, which
    * is what production rate limiters do — state stays one counter per
    * (window, user) key, bounded by the watermark.
    */
  def velocityMonitor(events: DataFrame,
                      maxPerWindow: Long,
                      windowDur: String = "5 minutes",
                      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("user_id"), col("n_events"),
        (col("n_events") > maxPerWindow).cast("int").as("over_limit"))

  /** Streaming URL-canonicalization dedup (dual of batch D16): each doc
    * keyed by `graft.ext.Dedup.canonicalUrl` — the SAME expression the
    * batch dedup groups on, so "same page" cannot drift between tiers —
    * then first-winner-kept within the watermark horizon. This is the
    * per-snapshot dedup CCNet runs at ingest; the batch pass remains the
    * cross-snapshot authority (streaming state cannot hold the full
    * corpus, the watermark bounds it).
    */
  def urlDedupStream(docs: DataFrame,
                     watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("canon_url", graft.ext.Dedup.canonicalUrl(col("url")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canon_url")

  /** Streaming HLL register build (streaming tier of batch E31): per
    * event-time window, the distinct-user HLL-256 register relation
    * `(window, event_type, bucket, rho)` — the IDENTICAL md5/bin chain
    * [[graft.ext.Sketch.registers]] computes in batch (spec-pinned
    * row-for-row), so a windowed stream register and a batch backfill
    * register can never disagree. Append mode emits each register at
    * watermark close; consecutive windows (or stream vs batch shards)
    * roll up by register-wise MAX — the sketch's merge law — which is
    * exactly why a sketch, not an exact distinct, is the streaming
    * cardinality primitive: state is ≤ 256·|types| registers per open
    * window, independent of user cardinality, where
    * `dropDuplicatesWithinWatermark`-style exact counting holds one
    * state row PER DISTINCT USER in the horizon.
    */
  def hllRegisterStream(events: DataFrame, windowDur: String = "1 hour",
                        watermark: String = "10 minutes"): DataFrame =
    graft.ext.Sketch.withRegisterCoords(events)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"), col("bucket"))
      .agg(max("rho").as("rho"))

  /** Streaming CMS cell build (streaming tier of batch T35): per
    * event-time window, the Count-Min cell table
    * `(window, r, bucket, cell)` over the documents' token stream —
    * the IDENTICAL md5-slice coordinates batch
    * [[graft.ext.Sketch.cmsCellsOf]] uses (spec-pinned cell-for-cell),
    * so a windowed stream sketch and a batch backfill can never
    * disagree. Append mode emits each cell at watermark close;
    * windows (or stream vs batch shards) roll up by cell-wise ADD —
    * the CMS merge law, dual to the HLL register stream's max-merge.
    * The per-occurrence explode feeds a map-side-combinable count
    * whose key domain is ≤ d·w = 4096 per open window — the exchange
    * carries cells, not tokens (the batch vocab-grain collapse is
    * unnecessary here because the cell domain is already bounded).
    */
  def cmsCellStream(docs: DataFrame, windowDur: String = "1 hour",
                    watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
      .select(col("ts"), explode(graft.ext.Sketch.cmsCoordsOf(col("tok"))).as("rb"))
      .groupBy(window(col("ts"), windowDur),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))

  /** Streaming KMV bottom-k sketch build (streaming tier of batch D23's
    * per-source sketch — completes the sketch tier's streaming triad:
    * HLL registers max-merge, CMS cells add, KMV bottom-k-of-union).
    * Per (event-time window, source), maintains the k smallest DISTINCT
    * 56-bit md5(text) prefixes via `flatMapGroupsWithState`: state per
    * open key is ONE sorted array of ≤ k longs REGARDLESS of stream
    * size — the same bounded-state story as the register/cell streams,
    * and the property an exact distinct-set build fundamentally lacks.
    * Each micro-batch folds in by the bottom-k-of-union merge law
    * SketchSpec pins for the batch sketch; one row per (window, source)
    * emits at watermark close: `(window_start_ms, source, hs)`.
    *
    * The hash chain is [[graft.ext.Sketch.kmvHash]] — IDENTICAL to the
    * batch build's, so a windowed stream sketch and a batch backfill
    * can never disagree (spec-pinned sketch-for-sketch). Windows align
    * to the epoch grid like Spark's `window()`. Downstream pair-Jaccard
    * estimation stays the batch authority ([[graft.ext.Sketch.kmvOverlap]]);
    * the stream ships the mergeable ≤ k-row artifact per source per
    * window — "ship the sketch, not the corpus" at ingest time.
    */
  /** Epoch-floor window-start assignment, identical to Spark's
    * `window(col, dur)` bucketing for ANY timestamp including pre-1970
    * (negative epoch millis): floorDiv rounds toward negative infinity
    * where `/` truncates toward zero and would misalign negative
    * epochs by one window (r18 ADVICE). Pure; spec-pinned.
    */
  private[graft] def windowStartMs(epochMs: Long, windowMs: Long): Long =
    Math.floorDiv(epochMs, windowMs) * windowMs

  def kmvBottomKStream(docs: DataFrame, k: Int = graft.ext.Sketch.KmvK,
                       windowMs: Long = 3600000L,
                       watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("source"),
        graft.ext.Sketch.kmvHash(col("text")).as("h"))
      .as[(java.sql.Timestamp, String, Long)]
    typed.groupByKey { case (t, src, _) =>
        (windowStartMs(t.getTime, windowMs), src) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Long, String), rows: Iterator[(java.sql.Timestamp, String, Long)],
         state: GroupState[KmvSketchState]) => {
          if (state.hasTimedOut) {
            // watermark passed the window end: the sketch is final
            val out = state.getOption.map(s => KmvSketchOut(key._1, key._2, s.hs))
            state.remove()
            out.iterator
          } else {
            // bottom-k of union: merging the batch's hashes into the
            // held bottom-k equals the bottom-k of all hashes seen —
            // the SketchSpec merge law, applied incrementally
            val merged = (state.getOption.map(_.hs).getOrElse(Seq.empty) ++
              rows.map(_._3)).distinct.sorted.take(k)
            state.update(KmvSketchState(merged))
            state.setTimeoutTimestamp(key._1 + windowMs)
            Iterator.empty
          }
        })
      .toDF()
  }

  /** Streaming MinHash near-dup ingest gate (streaming tier of batch
    * D3): each doc keyed by its FULL 16-minhash signature
    * ([[graft.ext.Dedup.minhashKey]] — the identical shingle/hash
    * chain and constants the batch pass groups on, computed as a
    * stateless per-row projection), then first-winner-kept within the
    * watermark horizon. Full-signature equality is the estimated-
    * Jaccard-1.0 class — the precision-first cut an ingest gate may
    * drop unverified; banded OR-matching and the verification join
    * remain the batch authority (streaming state cannot hold the
    * corpus; the watermark bounds it). State is one key per distinct
    * signature in the horizon, shuffled once on the dedup key.
    */
  def minhashDedupStream(docs: DataFrame,
                         watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("sig_key",
        graft.ext.Dedup.minhashKey(col("doc_id"), col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig_key")

  /** Streaming LM-perplexity ingest gate (streaming tier of batch T34,
    * the CCNet filter): documents arriving on the stream are scored
    * against a STATIC stupid-backoff trigram model trained once from
    * `trainDocs` via [[graft.ext.TextOps.sbModel]] — the IDENTICAL
    * count tables, hashes, and `round(−ln SB, 9)` chain the batch
    * scorer uses, so a document's mean NLL cannot drift between tiers.
    * Emits one row per (event-time window, doc) at watermark close:
    * trigram positions scored, backoff-level telemetry, mean NLL, and
    * the gate verdict `keep = mean ≤ threshold` (documents too short
    * to score pass with n_scored = 0 — the batch 'unscored' contract).
    *
    * Scale shape: the trigram explode and the five model joins are
    * stream-STATIC equi-joins — stateless, one micro-batch at a time,
    * against the persisted model relations; the only state is the
    * per-(window, doc) partial aggregate, bounded by the watermark
    * horizon. The model is bounded by the training corpus, not the
    * stream.
    */
  def perplexityGateStream(docs: DataFrame, trainDocs: DataFrame,
                           threshold: Double,
                           windowDur: String = "5 minutes",
                           watermark: String = "10 minutes"): DataFrame = {
    import graft.ext.TextOps
    val m = TextOps.sbModel(trainDocs)
    // explode_outer keeps <3-token docs in the stream (they must pass
    // the gate, not vanish); their null trigram scores as null and the
    // conditional aggregates below count them as unscored.
    val occ = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        explode_outer(TextOps.ngrams(TextOps.tokens(col("text")), 3)).as("g"))
      .select(Seq(col("doc_id"), col("ts"), col("g")) ++
        TextOps.sbKeyCols(col("g")): _*)
    val scored = TextOps.sbNll(occ, m)
    scored
      .groupBy(window(col("ts"), windowDur), col("doc_id"))
      .agg(
        sum(when(col("g").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("lvl") === 3L && col("g").isNotNull, 1L).otherwise(0L))
          .as("n_tri"),
        sum(when(col("lvl") === 2L && col("g").isNotNull, 1L).otherwise(0L))
          .as("n_bi"),
        sum(when(col("lvl") === 1L && col("g").isNotNull, 1L).otherwise(0L))
          .as("n_oov"),
        sum(when(col("g").isNotNull, col("nll").cast(DecimalType(20, 10))))
          .as("tot"))
      .select(col("window"), col("doc_id"), col("n_scored"), col("n_tri"),
        col("n_bi"), col("n_oov"),
        when(col("n_scored") > 0,
          round(col("tot").cast("double") / col("n_scored").cast("double"), 6))
          .otherwise(lit(0.0)).as("mean_nll"),
        (col("n_scored") === 0 ||
          col("tot").cast("double") / col("n_scored").cast("double")
            <= lit(threshold)).as("keep"))
  }

  /** Watermarked stream-stream INTERVAL join — the streaming dual of
    * the batch as-of/conversion-latency pair (E4/E15): each purchase
    * matches the clicks by the same user inside the trailing
    * `maxDelay` window, emitting the attribution row with its exact
    * click→purchase latency. This is the one core Structured Streaming
    * capability aggregations can't express (both sides are unbounded):
    * Spark buffers each side's state ONLY within watermark + the
    * time-range predicate — the state bound that makes the join run
    * forever at cluster scale — and joins per user_id partition, the
    * same key both sides shuffle on.
    */
  def conversionJoin(clicks: DataFrame, purchases: DataFrame,
                     maxDelay: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
        col("p_user") === col("c_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $maxDelay"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("click_ts"), col("purchase_ts"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("latency_ms"),
        col("value"))
  }

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * hand-rolled counterpart of [[sessionAgg]] for session logic
    * `session_window` can't express (per-user state machine with
    * event-time timeout). Emits a [[SessionOut]] row when a session
    * closes: either a later event arrives past the gap, or the
    * event-time watermark passes the open session's horizon. Each
    * closed session carries its ENTRY event type — the streaming dual
    * of the batch first-touch attribution (E21), so live acquisition
    * dashboards slice conversion by the same entry key the batch
    * report uses.
    */
  def sessionizeWithState(events: DataFrame,
                          gapMs: Long = 30L * 60 * 1000,
                          watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Double, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double, String)],
         state: GroupState[SessionState]) => {
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          if (state.hasTimedOut) {
            state.getOption.foreach(s =>
              out += SessionOut(user, s.start, s.end, s.n, s.sum, s.firstType))
            state.remove()
          } else {
            val sorted = rows.map { case (_, t, v, e) => (t.getTime, v, e) }
              .toSeq.sortBy(_._1)
            var cur = state.getOption
            sorted.foreach { case (t, v, e) =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + v, s.firstType))
                case Some(s) =>
                  out += SessionOut(user, s.start, s.end, s.n, s.sum, s.firstType)
                  cur = Some(SessionState(t, t, 1, v, e))
                case None =>
                  cur = Some(SessionState(t, t, 1, v, e))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
          }
          out.iterator
        })
      .toDF()
  }
}

/** Bottom-k state for [[StreamOps.kmvBottomKStream]] — at most k sorted
  * distinct hashes per open (window, source), by construction.
  */
final case class KmvSketchState(hs: Seq[Long])

/** Closed-window KMV sketch row for [[StreamOps.kmvBottomKStream]]. */
final case class KmvSketchOut(window_start_ms: Long, source: String,
                              hs: Seq[Long])

/** Open-session state for [[StreamOps.sessionizeWithState]]. */
final case class SessionState(start: Long, end: Long, n: Long, sum: Double,
                              firstType: String)

/** Closed-session output row (epoch ms bounds) with the E21-style
  * first-touch entry type.
  */
final case class SessionOut(user_id: Long, session_start_ms: Long,
                            session_end_ms: Long, n_events: Long, sum_value: Double,
                            first_type: String)
