package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / frame-sample implemented as
  * `mapPartitions` batch transforms (the Scala analog of `mapInPandas`).
  *
  * The actual image/audio codecs are NOT in this container, so the byte-
  * level "decode" is a clearly-marked deterministic fake — but the
  * Spark-side plumbing is real and is what matters at 100 TB: binary
  * payloads stay columnar, the transform is per-partition streaming (no
  * payload ever crosses to the driver), output schema is declared up
  * front, and feature vectors come back as fixed-length float arrays
  * ready for the `graft.ext.Similarity` operators.
  */
object Multimodal {

  /** Build a multimodal table from `documents`: payload = UTF-8 bytes of
    * the text (stand-in for image/audio bytes), modality derived from the
    * source id.
    */
  def table(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(lit("modality_"), col("source")).as("modality"),
        col("text").cast("binary").as("payload"))

  /** M1: payload metadata — pure column projection over the binary
    * column (length + derived fake dimensions), fully codegen'd and
    * SQL-expressible (oracle-checked).
    */
  def meta(s: SparkSession, dir: String): DataFrame =
    table(s, dir).select(
      col("doc_id"), col("modality"),
      length(col("payload")).as("byte_len"),
      (length(col("payload")) % 640 + 1).as("width"),
      (expr("length(payload) div 7") % 480 + 1).as("height"),
      (length(col("payload")) % 16 + 1).as("n_frames"))
      .orderBy("doc_id")

  val metaSql: String = """SELECT doc_id, concat('modality_', source) AS modality,
      strlen(text) AS byte_len,
      strlen(text) % 640 + 1 AS width,
      (strlen(text) // 7) % 480 + 1 AS height,
      strlen(text) % 16 + 1 AS n_frames
    FROM documents ORDER BY doc_id"""

  val FeatureBins = 16

  private val featureSchema = StructType(
    StructField("doc_id", LongType) +:
    StructField("byte_len", IntegerType) +:
    (0 until FeatureBins).map(i => StructField(s"f$i", FloatType)))

  /** M2: per-payload feature extraction via mapPartitions — iterates the
    * partition's binary payloads and emits a 16-bin normalized byte
    * histogram as the "embedding". STUB: a real deployment swaps
    * `fakeDecode` for an actual codec (JPEG decode, resample, model
    * forward pass); everything around it — partition-streaming iterator,
    * schema declaration, fixed-width float output — is the production
    * shape. Bins are emitted as scalar columns f0..f15 (not an array)
    * so downstream row-wise comparison tooling can sort on them; the
    * array view is one `array(f0..f15)` projection away.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    table(s, dir)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val bins = fakeDecode(payload)
          Row.fromSeq(id +: payload.length +: bins.toSeq)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[features]]. The 16-bin histogram bins on
    * `byte % 16`, which is exactly the LOW HEX NIBBLE of each byte — so
    * the oracle extracts the 2nd character of every hex pair of the
    * UTF-8 payload (one regexp_replace, no per-byte unnest) and counts
    * each hex digit via length-after-replace. Normalization is FLOAT /
    * FLOAT division, which DuckDB (like Spark's FloatType) evaluates in
    * IEEE-754 single precision, so cells are bit-equal to the
    * mapPartitions output and the full hash gate applies.
    */
  val featuresSql: String = {
    val fcols = (0 until FeatureBins).map { k =>
      val d = "0123456789ABCDEF" (k)
      s"""CASE WHEN len = 0 THEN CAST(0 AS FLOAT)
           ELSE CAST(strlen(low) - strlen(replace(low, '$d', '')) AS FLOAT) / CAST(len AS FLOAT) END AS f$k"""
    }.mkString(", ")
    s"""WITH b AS (
        SELECT doc_id, strlen(text) AS len,
               regexp_replace(hex(encode(text)), '.(.)', '\\1', 'g') AS low
        FROM documents)
      SELECT doc_id, CAST(len AS INTEGER) AS byte_len, $fcols
      FROM b ORDER BY doc_id"""
  }

  val MaxSampledFrames = 4

  /** M3: frame sampling — up to [[MaxSampledFrames]] evenly-spaced
    * frames per payload, each identified by its byte range and content
    * hash. The video analog of M1/M2: the payload is treated as
    * `n_frames` fixed-width byte frames (a real container would use the
    * codec's frame index; the byte-range arithmetic, even-spacing
    * policy, and per-frame hashing are the production shape). Fully
    * declarative — one `sequence`+`explode` per payload and a
    * codegen'd binary `substring`+`md5` per frame; payloads never
    * leave their partition and the output is one row per sampled
    * frame, ready for per-frame feature extraction or dedup.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    table(s, dir)
      .select(col("doc_id"), col("payload"),
        length(col("payload")).cast("long").as("len"))
      // a frame is ≥1 byte, so the frame count is capped by the payload
      // length (a 0-byte payload has no frames at all) — without the
      // clamp a ≤3-byte payload would emit an out-of-bounds final frame
      .filter(col("len") > 0)
      .withColumn("nf", least(col("len") % 16 + 1, col("len")))
      .withColumn("sn", least(col("nf"), lit(MaxSampledFrames.toLong)))
      .withColumn("w", expr("len div nf"))
      .select(col("doc_id"), col("payload"), col("nf"), col("sn"), col("w"),
        explode(expr("sequence(0L, sn - 1)")).as("frame_id"))
      .withColumn("frame_index", expr("(frame_id * nf) div sn"))
      .withColumn("frame_offset", col("frame_index") * col("w"))
      .select(col("doc_id"), col("frame_id"), col("frame_index"),
        col("frame_offset"), col("w").as("frame_bytes"),
        md5(expr("substring(payload, cast(frame_offset + 1 as int), cast(w as int))"))
          .as("frame_hash"))
      .orderBy("doc_id", "frame_id")

  /** DuckDB oracle for [[frameSample]] — same arithmetic over the text
    * (the corpus is ASCII, so char offsets == byte offsets; the verify
    * gate would catch any divergence).
    */
  val frameSampleSql: String = s"""WITH b AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
             LEAST(CAST(length(text) % 16 + 1 AS BIGINT), length(text)) AS nf
      FROM documents WHERE length(text) > 0),
    p AS (SELECT doc_id, text, nf, LEAST(nf, $MaxSampledFrames) AS sn,
             len // nf AS w FROM b),
    f AS (SELECT doc_id, text, nf, sn, w, unnest(range(0, sn)) AS frame_id FROM p)
    SELECT doc_id, frame_id, (frame_id * nf) // sn AS frame_index,
      ((frame_id * nf) // sn) * w AS frame_offset, w AS frame_bytes,
      md5(substring(text, CAST(((frame_id * nf) // sn) * w + 1 AS INT), CAST(w AS INT)))
        AS frame_hash
    FROM f ORDER BY doc_id, frame_id"""

  /** Low-nibble concentration above which a payload is flagged as
    * corrupt/degenerate (a healthy codec stream spreads nibble mass; a
    * zero-fill, truncation pad, or stuck sensor concentrates it).
    */
  val CorruptTopFrac = 0.25

  /** M4: payload corruption scan — the pre-decode integrity sweep of a
    * multimodal ingest pipeline: flags payloads whose byte distribution
    * is degenerate (one low-nibble value dominating, or an empty
    * payload) BEFORE any codec spends time on them. Fully declarative —
    * the 16-bin low-nibble histogram is computed by hex-string algebra
    * (hex → keep every pair's 2nd char → per-digit occurrence counts by
    * length-after-replace), all codegen'd string ops; the flags are
    * ratios of exact integer counts through one IEEE division. Scales
    * as a pure projection: no shuffle, no UDF, payloads never leave
    * their partition.
    */
  def corruptionScan(s: SparkSession, dir: String): DataFrame =
    corruptionScanFrom(table(s, dir))

  /** [[corruptionScan]] over an explicit `(doc_id, modality, payload)`
    * relation — the spec drives known byte patterns through it.
    */
  def corruptionScanFrom(tbl: DataFrame): DataFrame = {
    val low = regexp_replace(hex(col("payload")), ".(.)", "$1")
    val counts = (0 until FeatureBins).map { k =>
      val d = "0123456789ABCDEF"(k).toString
      (length(low) - length(regexp_replace(low, d, ""))).as(s"c$k")
    }
    val base = tbl.select(
      col("doc_id") +: col("modality") +:
        length(col("payload")).cast("long").as("byte_len") +: counts: _*)
    val cs = (0 until FeatureBins).map(k => col(s"c$k"))
    val top = greatest(cs: _*)
    base.select(
      col("doc_id"), col("modality"), col("byte_len"),
      top.cast("long").as("top_nibble"),
      cs.map(c => (c > 0).cast("long")).reduce(_ + _).as("n_distinct_nibbles"),
      when(col("byte_len") === 0, lit(1.0))
        .otherwise(round(top.cast("double") /
          col("byte_len").cast("double"), 6)).as("top_nibble_frac"))
      .withColumn("corrupt",
        (col("byte_len") === 0 || col("top_nibble_frac") > CorruptTopFrac).cast("int"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[corruptionScan]] — the identical hex-algebra
    * histogram over the UTF-8 text bytes.
    */
  val corruptionScanSql: String = {
    val cdefs = (0 until FeatureBins).map { k =>
      val d = "0123456789ABCDEF"(k)
      s"strlen(low) - strlen(replace(low, '$d', '')) AS c$k"
    }.mkString(", ")
    val cs = (0 until FeatureBins).map(k => s"c$k")
    val top = s"GREATEST(${cs.mkString(", ")})"
    val distinct = cs.map(c => s"CAST($c > 0 AS BIGINT)").mkString(" + ")
    s"""WITH b AS (
        SELECT doc_id, concat('modality_', source) AS modality,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               regexp_replace(hex(encode(text)), '.(.)', '\\1', 'g') AS low
        FROM documents),
      c AS (SELECT doc_id, modality, byte_len, $cdefs FROM b),
      f AS (
        SELECT doc_id, modality, byte_len,
          CAST($top AS BIGINT) AS top_nibble,
          $distinct AS n_distinct_nibbles,
          CASE WHEN byte_len = 0 THEN 1.0
               ELSE ROUND(CAST($top AS DOUBLE) / CAST(byte_len AS DOUBLE), 6)
          END AS top_nibble_frac
        FROM c)
      SELECT *, CAST(byte_len = 0 OR top_nibble_frac > $CorruptTopFrac AS INT) AS corrupt
      FROM f ORDER BY doc_id"""
  }

  /** Low-entropy threshold (nats over the 16-nibble alphabet; max is
    * ln 16 ≈ 2.77). Constant-byte payloads score 0; natural text sits
    * near 2.4-2.6 — the gap is the signal.
    */
  val LowEntropy = 1.0

  /** M5: payload nibble entropy — Shannon entropy of each payload's
    * low-nibble distribution, the compression-ratio proxy that flags
    * blank/constant/truncated media BEFORE an expensive decode (the
    * dual of M4: M4 catches a dominating symbol, M5 catches the whole
    * distribution collapsing). Same hex-algebra histogram as M4 — no
    * UDF, stays in codegen.
    *
    * Determinism (transcendental tier): each term's log is stated as
    * ln(L/c) of two exact integers widened to double — computed once
    * per (doc, nibble), `round(…, 9)` immediately (kills the 1-ulp
    * libm divergence), multiplied by the exact ratio c/L, and the ≤16
    * per-doc terms accumulate in exact DECIMAL with one final round at
    * the comparison boundary. Zero-count nibbles contribute exactly 0
    * (the p→0 limit) and never reach the log; empty payloads report
    * entropy 0 and flag low.
    *
    * Scale shape: a pure per-row projection (the 16 counts + 16 terms
    * fold inside one codegen stage) — no shuffle at all until the
    * final presentation sort.
    */
  def payloadEntropy(s: SparkSession, dir: String): DataFrame =
    payloadEntropyFrom(table(s, dir))

  /** [[payloadEntropy]] over an explicit `(doc_id, modality, payload)`
    * relation — the spec drives constant and uniform payloads through
    * it.
    */
  def payloadEntropyFrom(tbl: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val low = regexp_replace(hex(col("payload")), ".(.)", "$1")
    val counts = (0 until FeatureBins).map { k =>
      val d = "0123456789ABCDEF"(k).toString
      (length(low) - length(regexp_replace(low, d, ""))).as(s"c$k")
    }
    val base = tbl.select(
      col("doc_id") +: col("modality") +:
        length(col("payload")).cast("long").as("byte_len") +: counts: _*)
    val terms = (0 until FeatureBins).map { k =>
      val c = col(s"c$k").cast("double")
      val l = col("byte_len").cast("double")
      when(col(s"c$k") > 0,
        ((c / l) * round(log(l / c), 9)).cast(DecimalType(20, 10)))
        .otherwise(lit(0).cast(DecimalType(20, 10)))
    }
    base.select(col("doc_id"), col("modality"), col("byte_len"),
        when(col("byte_len") === 0, lit(0.0))
          .otherwise(round(terms.reduce(_ + _).cast("double"), 6))
          .as("nibble_entropy"))
      .withColumn("low_entropy", (col("nibble_entropy") < LowEntropy).cast("int"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[payloadEntropy]] — the identical hex-algebra
    * histogram and term chain over the UTF-8 text bytes.
    */
  val payloadEntropySql: String = {
    val cdefs = (0 until FeatureBins).map { k =>
      val d = "0123456789ABCDEF"(k)
      s"strlen(low) - strlen(replace(low, '$d', '')) AS c$k"
    }.mkString(", ")
    val terms = (0 until FeatureBins).map { k =>
      s"""CASE WHEN c$k > 0 THEN CAST((CAST(c$k AS DOUBLE) / CAST(byte_len AS DOUBLE)) *
        ROUND(ln(CAST(byte_len AS DOUBLE) / CAST(c$k AS DOUBLE)), 9) AS DECIMAL(20,10))
        ELSE CAST(0 AS DECIMAL(20,10)) END"""
    }.mkString(" + ")
    s"""WITH b AS (
        SELECT doc_id, concat('modality_', source) AS modality,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               regexp_replace(hex(encode(text)), '.(.)', '\\1', 'g') AS low
        FROM documents),
      c AS (SELECT doc_id, modality, byte_len, $cdefs FROM b),
      e AS (
        SELECT doc_id, modality, byte_len,
          CASE WHEN byte_len = 0 THEN 0.0
               ELSE ROUND(CAST($terms AS DOUBLE), 6) END AS nibble_entropy
        FROM c)
      SELECT *, CAST(nibble_entropy < $LowEntropy AS INT) AS low_entropy
      FROM e ORDER BY doc_id"""
  }

  /** STUB decoder: 16-bin byte histogram normalized by length — a
    * deterministic placeholder for codec + feature model output.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureBins)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) % FeatureBins) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var b = 0
      while (b < FeatureBins) { bins(b) /= payload.length.toFloat; b += 1 }
    }
    bins
  }
}
