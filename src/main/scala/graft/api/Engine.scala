package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.geom.Geom
import graft.meta.SafeMeta
import graft.model._
import graft.ops.PixelOps
import graft.sink.Sinks
import graft.sources.RasterSource
import graft.stats.HistStats

/** Result buffer of the in-memory API (E3,
  * `/root/reference/src/api/mod.rs:51-62`).
  */
final case class ProcessedImage(
    width: Int,
    height: Int,
    bitDepth: BitDepth,
    gray: Option[Array[Int]],
    rgb: Option[(Array[Int], Array[Int], Array[Int])],
    geotransform: Option[Array[Double]])

/** Per-product batch outcome (`api/mod.rs:452-457`). */
final case class BatchReport(processed: Int, skipped: Int, errors: Seq[(String, String)])

/** The engine's query lifecycle (E1-E3, SURVEY §3): params → lazy
  * DataFrame graph `scan(tiles) → P1 dB+mask → A1/A2 stats [job 1] →
  * broadcast params → P7 quantize / A4 CLAHE → [job 2] collect OUTPUT
  * image → R2/R4 resize+pad → K1-K8 sinks`.
  *
  * The two-job structure mirrors the reference's two passes over the
  * array; only the (already small) OUTPUT image is ever collected —
  * pixels at input scale stay distributed.
  */
object Engine {

  /** P1 over the relational pixel view. */
  def withDb(px: DataFrame): DataFrame = {
    val db = PixelOps.toDb(col("v"))
    px.withColumn("db", db).withColumn("valid", PixelOps.validMask(db))
  }

  /** A1-A3: strategy parameters from the single-pass typed Aggregators
    * (graft.stats.FastStats — two tiny jobs, no shuffle rows beyond the
    * mergeable buffers; the driver receives one stats row, the broadcast
    * side of the agg→projection pattern).
    */
  def strategyParams(px: DataFrame, strategy: AutoscaleStrategy): (Double, Double, Double) = {
    val st = graft.stats.FastStats.stats(px.filter(col("valid")).select(col("db")))
    graft.stats.FastStats.strategyParams(st, strategy.name)
  }

  /** P7 quantize to u16 domain (maxVal 255 or 65535). */
  def quantize(px: DataFrame, low: Double, high: Double, gamma: Double,
               maxVal: Double): DataFrame =
    px.select(col("y"), col("x"),
      PixelOps.clipQuantizeMasked(col("db"), col("valid"),
        lit(low), lit(high), lit(gamma), lit(maxVal)).as("q"))

  /** A4 CLAHE on a known-dims grid (generic production variant of the
    * fixture query in graft.enhance.Clahe; same reference semantics).
    */
  def clahe(px: DataFrame, rows: Int, cols: Int, low: Double, high: Double,
            maxVal: Double): DataFrame = {
    val s = px.sparkSession
    val tiles = graft.enhance.Clahe.Tiles
    val bins = graft.enhance.Clahe.NumBins
    val tileH = (rows + tiles - 1) / tiles
    val tileW = (cols + tiles - 1) / tiles
    val rng = math.max(high - low, 1.0)

    val p = px.withColumn("norm", when(col("valid"),
        (least(greatest(col("db"), lit(low)), lit(high)) - lit(low)) / lit(rng))
        .otherwise(lit(0.0)))
      .withColumn("bin",
        round(least(greatest(col("norm"), lit(0.0)), lit(1.0)) * lit((bins - 1).toDouble), 0).cast("int"))
      .withColumn("ty", expr(s"y div $tileH")).withColumn("tx", expr(s"x div $tileW"))

    val hist = p.filter(col("valid")).groupBy(col("ty"), col("tx"), col("bin"))
      .agg(count(lit(1)).as("h"))
    val tileIds = s.range(tiles).toDF("ty").crossJoin(s.range(tiles).toDF("tx"))
    val tp = p.groupBy(col("ty"), col("tx")).agg(count(lit(1)).as("tp"))
    val tdf = tileIds.join(tp, Seq("ty", "tx"), "left")
      .select(col("ty"), col("tx"), coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("ct", greatest(lit(graft.enhance.Clahe.ClipLimit) *
        (col("tp") / lit(bins.toDouble)), lit(1.0)))
    val excess = tdf.join(hist, Seq("ty", "tx"), "left")
      .groupBy(col("ty"), col("tx"))
      .agg(coalesce(sum(when(col("h") > col("ct"), col("h") - col("ct")).otherwise(lit(0.0))),
        lit(0.0)).as("excess"))
    val tinfo = tdf.join(excess, Seq("ty", "tx"))
      .withColumn("apb", floor(col("excess") / lit(bins.toDouble)))
      .withColumn("rem", round(col("excess") - col("apb") * lit(bins.toDouble), 0))
    val full = tinfo.crossJoin(s.range(bins).toDF("bin"))
      .join(hist, Seq("ty", "tx", "bin"), "left")
      .withColumn("hfin",
        coalesce(when(col("h") > col("ct"), floor(col("ct"))).otherwise(col("h")), lit(0.0)) +
          col("apb") + when(col("bin") < col("rem"), lit(1.0)).otherwise(lit(0.0)))
    val wT = Window.partitionBy("ty", "tx")
    val cdf = full.select(col("ty"), col("tx"), col("bin"),
      least(greatest(
        sum(col("hfin")).over(wT.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)) /
          greatest(sum(col("hfin")).over(wT), lit(1.0)), lit(0.0)), lit(1.0)).as("cdf"))
      .persist()

    def corner(n: String): DataFrame =
      cdf.select(col("ty").as(s"ty_$n"), col("tx").as(s"tx_$n"),
        col("bin").as(s"bin_$n"), col("cdf").as(s"c$n"))

    val top = tiles - 1
    val samp = p
      .withColumn("rf", col("y").cast("double") / lit(tileH.toDouble) - lit(0.5))
      .withColumn("cf", col("x").cast("double") / lit(tileW.toDouble) - lit(0.5))
      .withColumn("tyf", greatest(floor(col("rf")), lit(0.0)))
      .withColumn("txf", greatest(floor(col("cf")), lit(0.0)))
      .withColumn("dy", col("rf") - col("tyf"))
      .withColumn("dx", col("cf") - col("txf"))
      .withColumn("ty0", least(col("tyf"), lit(top.toDouble)).cast("long"))
      .withColumn("tx0", least(col("txf"), lit(top.toDouble)).cast("long"))
      .withColumn("ty1", least(col("tyf") + 1.0, lit(top.toDouble)).cast("long"))
      .withColumn("tx1", least(col("txf") + 1.0, lit(top.toDouble)).cast("long"))
      .join(broadcast(corner("00")),
        col("ty0") === col("ty_00") && col("tx0") === col("tx_00") && col("bin") === col("bin_00"))
      .join(broadcast(corner("01")),
        col("ty0") === col("ty_01") && col("tx1") === col("tx_01") && col("bin") === col("bin_01"))
      .join(broadcast(corner("10")),
        col("ty1") === col("ty_10") && col("tx0") === col("tx_10") && col("bin") === col("bin_10"))
      .join(broadcast(corner("11")),
        col("ty1") === col("ty_11") && col("tx1") === col("tx_11") && col("bin") === col("bin_11"))

    val topI = col("c00") * (lit(1.0) - col("dx")) + col("c01") * col("dx")
    val botI = col("c10") * (lit(1.0) - col("dx")) + col("c11") * col("dx")
    val out = topI * (lit(1.0) - col("dy")) + botI * col("dy")
    samp.select(col("y"), col("x"),
      when(col("valid"), floor(least(greatest(out, lit(0.0)), lit(1.0)) * lit(maxVal)).cast("int"))
        .otherwise(lit(0)).as("q"))
  }

  /** P8: distributed u16→u8 rescale (min/max agg + projection). */
  def rescaleU8(q: DataFrame): DataFrame = {
    val mm = q.agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
    q.crossJoin(broadcast(mm))
      .select(col("y"), col("x"), PixelOps.u16ToU8(col("q"), col("mn"), col("mx")).as("q"))
  }

  /** Collect the (already output-sized) quantized grid into a row-major
    * array — the ONLY pixel collect in the lifecycle.
    */
  def assemble(q: DataFrame, rows: Int, cols: Int): Array[Int] = {
    val out = new Array[Int](rows * cols)
    q.select(col("y").cast("long"), col("x").cast("long"), col("q")).collect().foreach { r =>
      out(r.getLong(0).toInt * cols + r.getLong(1).toInt) = r.getInt(2)
    }
    out
  }

  /** Single-band pipeline (K9): scan → dB → strategy → quantize/CLAHE →
    * [u8 rescale] → assemble → resize/pad.
    */
  def processBand(spark: SparkSession, productId: String, band: String,
                  rows: Int, cols: Int, params: ProcessingParams,
                  decimate: Int = 1,
                  gt: Option[Array[Double]] = None): ProcessedImage = {
    val outRows = (rows + decimate - 1) / decimate
    val outCols = (cols + decimate - 1) / decimate
    val tiles = RasterSource.scan(spark, productId, band, rows, cols, decimate)
    val px = withDb(RasterSource.pixelView(tiles))
    val maxVal = params.bitDepth.maxVal
    val quant = params.autoscale match {
      case AutoscaleStrategy.Clahe =>
        val (low, high, _) = strategyParams(px, AutoscaleStrategy.Clahe)
        clahe(px, outRows, outCols, low, high, maxVal)
      case strat =>
        val (low, high, gamma) = strategyParams(px, strat)
        quantize(px, low, high, gamma, maxVal)
    }
    // U8 output is quantized to the u16 path first then min-max rescaled
    // (the reference's double normalization, autoscale.rs:662-680) — here
    // maxVal already matches bit depth, then u8 gets the extra rescale.
    val finalQ = if (params.bitDepth == BitDepth.U8) rescaleU8(quant) else quant
    val img = assemble(finalQ, outRows, outCols)
    val (resized, fw, fh, newGt) = Geom.resizeAndPad(
      img, outCols, outRows, params.targetSize, params.pad,
      maxVal.toInt, gt)
    ProcessedImage(fw, fh, params.bitDepth, Some(resized), None, newGt)
  }

  // ------------------------------------------------------------- synRGB

  /** Tamed band-specific u8 autoscale for synRGB
    * (`autoscale.rs:710-742`): co-pol low = min(p02,p05), cross-pol low =
    * p05; high = p99; linear map to u8.
    */
  def tamedSynrgbU8(px: DataFrame, isCopol: Boolean): DataFrame = {
    val st = graft.stats.FastStats.stats(px.filter(col("valid")).select(col("db")))
    if (st.n == 0)
      return px.select(col("y"), col("x"), lit(0).as("q"))
    val p02 = st.percentiles("p02"); val p05 = st.percentiles("p05")
    val p99 = st.percentiles("p99")
    val low = if (isCopol) math.min(p02, p05) else p05
    val range = math.max(p99 - low, 1.0)
    px.select(col("y"), col("x"),
      when(col("valid"),
        least(greatest(
          ((least(greatest(col("db"), lit(low)), lit(p99)) - lit(low)) / lit(range)) * lit(255.0),
          lit(0.0)), lit(255.0)).cast("int"))
        .otherwise(lit(0)).as("q"))
  }

  /** Default synRGB compose (P9-P11, `synthetic_rgb.rs:14-66`) on
    * assembled u8 bands (output-size, driver-side LUTs like the
    * reference).
    */
  def composeSynRgb(b1: Array[Int], b2: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
    val lutR = Array.tabulate(256)(v =>
      math.min(255, math.max(0, math.round(math.pow(v / 255.0, 0.7) * 255.0))).toInt)
    val lutG = Array.tabulate(256)(v =>
      math.min(255, math.max(0, math.round(math.pow(v / 255.0, 0.9) * 255.0))).toInt)
    val n = b1.length
    val r = new Array[Int](n); val g = new Array[Int](n); val b = new Array[Int](n)
    var i = 0
    while (i < n) {
      r(i) = lutR(b1(i) & 0xff)
      g(i) = lutG(b2(i) & 0xff)
      b(i) = if (b2(i) == 0) 0
      else {
        val ratio = r(i).toDouble / g(i).toDouble
        val v = math.pow(ratio, 0.1) * 255.0 * 0.24
        math.round(math.min(255.0, math.max(0.0, v))).toInt
      }
      i += 1
    }
    (r, g, b)
  }

  /** Two-band pipeline (K10): SEQUENTIAL staging — band 1's jobs run and
    * its intermediates drop before band 2 starts (bounded peak memory,
    * `save.rs:240-280`); synRGB composes on the assembled u8 outputs.
    */
  def processMultiband(spark: SparkSession, productId: String,
                       bands: (String, String), rows: Int, cols: Int,
                       params: ProcessingParams, decimate: Int = 1,
                       gt: Option[Array[Double]] = None): ProcessedImage = {
    val outRows = (rows + decimate - 1) / decimate
    val outCols = (cols + decimate - 1) / decimate
    def bandU8(band: String, isCopol: Boolean): Array[Int] = {
      val px = withDb(RasterSource.pixelView(
        RasterSource.scan(spark, productId, band, rows, cols, decimate)))
      val q = params.autoscale match {
        case AutoscaleStrategy.Tamed => tamedSynrgbU8(px, isCopol)
        case strat =>
          val (low, high, gamma) = strategyParams(px, strat)
          rescaleU8(quantize(px, low, high, gamma, 255.0))
      }
      assemble(q, outRows, outCols)
    }
    val b1 = bandU8(bands._1, isCopol = true)
    val b2 = bandU8(bands._2, isCopol = false)
    val (r, g, b) = composeSynRgb(b1, b2)
    def fit(a: Array[Int]) = Geom.resizeAndPad(a, outCols, outRows,
      params.targetSize, params.pad, 255, gt)
    val (rr, fw, fh, newGt) = fit(r)
    val (gg, _, _, _) = fit(g)
    val (bb, _, _, _) = fit(b)
    ProcessedImage(fw, fh, BitDepth.U8, None, Some((rr, gg, bb)), newGt)
  }

  // ------------------------------------------------------------ E1/E2 API

  /** E2: file-to-file with sidecars (`process_safe_to_path`,
    * `api/mod.rs:539-674`).
    */
  def processToPath(spark: SparkSession, productId: String, rows: Int, cols: Int,
                    outPath: String, params: ProcessingParams,
                    meta: SafeMeta = SafeMeta(), decimate: Int = 1): Unit = {
    val gt = meta.geotransform
    val polLabel = params.polarization match {
      case Polarization.Op(op) => s"${op.label.toUpperCase}(VV, VH)"
      case Polarization.Multiband => "MULTIBAND(VV, VH)"
      case p => p.name.toUpperCase
    }
    val img = params.polarization match {
      case Polarization.Multiband => processMultiband(
        spark, productId, ("vv", "vh"), rows, cols, params, decimate, gt)
      case Polarization.Op(op) =>
        // band algebra runs in the pixel view before the stats pass
        val a = withBandOp(spark, productId, op, rows, cols, decimate)
        val maxVal = params.bitDepth.maxVal
        val (low, high, gamma) = strategyParams(a, params.autoscale match {
          case AutoscaleStrategy.Clahe => AutoscaleStrategy.Standard
          case s => s
        })
        val outRows = (rows + decimate - 1) / decimate
        val outCols = (cols + decimate - 1) / decimate
        val q0 = quantize(a, low, high, gamma, maxVal)
        val q = if (params.bitDepth == BitDepth.U8) rescaleU8(q0) else q0
        val arr = assemble(q, outRows, outCols)
        val (rz, fw, fh, newGt) = Geom.resizeAndPad(arr, outCols, outRows,
          params.targetSize, params.pad, maxVal.toInt, gt)
        ProcessedImage(fw, fh, params.bitDepth, Some(rz), None, newGt)
      case p =>
        processBand(spark, productId, p.name, rows, cols, params, decimate, gt)
    }
    writeImage(outPath, img, params, meta, polLabel)
  }

  private def withBandOp(spark: SparkSession, productId: String,
                         op: PolarizationOperation, rows: Int, cols: Int,
                         decimate: Int): DataFrame = {
    val a = RasterSource.pixelView(RasterSource.scan(spark, productId, "vv", rows, cols, decimate))
      .withColumnRenamed("v", "va")
    val b = RasterSource.pixelView(RasterSource.scan(spark, productId, "vh", rows, cols, decimate))
      .withColumnRenamed("v", "vb").drop("product_id", "band")
    val j = a.join(b, Seq("y", "x"))
    val v = op match {
      case PolarizationOperation.Sum => PixelOps.bandSum(col("va"), col("vb"))
      case PolarizationOperation.Diff => PixelOps.bandDiff(col("va"), col("vb"))
      case PolarizationOperation.Ratio => PixelOps.bandRatio(col("va"), col("vb"))
      case PolarizationOperation.NDiff => PixelOps.bandNormalizedDiff(col("va"), col("vb"))
      case PolarizationOperation.LogRatio => PixelOps.bandLogRatio(col("va"), col("vb"))
    }
    withDb(j.select(col("y"), col("x"), v.as("v")))
  }

  private def writeImage(outPath: String, img: ProcessedImage,
                         params: ProcessingParams, meta: SafeMeta,
                         polLabel: String): Unit = {
    (params.format, img.rgb, img.gray) match {
      case (OutputFormat.Tiff, _, Some(gray)) =>
        Sinks.writeTiffGray(outPath, gray, img.width, img.height,
          params.bitDepth == BitDepth.U16)
      case (OutputFormat.Jpeg, Some((r, g, b)), _) =>
        Sinks.writeJpegRgb(outPath, r, g, b, img.width, img.height)
      case (OutputFormat.Jpeg, _, Some(gray)) =>
        Sinks.writeJpegGray(outPath, gray, img.width, img.height)
      case (OutputFormat.Tiff, Some((r, _, _)), _) =>
        Sinks.writeTiffGray(outPath, r, img.width, img.height, u16 = false)
      case _ => throw new IllegalStateException("no image data")
    }
    img.geotransform.foreach(Sinks.writeWorldFile(outPath, _))
    meta.crs.foreach(Sinks.writePrj(outPath, _))
    val json = Sinks.sidecarJson(Sinks.metadataFields(meta, polLabel),
      img.geotransform, meta.crs)
    Sinks.writeSidecar(outPath, json)
  }

  /** E2 batch: per-product error isolation + report
    * (`process_directory_to_path`, `api/mod.rs:474-536`).
    */
  def processDirectory(spark: SparkSession,
                       products: Seq[(String, Int, Int)], outDir: String,
                       params: ProcessingParams): BatchReport = {
    new java.io.File(outDir).mkdirs()
    var processed = 0
    val errors = scala.collection.mutable.ArrayBuffer[(String, String)]()
    products.foreach { case (id, rows, cols) =>
      try {
        val ext = params.format match {
          case OutputFormat.Tiff => "tiff"
          case OutputFormat.Jpeg => "jpg"
        }
        processToPath(spark, id, rows, cols, s"$outDir/$id.$ext", params)
        processed += 1
      } catch {
        case e: Exception => errors += (id -> String.valueOf(e.getMessage))
      }
    }
    BatchReport(processed, 0, errors.toSeq)
  }
}
