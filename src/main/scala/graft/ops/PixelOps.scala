package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-pixel scalar operators (SURVEY §2.2, P1-P15) as Catalyst column
  * expressions. All of these stay inside whole-stage codegen — the
  * reference's hand-fused single pass (dB + mask,
  * `/root/reference/src/core/processing/pipeline.rs:8-40`) is free here.
  *
  * Numeric-domain conventions (mirrors the reference):
  *  - raw intensities are Float (f32), reference narrowed to f32 in v0.2.7;
  *  - the dB / statistics domain is Double (f64);
  *  - band algebra runs in f32 like `ops.rs`;
  *  - quantization/LUT math runs in f64 (the reference uses f32 there; at
  *    u8/u16 integer granularity the results agree except for values that
  *    land within f32 rounding error of a .5 boundary — documented
  *    divergence, chosen so the distributed plan is deterministic).
  */
object PixelOps {

  /** Magnitude floor before log10 (`pipeline.rs:18`). */
  val MagnitudeFloor = 1e-10
  /** Validity threshold in dB (`pipeline.rs:22`). */
  val ValidDbThreshold = -50.0
  /** Zero-denominator guard of the band algebra (`ops.rs:16,29,41`). */
  val RatioGuard = 1e-10

  /** P1a: dB transform `10*log10(max(v, 1e-10))` (`pipeline.rs:8-40`). */
  def toDb(v: Column): Column =
    lit(10.0) * log10(greatest(v.cast("double"), lit(MagnitudeFloor)))

  /** P1b: validity mask `db > -50.0` (`pipeline.rs:22`). */
  def validMask(db: Column): Column = db > lit(ValidDbThreshold)

  /** P2: element-wise band sum in f32 (`ops.rs:4`). */
  def bandSum(a: Column, b: Column): Column =
    a.cast("float") + b.cast("float")

  /** P3: element-wise band difference in f32 (`ops.rs:7`). */
  def bandDiff(a: Column, b: Column): Column =
    a.cast("float") - b.cast("float")

  /** P4: guarded band ratio `if |b|>1e-10 then a/b else 0` (`ops.rs:10-19`).
    * Inputs narrow to f32 (reference domain); the division itself runs in
    * f64 — Spark's `Divide` only operates on Double/Decimal, so this is
    * made explicit and mirrored in the oracle SQL.
    */
  def bandRatio(a: Column, b: Column): Column = {
    val bf = b.cast("float")
    when(abs(bf) > lit(RatioGuard).cast("float"),
      a.cast("float").cast("double") / bf.cast("double"))
      .otherwise(lit(0.0))
  }

  /** P5: normalized difference `(a-b)/(a+b)` with zero guard (`ops.rs:22-32`).
    * Sum/difference in f32, final division in f64 (see [[bandRatio]]).
    */
  def bandNormalizedDiff(a: Column, b: Column): Column = {
    val af = a.cast("float"); val bf = b.cast("float")
    val denom = af + bf
    when(abs(denom) > lit(RatioGuard).cast("float"),
      (af - bf).cast("double") / denom.cast("double"))
      .otherwise(lit(0.0))
  }

  /** P6: log-ratio proxy — emits the LINEAR guarded ratio; the 10*log10
    * happens downstream in P1, i.e. log-ratio = toDb ∘ bandRatio
    * (`ops.rs:35-44`; semantics quirk preserved per SURVEY §7.5).
    */
  def bandLogRatio(a: Column, b: Column): Column = bandRatio(a, b)

  /** P7: clip + normalize + gamma + quantize (`autoscale.rs:437-447,644-656`).
    * `range = max(high-low, 1.0)` floor preserved (`autoscale.rs:429,564,729`);
    * the `as u16` cast truncates toward zero, hence `floor`.
    */
  def clipQuantize(db: Column, low: Column, high: Column, gamma: Column,
                   maxVal: Column): Column = {
    val range = greatest(high - low, lit(1.0))
    val clipped = least(greatest(db, low), high)
    val normalized = pow((clipped - low) / range, gamma)
    floor(least(greatest(normalized * maxVal, lit(0.0)), maxVal)).cast("int")
  }

  /** Quantize for invalid pixels → 0 (`autoscale.rs:444-446`). */
  def clipQuantizeMasked(db: Column, valid: Column, low: Column, high: Column,
                         gamma: Column, maxVal: Column): Column =
    when(valid, clipQuantize(db, low, high, gamma, maxVal)).otherwise(lit(0))

  /** P8: u16 → u8 min/max rescale (`autoscale.rs:348-364`). The U8 output
    * path is quantized to u16 first and then rescaled — a double
    * normalization the reference performs (`autoscale.rs:662-680`).
    * `mn`/`mx` are the image-level min/max of the u16 buffer.
    */
  def u16ToU8(q: Column, mn: Column, mx: Column): Column = {
    val scale = when(mx > mn, lit(255.0) / (mx.cast("double") - mn.cast("double")))
      .otherwise(lit(1.0))
    least(greatest(round((q.cast("double") - mn.cast("double")) * scale, 0), lit(0.0)),
      lit(255.0)).cast("int")
  }

  /** P9: channel gamma curve `round((v/255)^γ · 255)` for u8 v —
    * the reference precomputes this as a 256-entry LUT
    * (`synthetic_rgb.rs:14-29`); under codegen the plain `pow` is
    * equivalent (Catalyst constant-folds the constants).
    */
  def gammaU8(v: Column, gamma: Double): Column =
    least(greatest(round(pow(v.cast("double") / lit(255.0), lit(gamma)) * lit(255.0), 0),
      lit(0.0)), lit(255.0)).cast("int")

  /** P10: blue-channel ratio map (`synthetic_rgb.rs:31-51`):
    * b2==0 → 0; else blue = round(clamp((r/g)^0.1 · 255 · 0.24, 0, 255))
    * where r,g are the gamma-mapped channels of b1,b2.
    */
  def blueRatio(b1: Column, b2: Column): Column = {
    val r = gammaU8(b1, 0.7).cast("double")
    val g = gammaU8(b2, 0.9).cast("double")
    when(b2 === 0, lit(0))
      .otherwise(round(least(greatest(pow(r / g, lit(0.1)) * lit(255.0) * lit(0.24),
        lit(0.0)), lit(255.0)), 0).cast("int"))
  }

  /** P14: geotransform rewrite after resize+pad (`save.rs:70-87`):
    * pixel sizes scale by orig/final dims, origin shifts by the pad.
    * gt = [originX, pxW, rot0, originY, rot1, pxH].
    */
  def geotransformRewrite(gt: Seq[Column], cols: Column, rows: Column,
                          finalCols: Column, finalRows: Column,
                          padLeft: Column, padTop: Column): Seq[Column] = {
    val gt1 = gt(1) * (cols.cast("double") / finalCols.cast("double"))
    val gt5 = gt(5) * (rows.cast("double") / finalRows.cast("double"))
    val gt0 = gt(0) - padLeft.cast("double") * gt1
    val gt3 = gt(3) - padTop.cast("double") * gt5
    Seq(gt0, gt1, gt(2), gt3, gt(4), gt5)
  }

  /** P15: ProcessingOperation → sidecar polarization label
    * (`metadata.rs:40-113`), as a CASE cascade over an op-name column.
    * `hasVvVh`/`hasHhHv` describe the product's polarization set.
    */
  def polarizationLabel(op: Column, hasVvVh: Column, hasHhHv: Column,
                        joined: Column): Column = {
    def paired(prefix: String): Column =
      when(hasVvVh, lit(s"$prefix(VV, VH)"))
        .when(hasHhHv, lit(s"$prefix(HH, HV)"))
        .otherwise(joined)
    when(op === "sum", paired("SUM"))
      .when(op === "difference", paired("DIFF"))
      .when(op === "ratio", paired("RATIO"))
      .when(op === "normalized_diff", paired("NORM_DIFF"))
      .when(op === "log_ratio", paired("LOG_RATIO"))
      .when(op === "multiband_vv_vh", lit("MULTIBAND(VV, VH)"))
      .when(op === "multiband_hh_hv", lit("MULTIBAND(HH, HV)"))
      .otherwise(joined)
  }
}
