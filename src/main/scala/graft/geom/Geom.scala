package graft.geom

/** Geometric restructuring (SURVEY §2.7 R1-R4) — pure-Scala driver-side
  * implementations operating on the assembled OUTPUT image (which the
  * resize has already made small; the reference's own model: pushdown
  * decimation shrinks data at the scan, Lanczos polishes the output).
  */
object Geom {

  /** R1: resize dimension calc (`resize.rs:6-30`) — long side → target,
    * short side scaled proportionally (round half-up), no-op when target
    * exceeds the long side.
    */
  def resizeDims(cols: Int, rows: Int, target: Int): (Int, Int) = {
    val longSide = math.max(cols, rows)
    if (target > longSide) (cols, rows)
    else {
      val short = math.round(math.min(cols, rows).toDouble * target / longSide).toInt
      if (cols > rows) (target, short) else (short, target)
    }
  }

  private val LanczosA = 3

  private def lanczos3(x: Double): Double = {
    if (x == 0.0) 1.0
    else if (math.abs(x) >= LanczosA) 0.0
    else {
      val pix = math.Pi * x
      LanczosA * math.sin(pix) * math.sin(pix / LanczosA) / (pix * pix)
    }
  }

  /** One output position's convolution window: source range start +
    * normalized-at-use weights. Shared by the driver-side resize and the
    * distributed tile-level resize (Engine.resizeTilesLanczos) so both
    * produce bit-identical kernels.
    */
  final case class ConvWindow(lo: Int, weights: Array[Double], wsum: Double)
    extends Serializable

  /** Lanczos3 windows for every output position along one axis. */
  def convWindows(srcLen: Int, outLen: Int): Array[ConvWindow] = {
    val scale = srcLen.toDouble / outLen
    val filterScale = math.max(scale, 1.0)
    val support = LanczosA * filterScale
    Array.tabulate(outLen) { o =>
      val center = (o + 0.5) * scale
      val lo = math.max(0, math.floor(center - support).toInt)
      val hi = math.min(srcLen - 1, math.ceil(center + support).toInt)
      var wsum = 0.0
      val weights = new Array[Double](hi - lo + 1)
      var k = lo
      while (k <= hi) {
        val wt = lanczos3((k + 0.5 - center) / filterScale)
        weights(k - lo) = wt; wsum += wt; k += 1
      }
      ConvWindow(lo, weights, wsum)
    }
  }

  /** R2: separable Lanczos3 resample of a row-major image (u8/u16 domain
    * passed as Int). Matches the reference's algorithm class
    * (`fast_image_resize` Lanczos3, `resize.rs:32-89`); bit-exactness vs
    * the Rust crate is not gate-checked (documented divergence).
    */
  def resizeLanczos(src: Array[Int], srcW: Int, srcH: Int,
                    dstW: Int, dstH: Int, maxVal: Int): Array[Int] = {
    if (srcW == dstW && srcH == dstH) return src.clone()
    val tmp = new Array[Double](dstW * srcH)
    convolve1D(src.map(_.toDouble), srcW, srcH, dstW, horizontal = true, tmp)
    val tmp2 = new Array[Double](dstW * dstH)
    convolve1D(tmp, dstW, srcH, dstH, horizontal = false, tmp2)
    tmp2.map(v => math.max(0, math.min(maxVal, math.round(v).toInt)))
  }

  private def convolve1D(src: Array[Double], w: Int, h: Int, outLen: Int,
                         horizontal: Boolean, dst: Array[Double]): Unit = {
    val srcLen = if (horizontal) w else h
    val lines = if (horizontal) h else w
    val windows = convWindows(srcLen, outLen)
    java.util.stream.IntStream.range(0, outLen).parallel().forEach { o =>
      val cw = windows(o)
      val lo = cw.lo
      val hi = lo + cw.weights.length - 1
      var line = 0
      while (line < lines) {
        var acc = 0.0
        var k = lo
        while (k <= hi) {
          val v = if (horizontal) src(line * w + k) else src(k * w + line)
          acc += v * cw.weights(k - lo)
          k += 1
        }
        val outV = if (cw.wsum != 0.0) acc / cw.wsum else 0.0
        if (horizontal) dst(line * outLen + o) = outV
        else dst(o * w + line) = outV
        line += 1
      }
    }
  }

  /** R4: center the image in a zero square canvas
    * (`padding.rs:5-49`); returns (padded, dim, padLeft, padTop).
    */
  def padToSquare(src: Array[Int], w: Int, h: Int): (Array[Int], Int, Int, Int) = {
    if (w == h) return (src, w, 0, 0)
    val dim = math.max(w, h)
    val padLeft = (dim - w) / 2
    val padTop = (dim - h) / 2
    val out = new Array[Int](dim * dim)
    var y = 0
    while (y < h) {
      System.arraycopy(src, y * w, out, (y + padTop) * dim + padLeft, w)
      y += 1
    }
    (out, dim, padLeft, padTop)
  }

  /** R3+P14: full resize/pad orchestration with geotransform rewrite
    * (`resize.rs:91-236`, `save.rs:70-87`). Returns the final image,
    * dims, and the rewritten geotransform.
    */
  def resizeAndPad(src: Array[Int], w: Int, h: Int,
                   target: Option[Int], pad: Boolean, maxVal: Int,
                   gt: Option[Array[Double]]): (Array[Int], Int, Int, Option[Array[Double]]) = {
    val (nw, nh) = target.map(t => resizeDims(w, h, t)).getOrElse((w, h))
    val resized = if (nw == w && nh == h) src else resizeLanczos(src, w, h, nw, nh, maxVal)
    padAndRescaleGt(resized, nw, nh, w, h, pad, gt)
  }

  /** Pad + geotransform rewrite for an ALREADY-RESIZED image. `origW`/
    * `origH` are the pre-resize dims the geotransform refers to (the gt
    * rescale must use the true source-to-final ratio). Split out so the
    * distributed resize path (Engine.resizeTilesLanczos → assemble) can
    * finish identically to the driver-side path.
    */
  def padAndRescaleGt(resized: Array[Int], nw: Int, nh: Int,
                      origW: Int, origH: Int, pad: Boolean,
                      gt: Option[Array[Double]]): (Array[Int], Int, Int, Option[Array[Double]]) = {
    val (img, fw, fh, padLeft, padTop) =
      if (pad && nw != nh) {
        val (p, d, pl, pt) = padToSquare(resized, nw, nh)
        (p, d, d, pl, pt)
      } else (resized, nw, nh, 0, 0)
    val newGt = gt.map { g =>
      val g1 = g(1) * (origW.toDouble / fw)
      val g5 = g(5) * (origH.toDouble / fh)
      Array(g(0) - padLeft * g1, g1, g(2), g(3) - padTop * g5, g(4), g5)
    }
    (img, fw, fh, newGt)
  }
}
