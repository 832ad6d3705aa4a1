package graft.sink

import java.awt.image.{BufferedImage, DataBufferUShort}
import java.io.{ByteArrayOutputStream, File}
import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

import graft.meta.SafeMeta

/** Sinks (SURVEY §2.8 K1-K8): quantized image buffers → TIFF/JPEG via
  * javax.imageio (TIFF plugin ships with the JDK), plus the text
  * sidecars: world file (pixel-center convention), .prj, and the JSON
  * metadata sidecar with numeric-string inference.
  */
object Sinks {

  // --------------------------------------------------------------- images

  private def grayU8(img: Array[Int], w: Int, h: Int): BufferedImage = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = bi.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, img(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    bi
  }

  private def grayU16(img: Array[Int], w: Int, h: Int): BufferedImage = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    val buf = bi.getRaster.getDataBuffer.asInstanceOf[DataBufferUShort].getData
    var i = 0
    while (i < img.length) { buf(i) = (img(i) & 0xffff).toShort; i += 1 }
    bi
  }

  private def rgb(r: Array[Int], g: Array[Int], b: Array[Int], w: Int, h: Int): BufferedImage = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        bi.setRGB(x, y, ((r(i) & 0xff) << 16) | ((g(i) & 0xff) << 8) | (b(i) & 0xff))
        x += 1
      }
      y += 1
    }
    bi
  }

  /** K1: gray TIFF (u8 or u16). */
  def writeTiffGray(path: String, img: Array[Int], w: Int, h: Int, u16: Boolean): Unit = {
    val bi = if (u16) grayU16(img, w, h) else grayU8(img, w, h)
    require(ImageIO.write(bi, "TIFF", new File(path)), s"no TIFF writer for $path")
  }

  /** K2: two-band gray TIFF (multiband) as a multi-page TIFF — the
    * ImageIO analog of the reference's 2×GrayIndex-band GTiff
    * (`tiff.rs:34-78`).
    */
  def writeTiffMultiband(path: String, b1: Array[Int], b2: Array[Int],
                         w: Int, h: Int, u16: Boolean): Unit = {
    val writer = ImageIO.getImageWritersByFormatName("TIFF").next()
    val out = ImageIO.createImageOutputStream(new File(path))
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      Seq(b1, b2).foreach { band =>
        val bi = if (u16) grayU16(band, w, h) else grayU8(band, w, h)
        writer.writeToSequence(new javax.imageio.IIOImage(bi, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      out.close()
      writer.dispose()
    }
  }

  /** K3: gray or RGB JPEG (quality via default writer ~ reference uses
    * q=100; ImageIO default is high-quality baseline).
    */
  def writeJpegGray(path: String, img: Array[Int], w: Int, h: Int): Unit =
    require(ImageIO.write(grayU8(img, w, h), "JPEG", new File(path)), s"no JPEG writer for $path")

  def writeJpegRgb(path: String, r: Array[Int], g: Array[Int], b: Array[Int], w: Int, h: Int): Unit =
    require(ImageIO.write(rgb(r, g, b, w, h), "JPEG", new File(path)), s"no JPEG writer for $path")

  /** In-memory encode (the to-buffer API path, E3). */
  def encode(format: String, bi: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(bi, format, bos), s"no $format writer")
    bos.toByteArray
  }

  def bufferGrayU8(img: Array[Int], w: Int, h: Int): BufferedImage = grayU8(img, w, h)
  def bufferGrayU16(img: Array[Int], w: Int, h: Int): BufferedImage = grayU16(img, w, h)
  def bufferRgb(r: Array[Int], g: Array[Int], b: Array[Int], w: Int, h: Int): BufferedImage =
    rgb(r, g, b, w, h)

  // -------------------------------------------------------------- sidecars

  /** K4: world file — affine in PIXEL-CENTER convention
    * (`worldfile.rs:7-54`): A,D,B,E then C = gt0+0.5A+0.5B,
    * F = gt3+0.5D+0.5E; extension by image type (.jgw/.tfw/.wld).
    */
  def writeWorldFile(imagePath: String, gt: Array[Double]): String = {
    val ext = imagePath.split('.').lastOption.map(_.toLowerCase).getOrElse("")
    val worldExt = ext match {
      case "jpg" | "jpeg" => "jgw"
      case "png" => "pgw"
      case "tif" | "tiff" => "tfw"
      case e if e.nonEmpty => e.head.toString + "w"
      case _ => "wld"
    }
    val a = gt(1); val d = gt(4); val b = gt(2); val e = gt(5)
    val c = gt(0) + 0.5 * a + 0.5 * b
    val f = gt(3) + 0.5 * d + 0.5 * e
    val p = replaceExt(imagePath, worldExt)
    val body = Seq(a, d, b, e, c, f).map(v => f"$v%.12f").mkString("", "\n", "\n")
    Files.writeString(Paths.get(p), body)
    p
  }

  /** K5: .prj sidecar (raw WKT/EPSG). */
  def writePrj(imagePath: String, projection: String): String = {
    val p = replaceExt(imagePath, "prj")
    Files.writeString(Paths.get(p), projection)
    p
  }

  private def replaceExt(path: String, ext: String): String = {
    val i = path.lastIndexOf('.')
    (if (i < 0) path else path.substring(0, i)) + "." + ext
  }

  // ---------------------------------------------------------- JSON sidecar

  /** K6: metadata key/value extraction (subset of
    * `metadata.rs:20-229`): field pairs incl. the operation-rewritten
    * POLARIZATIONS label.
    */
  def metadataFields(meta: SafeMeta, polarizationLabel: String): Seq[(String, String)] = {
    def opt[A](k: String, v: Option[A]): Seq[(String, String)] =
      v.map(x => k -> x.toString).toSeq
    opt("PLATFORM", meta.platform) ++
      opt("INSTRUMENT", meta.instrument) ++
      opt("ACQUISITION_START", meta.acquisitionStart) ++
      opt("ACQUISITION_STOP", meta.acquisitionStop) ++
      opt("ORBIT_NUMBER", meta.orbitNumber) ++
      opt("PASS_DIRECTION", meta.passDirection) ++
      opt("PRODUCT_TYPE", meta.productType) ++
      Seq("POLARIZATIONS" -> polarizationLabel) ++
      opt("PRF", meta.prf) ++
      opt("RADAR_FREQUENCY", meta.radarFrequency) ++
      opt("RANGE_PIXEL_SPACING", meta.rangePixelSpacing) ++
      opt("AZIMUTH_PIXEL_SPACING", meta.azimuthPixelSpacing) ++
      opt("VELOCITY", meta.velocity) ++
      opt("SLANT_RANGE_NEAR", meta.slantRangeNear) ++
      opt("LINES", meta.lines) ++
      opt("SAMPLES", meta.samples)
  }

  /** K7: JSON sidecar — lowercase keys, numeric-string → JSON number
    * inference, geotransform as array, crs string
    * (`metadata.rs:232-294`).
    */
  def sidecarJson(fields: Seq[(String, String)], gt: Option[Array[Double]],
                  crs: Option[String], extras: Seq[(String, String)] = Nil): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def render(v: String): String =
      v.toDoubleOption match {
        case Some(d) if !d.isNaN && !d.isInfinity => {
          // integers render without decimal point, like serde_json
          if (d == math.rint(d) && math.abs(d) < 1e15 && !v.contains('.') && !v.toLowerCase.contains('e'))
            d.toLong.toString
          else d.toString
        }
        case _ => "\"" + esc(v) + "\""
      }
    val base = fields.map { case (k, v) => "\"" + esc(k.toLowerCase) + "\": " + render(v) }
    val gtPart = gt.map(g => "\"geotransform\": [" + g.mkString(", ") + "]").toSeq
    val crsPart = crs.filter(_.nonEmpty).map(c => "\"crs\": \"" + esc(c) + "\"").toSeq
    val extraPart = extras.map { case (k, v) => "\"" + esc(k.toLowerCase) + "\": \"" + esc(v) + "\"" }
    (base ++ gtPart ++ crsPart ++ extraPart).mkString("{\n  ", ",\n  ", "\n}")
  }

  def writeSidecar(imagePath: String, json: String): String = {
    val p = imagePath + ".json"
    Files.writeString(Paths.get(p), json)
    p
  }
}
