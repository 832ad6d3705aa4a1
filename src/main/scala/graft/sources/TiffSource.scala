package graft.sources

import java.io.ByteArrayInputStream
import javax.imageio.{ImageIO, ImageReader}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Real raster read path (SURVEY §2.1 S4/S5): a `binaryFile` scan +
  * `javax.imageio` TIFF decode inside `mapPartitions`, emitting the same
  * [[Tile]] schema as the synthetic source — so the whole downstream
  * engine (stats, CLAHE, quantize, sinks) runs unchanged on real files.
  *
  * Decimation pushdown (S6, the reference's 10× win,
  * `/root/reference/src/io/gdal.rs:145-177`): `decimate = d` is applied
  * AT DECODE via `ImageReadParam.setSourceSubsampling(d, d, 0, 0)` —
  * output pixel (y, x) reads source pixel (y·d, x·d), the same
  * nearest-pick semantics as [[RasterSource.scan]], and the reader never
  * materializes the full-resolution raster.
  *
  * Scale shape: one decode task per file (binaryFile rows stay on
  * executors; bytes never visit the driver), tiles re-partition
  * downstream. That matches the reference's per-product granularity; a
  * 1000-executor cluster parallelizes across products/bands, and tile
  * rows spread the pixel work after the first exchange.
  */
object TiffSource {

  /** Decode one TIFF (bytes) at 1/d resolution into row-major pixels.
    * Returns (height, width, pixels). `page` selects the image index in
    * a multi-page TIFF (our K2 multiband layout: page 0 = band 1).
    */
  def decode(bytes: Array[Byte], decimate: Int, page: Int): (Int, Int, Array[Float]) = {
    require(decimate >= 1, "decimate must be >= 1")
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw graft.model.GraftException.NotTiff("<payload>")
      val reader: ImageReader = readers.next()
      try {
        reader.setInput(iis)
        val param = reader.getDefaultReadParam
        param.setSourceSubsampling(decimate, decimate, 0, 0)
        val bi = reader.read(page, param)
        val h = bi.getHeight
        val w = bi.getWidth
        val raster = bi.getRaster
        val px = new Array[Float](h * w)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = raster.getSampleFloat(x, y, 0); x += 1 }
          y += 1
        }
        (h, w, px)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Slice a decoded band into [[Tile]] rows. */
  def tilesOf(productId: String, band: String, h: Int, w: Int,
              px: Array[Float], tileSize: Int): Seq[Tile] = {
    val tRows = (h + tileSize - 1) / tileSize
    val tCols = (w + tileSize - 1) / tileSize
    for {
      tr <- 0 until tRows
      tc <- 0 until tCols
    } yield {
      val y0 = tr * tileSize
      val x0 = tc * tileSize
      val th = math.min(tileSize, h - y0)
      val tw = math.min(tileSize, w - x0)
      val out = new Array[Float](th * tw)
      var y = 0
      while (y < th) {
        System.arraycopy(px, (y0 + y) * w + x0, out, y * tw, tw)
        y += 1
      }
      Tile(productId, band, tr, tc, th, tw, out)
    }
  }

  /** S4/S5: scan TIFF file(s) into a tiled Dataset. `pathGlob` is any
    * binaryFile-compatible path/glob; `band` labels the emitted tiles;
    * `page` picks the band page of a multiband (multi-page) TIFF.
    * product_id = file name without extension.
    */
  def scan(spark: SparkSession, pathGlob: String, band: String,
           decimate: Int = 1, page: Int = 0,
           tileSize: Int = RasterSource.DefaultTileSize): Dataset[Tile] = {
    import spark.implicits._
    val d = decimate
    val p = page
    val ts = tileSize
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          val pid = name.lastIndexOf('.') match {
            case -1 => name
            case i => name.substring(0, i)
          }
          val (h, w, px) = decode(bytes, d, p)
          tilesOf(pid, band, h, w, px, ts)
        }
      }
  }

  // -------------------------------------------------------- S3 discovery

  /** Classified measurement files of a SAFE product. */
  final case class PolFiles(vv: Option[String], vh: Option[String],
                            hh: Option[String], hv: Option[String]) {
    def get(band: String): Option[String] = band.toLowerCase match {
      case "vv" => vv
      case "vh" => vh
      case "hh" => hh
      case "hv" => hv
      case _ => None
    }
    def all: Seq[(String, String)] =
      Seq("vv" -> vv, "vh" -> vh, "hh" -> hh, "hv" -> hv)
        .collect { case (b, Some(p)) => (b, p) }
  }

  /** S3: polarization file discovery
    * (`/root/reference/src/io/sentinel1.rs:798-882` semantics):
    * scan `measurement/` for `*.tif[f]`, classify by case-insensitive
    * substring `vv`/`vh`/`hh`/`hv`, SKIP `_warped` intermediates, and —
    * for a single unlabeled file — fall back to the metadata-declared
    * polarization list (first RECOGNIZED entry claims the file — the
    * reference iterates all declared polarizations, so an unknown lead
    * entry like ["XX","VV"] still resolves to VV).
    *
    * Driver-side directory listing, exactly like Spark's own file-source
    * discovery; the per-file pixel work stays distributed.
    */
  def identifyPolarizationFiles(measurementDir: String,
                                declaredPols: Seq[String] = Nil): PolFiles = {
    val dir = new java.io.File(measurementDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .map(_.getAbsolutePath)
      .filter { p =>
        val lower = p.toLowerCase
        (lower.endsWith(".tif") || lower.endsWith(".tiff")) &&
          !lower.contains("_warped")
      }
      .sorted
    def find(tag: String): Option[String] =
      files.find(_.toLowerCase.split('/').last.contains(tag))
    var pf = PolFiles(find("vv"), find("vh"), find("hh"), find("hv"))
    // metadata fallback: one unlabeled file + a declared polarization
    if (pf.all.isEmpty && files.length == 1 && declaredPols.nonEmpty) {
      val f = Some(files.head)
      pf = declaredPols.map(_.toLowerCase).collectFirst {
        case "vv" => PolFiles(f, None, None, None)
        case "vh" => PolFiles(None, f, None, None)
        case "hh" => PolFiles(None, None, f, None)
        case "hv" => PolFiles(None, None, None, f)
      }.getOrElse(pf)
    }
    pf
  }

  /** Strict SAFE-style open over discovered files (S1 shape): dispatch
    * the polarization hint to band scans of the classified TIFFs.
    * Errors (missing band) throw — the lenient/batch wrapper catches.
    */
  def openProduct(spark: SparkSession, measurementDir: String, hint: String,
                  decimate: Int = 1, declaredPols: Seq[String] = Nil,
                  tileSize: Int = RasterSource.DefaultTileSize): Map[String, Dataset[Tile]] = {
    // the reference refuses a SAFE tree without its measurement dir
    // before any file scan (`sentinel1.rs:144-149`)
    if (!new java.io.File(measurementDir).isDirectory)
      throw graft.model.GraftException.MissingField("measurement directory")
    val pf = identifyPolarizationFiles(measurementDir, declaredPols)
    RasterSource.bandsFor(hint).map { band =>
      val path = pf.get(band).getOrElse(
        throw graft.model.GraftException.IncompleteDataPair(
          hint, pf.all.map(_._1).mkString(", ")))
      band -> scan(spark, path, band, decimate, page = 0, tileSize = tileSize)
    }.toMap
  }
}
