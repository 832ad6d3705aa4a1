package graft.meta

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.types._

/** Product metadata — the `SafeMetadata` struct re-expressed
  * (`/root/reference/src/io/sentinel1.rs:52-111`): fixed schema, values
  * extracted from manifest/annotation XML, plus the derived fields
  * (platform velocity = ‖mid orbit state vector‖, slant_range_near =
  * slantRangeTime·c/2).
  */
final case class SafeMeta(
    platform: Option[String] = None,
    instrument: Option[String] = None,
    acquisitionStart: Option[String] = None,
    acquisitionStop: Option[String] = None,
    orbitNumber: Option[Long] = None,
    passDirection: Option[String] = None,
    productType: Option[String] = None,
    polarizations: Seq[String] = Nil,
    prf: Option[Double] = None,
    radarFrequency: Option[Double] = None,
    rangePixelSpacing: Option[Double] = None,
    azimuthPixelSpacing: Option[Double] = None,
    velocity: Option[Double] = None,
    slantRangeNear: Option[Double] = None,
    lines: Option[Int] = None,
    samples: Option[Int] = None,
    geotransform: Option[Array[Double]] = None,
    crs: Option[String] = None)

object SafeMeta {

  val SpeedOfLight = 299792458.0

  /** The metadata schema as a Spark StructType (rides as a struct column
    * or broadcast alongside the tile DataFrame).
    */
  val schema: StructType = StructType(Seq(
    StructField("platform", StringType),
    StructField("instrument", StringType),
    StructField("acquisition_start", StringType),
    StructField("acquisition_stop", StringType),
    StructField("orbit_number", LongType),
    StructField("pass_direction", StringType),
    StructField("product_type", StringType),
    StructField("polarizations", ArrayType(StringType, containsNull = false)),
    StructField("prf", DoubleType),
    StructField("radar_frequency", DoubleType),
    StructField("range_pixel_spacing", DoubleType),
    StructField("azimuth_pixel_spacing", DoubleType),
    StructField("velocity", DoubleType),
    StructField("slant_range_near", DoubleType),
    StructField("lines", IntegerType),
    StructField("samples", IntegerType),
    StructField("geotransform", ArrayType(DoubleType, containsNull = false)),
    StructField("crs", StringType)))

  /** Stream-parse a manifest.safe-style XML (S10,
    * `sentinel1.rs:1176-1281`): pulls platform (familyName+number),
    * instrument mode, acquisition period, orbit number, pass, product
    * type, and the transmitter/receiver polarisation list.
    */
  def parseManifest(xml: String): SafeMeta = {
    var meta = SafeMeta()
    var element = ""
    val pols = scala.collection.mutable.ArrayBuffer[String]()
    var family = ""
    foreachEvent(xml) { (local, text) =>
      element = local
      element match {
        case "familyName" if text.nonEmpty && family.isEmpty => family = text
        case "number" if family.nonEmpty && meta.platform.isEmpty =>
          meta = meta.copy(platform = Some(family + text))
        case "mode" | "instrumentMode" if text.nonEmpty && meta.instrument.isEmpty =>
          meta = meta.copy(instrument = Some(text))
        case "startTime" if meta.acquisitionStart.isEmpty =>
          meta = meta.copy(acquisitionStart = Some(text))
        case "stopTime" if meta.acquisitionStop.isEmpty =>
          meta = meta.copy(acquisitionStop = Some(text))
        case "orbitNumber" if meta.orbitNumber.isEmpty =>
          meta = meta.copy(orbitNumber = text.toLongOption)
        case "pass" if meta.passDirection.isEmpty =>
          meta = meta.copy(passDirection = Some(text))
        case "productType" if meta.productType.isEmpty =>
          meta = meta.copy(productType = Some(text))
        case "transmitterReceiverPolarisation" if text.nonEmpty =>
          pols += text
        case _ =>
      }
    }
    meta.copy(polarizations = pols.toSeq)
  }

  /** Parse an annotation-style XML (S11, `sentinel1.rs:1297-1442`):
    * physics params + image dims, deriving velocity from the MIDDLE
    * orbit state vector (`:1435-1439`) and slant_range_near =
    * slantRangeTime·c/2 (`:1403-1408`).
    */
  def parseAnnotation(xml: String, meta0: SafeMeta = SafeMeta()): SafeMeta = {
    var meta = meta0
    val vx = scala.collection.mutable.ArrayBuffer[Double]()
    val vy = scala.collection.mutable.ArrayBuffer[Double]()
    val vz = scala.collection.mutable.ArrayBuffer[Double]()
    foreachEvent(xml) { (local, text) =>
      local match {
        case "prf" => meta = meta.copy(prf = text.toDoubleOption.orElse(meta.prf))
        case "radarFrequency" =>
          meta = meta.copy(radarFrequency = text.toDoubleOption.orElse(meta.radarFrequency))
        case "rangePixelSpacing" =>
          meta = meta.copy(rangePixelSpacing = text.toDoubleOption.orElse(meta.rangePixelSpacing))
        case "azimuthPixelSpacing" =>
          meta = meta.copy(azimuthPixelSpacing = text.toDoubleOption.orElse(meta.azimuthPixelSpacing))
        case "slantRangeTime" if meta.slantRangeNear.isEmpty =>
          meta = meta.copy(slantRangeNear = text.toDoubleOption.map(_ * SpeedOfLight / 2.0))
        case "numberOfLines" if meta.lines.isEmpty =>
          meta = meta.copy(lines = text.toIntOption)
        case "numberOfSamples" if meta.samples.isEmpty =>
          meta = meta.copy(samples = text.toIntOption)
        case "vx" => text.toDoubleOption.foreach(vx += _)
        case "vy" => text.toDoubleOption.foreach(vy += _)
        case "vz" => text.toDoubleOption.foreach(vz += _)
        case _ =>
      }
    }
    if (vx.nonEmpty) {
      val mid = vx.length / 2
      val v = math.sqrt(vx(mid) * vx(mid) + vy(mid) * vy(mid) + vz(mid) * vz(mid))
      meta = meta.copy(velocity = Some(v))
    }
    meta
  }

  private def foreachEvent(xml: String)(f: (String, String) => Unit): Unit = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(new StringReader(xml))
    var current = ""
    val text = new StringBuilder
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            current = reader.getLocalName
            text.clear()
          case XMLStreamConstants.CHARACTERS =>
            text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            f(reader.getLocalName, text.toString.trim)
            text.clear()
          case _ =>
        }
      }
    } finally reader.close()
  }

  /** SAFE product names carry the product type as their third
    * underscore field (`S1A_IW_GRDH_1SDV_…` → GRD). The reference reads
    * the type from the manifest (`sentinel1.rs:155-161`); for synthetic
    * product ids with no manifest, the naming convention is the
    * equivalent declared source. Unrecognized shapes yield None
    * (treated as supported — the benign default for plain test ids).
    */
  def productTypeFromId(id: String): Option[String] = {
    val fields = id.split('_').filter(_.nonEmpty)
    fields.lift(2).map(_.toUpperCase).collect {
      case t if t.startsWith("GRD") => "GRD"
      case t @ ("SLC" | "OCN" | "RAW") => t
    }
  }

  /** S9: deterministic lon/lat → UTM/UPS EPSG mapping with the polar,
    * Norway, and Svalbard exceptions (`sentinel1.rs:1766-1808`, ported
    * branch-for-branch).
    */
  def lonlatToEpsg(lon: Double, lat: Double): String = {
    if (lat >= 84.0) return "EPSG:32661"
    if (lat <= -80.0) return "EPSG:32761"
    var lonNorm = lon
    if (lonNorm < -180.0 || lonNorm >= 180.0)
      lonNorm = ((lonNorm + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    val norway = lat >= 56.0 && lat < 64.0 && lonNorm >= 3.0 && lonNorm < 12.0
    val svalbard = lat >= 72.0 && lat < 84.0
    val defaultZone = math.max(1, math.min(60, math.floor((lonNorm + 180.0) / 6.0).toInt + 1))
    val zone =
      if (norway) 32
      else if (svalbard) {
        if (lonNorm >= 0.0 && lonNorm < 9.0) 31
        else if (lonNorm >= 9.0 && lonNorm < 21.0) 33
        else if (lonNorm >= 21.0 && lonNorm < 33.0) 35
        else if (lonNorm >= 33.0 && lonNorm < 42.0) 37
        else defaultZone
      } else defaultZone
    if (lat >= 0.0) f"EPSG:326$zone%02d" else f"EPSG:327$zone%02d"
  }
}
