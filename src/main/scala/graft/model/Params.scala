package graft.model

/** Parameter ADTs of the engine — the query surface of the reference
  * (`/root/reference/src/types.rs:8-182`, `src/core/params.rs:8-41`),
  * re-expressed as Scala sealed traits. Stored as StringType when they
  * appear inside DataFrames.
  */
sealed trait Polarization { def name: String }
object Polarization {
  case object Vv extends Polarization { val name = "vv" }
  case object Vh extends Polarization { val name = "vh" }
  case object Hh extends Polarization { val name = "hh" }
  case object Hv extends Polarization { val name = "hv" }
  case object Multiband extends Polarization { val name = "multiband" }
  final case class Op(op: PolarizationOperation) extends Polarization {
    def name: String = op.name
  }
  val all: Seq[Polarization] = Seq(Vv, Vh, Hh, Hv, Multiband)
  def fromString(s: String): Option[Polarization] =
    all.find(_.name == s.toLowerCase)
      .orElse(PolarizationOperation.fromString(s).map(Op))
}

/** Band algebra operations (`/root/reference/src/types.rs:29-37`). */
sealed trait PolarizationOperation { def name: String; def label: String }
object PolarizationOperation {
  case object Sum extends PolarizationOperation { val name = "sum"; val label = "sum" }
  case object Diff extends PolarizationOperation { val name = "diff"; val label = "difference" }
  case object Ratio extends PolarizationOperation { val name = "ratio"; val label = "ratio" }
  case object NDiff extends PolarizationOperation { val name = "n-diff"; val label = "normalized_diff" }
  case object LogRatio extends PolarizationOperation { val name = "log-ratio"; val label = "log_ratio" }
  val all: Seq[PolarizationOperation] = Seq(Sum, Diff, Ratio, NDiff, LogRatio)
  def fromString(s: String): Option[PolarizationOperation] =
    all.find(_.name == s.toLowerCase)
}

/** Autoscale strategies (`/root/reference/src/types.rs:114-142`). */
sealed trait AutoscaleStrategy { def name: String }
object AutoscaleStrategy {
  case object Standard extends AutoscaleStrategy { val name = "standard" }
  case object Robust extends AutoscaleStrategy { val name = "robust" }
  case object Adaptive extends AutoscaleStrategy { val name = "adaptive" }
  case object Equalized extends AutoscaleStrategy { val name = "equalized" }
  case object Clahe extends AutoscaleStrategy { val name = "clahe" }
  case object Tamed extends AutoscaleStrategy { val name = "tamed" }
  case object Default extends AutoscaleStrategy { val name = "default" }
  val all: Seq[AutoscaleStrategy] =
    Seq(Standard, Robust, Adaptive, Equalized, Clahe, Tamed, Default)
  def fromString(s: String): Option[AutoscaleStrategy] =
    all.find(_.name == s.toLowerCase)
}

/** Output bit depth (`/root/reference/src/types.rs:170-173`). */
sealed trait BitDepth { def name: String; def maxVal: Double }
object BitDepth {
  case object U8 extends BitDepth { val name = "u8"; val maxVal = 255.0 }
  case object U16 extends BitDepth { val name = "u16"; val maxVal = 65535.0 }
  def fromString(s: String): Option[BitDepth] =
    Seq(U8, U16).find(_.name == s.toLowerCase)
}

/** Output formats (`/root/reference/src/types.rs:161-165`). */
sealed trait OutputFormat { def name: String }
object OutputFormat {
  case object Tiff extends OutputFormat { val name = "tiff" }
  case object Jpeg extends OutputFormat { val name = "jpeg" }
  def fromString(s: String): Option[OutputFormat] =
    Seq(Tiff, Jpeg).find(_.name == s.toLowerCase)
}

/** Synthetic-RGB composition modes (`/root/reference/src/types.rs:175-182`).
  * All modes currently route to the Default composition
  * (`src/core/processing/synthetic_rgb.rs:72-79`).
  */
sealed trait SyntheticRgbMode { def name: String }
object SyntheticRgbMode {
  case object Default extends SyntheticRgbMode { val name = "default" }
  case object RgbRatio extends SyntheticRgbMode { val name = "rgb-ratio" }
  case object SarUrban extends SyntheticRgbMode { val name = "sar-urban" }
  case object Enhanced extends SyntheticRgbMode { val name = "enhanced" }
  val all: Seq[SyntheticRgbMode] = Seq(Default, RgbRatio, SarUrban, Enhanced)
  def fromString(s: String): Option[SyntheticRgbMode] =
    all.find(_.name == s.toLowerCase)
}

/** Whole-operator description, mirroring `ProcessingOperation`
  * (`/root/reference/src/types.rs:39-45`) and the sidecar label mapping
  * (`src/core/processing/save.rs:35-48`).
  */
sealed trait ProcessingOperation { def label: Option[String] }
object ProcessingOperation {
  case object SingleBand extends ProcessingOperation { val label = None }
  case object MultibandVvVh extends ProcessingOperation { val label = Some("multiband_vv_vh") }
  case object MultibandHhHv extends ProcessingOperation { val label = Some("multiband_hh_hv") }
  final case class PolarOp(op: PolarizationOperation) extends ProcessingOperation {
    val label = Some(op.label)
  }
}

/** Query parameters — mirrors `ProcessingParams`
  * (`/root/reference/src/core/params.rs:8-41`); defaults match the
  * reference's (`src/core/params.rs:26-41`).
  */
final case class ProcessingParams(
    polarization: Polarization = Polarization.Vv,
    format: OutputFormat = OutputFormat.Tiff,
    bitDepth: BitDepth = BitDepth.U8,
    autoscale: AutoscaleStrategy = AutoscaleStrategy.Clahe,
    targetSize: Option[Int] = None,
    pad: Boolean = false,
    synRgbMode: SyntheticRgbMode = SyntheticRgbMode.Default,
    /** S8 `--target-crs`: None/`none` disables, `auto` derives UTM/UPS
      * from the scene center (S9), else an explicit CRS string. */
    targetCrs: Option[String] = None,
    /** S8 `--resample-alg` (nearest/bilinear/cubic/lanczos). */
    resampleAlg: Option[String] = None)
