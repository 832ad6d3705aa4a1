package graft.cli

import java.nio.file.{Files, Paths}

import graft.model._

/** Preset persistence + reproducible-command generation — the GUI-parity
  * surface (`/root/reference/src/gui/models.rs:208-433`): serialize
  * params, load them back, and emit the CLI invocation that reproduces a
  * run.
  */
object Presets {

  /** JSON string escaping — a target CRS may be a full WKT string with
    * embedded double quotes (`PROJCS["WGS 84 / UTM zone 33N",…]`).
    */
  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def jsonUnesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(c => Character.digit(c, 16) >= 0) =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  def toJson(p: ProcessingParams): String = {
    val size = p.targetSize.map(_.toString).getOrElse("original")
    s"""{
  "polarization": "${p.polarization.name}",
  "format": "${p.format.name}",
  "bit_depth": "${p.bitDepth.name}",
  "autoscale": "${p.autoscale.name}",
  "size": "$size",
  "pad": ${p.pad},
  "synrgb_mode": "${p.synRgbMode.name}",
  "target_crs": "${jsonEsc(p.targetCrs.getOrElse("none"))}",
  "resample_alg": "${p.resampleAlg.getOrElse("auto")}"
}"""
  }

  /** Minimal flat-object JSON reader (string/bool values only — the
    * preset schema), tolerant of whitespace/ordering; string values may
    * carry backslash escapes.
    */
  private def fields(json: String): Map[String, String] =
    """"([a-z_]+)"\s*:\s*("((?:[^"\\]|\\.)*)"|true|false)""".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> Option(m.group(3)).map(jsonUnesc).getOrElse(m.group(2)))
      .toMap

  def fromJson(json: String): Either[String, ProcessingParams] = {
    val f = fields(json)
    def get[A](key: String, parse: String => Option[A], default: A): Either[String, A] =
      f.get(key) match {
        case None => Right(default)
        case Some(v) => parse(v).toRight(s"invalid $key: $v")
      }
    for {
      pol <- get("polarization", Polarization.fromString, Polarization.Vv: Polarization)
      fmt <- get("format", OutputFormat.fromString, OutputFormat.Tiff: OutputFormat)
      bd <- get("bit_depth", BitDepth.fromString, BitDepth.U8: BitDepth)
      as <- get("autoscale", AutoscaleStrategy.fromString, AutoscaleStrategy.Clahe: AutoscaleStrategy)
      size <- get[Option[Int]]("size",
        v => if (v == "original") Some(None) else v.toIntOption.filter(_ > 0).map(Some(_)), None)
      pad <- get("pad", v => v.toBooleanOption, false)
      mode <- get("synrgb_mode", SyntheticRgbMode.fromString, SyntheticRgbMode.Default: SyntheticRgbMode)
      crs <- get[Option[String]]("target_crs",
        v => Some(Some(v).filterNot(_.equalsIgnoreCase("none"))), None)
      alg <- get[Option[String]]("resample_alg",
        v => Some(Some(v.toLowerCase).filterNot(_ == "auto")
          .filter(Set("nearest", "bilinear", "cubic", "lanczos"))), None)
    } yield ProcessingParams(pol, fmt, bd, as, size, pad, mode, crs, alg)
  }

  def save(path: String, p: ProcessingParams): Unit =
    Files.writeString(Paths.get(path), toJson(p))

  def load(path: String): Either[String, ProcessingParams] =
    try fromJson(Files.readString(Paths.get(path)))
    catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

  /** Reproducible CLI command for a parameter set
    * (`generate_cli_command`, `gui/models.rs:343-433`).
    */
  def generateCliCommand(p: ProcessingParams, input: String, output: String): String = {
    val base = Seq("graft",
      "-i", input, "-o", output,
      "--polarization", p.polarization.name,
      "--format", p.format.name,
      "--bit-depth", p.bitDepth.name,
      "--autoscale", p.autoscale.name,
      "--size", p.targetSize.map(_.toString).getOrElse("original"))
    val withPad = if (p.pad) base :+ "--pad" else base
    val withMode = if (p.synRgbMode != SyntheticRgbMode.Default)
      withPad ++ Seq("--synrgb-mode", p.synRgbMode.name) else withPad
    val withCrs = p.targetCrs.fold(withMode)(c => withMode ++ Seq("--target-crs", c))
    val withAlg = p.resampleAlg.fold(withCrs)(a => withCrs ++ Seq("--resample-alg", a))
    withAlg.map(shellQuote).mkString(" ")
  }

  /** Single-quote any argv element the shell would split or interpret
    * (a WKT target CRS has spaces, quotes, brackets), so the generated
    * command is actually runnable.
    */
  private def shellQuote(arg: String): String =
    if (arg.nonEmpty && arg.forall(c => c.isLetterOrDigit || "-_./:=".contains(c))) arg
    else "'" + arg.replace("'", "'\\''") + "'"
}
