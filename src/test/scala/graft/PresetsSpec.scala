package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.{Cli, Presets}
import graft.model._

class PresetsSpec extends AnyFunSuite {

  test("preset JSON round-trips every field") {
    val p = ProcessingParams(
      polarization = Polarization.Op(PolarizationOperation.LogRatio),
      format = OutputFormat.Jpeg,
      bitDepth = BitDepth.U16,
      autoscale = AutoscaleStrategy.Robust,
      targetSize = Some(1024),
      pad = true,
      synRgbMode = SyntheticRgbMode.SarUrban)
    assert(Presets.fromJson(Presets.toJson(p)) == Right(p))
  }

  test("defaults round-trip (size original)") {
    val p = ProcessingParams()
    assert(Presets.fromJson(Presets.toJson(p)) == Right(p))
  }

  test("invalid field is rejected with its name") {
    val r = Presets.fromJson("""{"autoscale": "nope"}""")
    assert(r.isLeft && r.swap.toOption.get.contains("autoscale"))
  }

  test("generated CLI command parses back to the same params") {
    val p = ProcessingParams(autoscale = AutoscaleStrategy.Tamed,
      targetSize = Some(512), pad = true)
    val cmd = Presets.generateCliCommand(p, "prod:100:100", "/tmp/o.tiff")
    val argv = cmd.split(' ').drop(1).toSeq
    val parsed = Cli.parse(argv)
    assert(parsed.map(_.params) == Right(p))
  }

  test("a WKT target CRS (embedded quotes) survives the preset JSON") {
    val wkt = """PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84"],AUTHORITY["EPSG","32633"]]"""
    val p = ProcessingParams(targetCrs = Some(wkt))
    val json = Presets.toJson(p)
    assert(Presets.fromJson(json) == Right(p), json)
    // and a pathological value with backslashes + newlines
    val ugly = ProcessingParams(targetCrs = Some("a\\b\"c\nd"))
    assert(Presets.fromJson(Presets.toJson(ugly)) == Right(ugly))
    // a malformed \u escape in a hand-edited file must not throw out of
    // the Either error channel
    val bad = "{\"target_crs\": \"a" + "\\" + "uZZZZb\"}" // \u split: scalac pre-scans unicode escapes
    val r = Presets.fromJson(bad)
    assert(r.isRight, r)
  }

  test("generated CLI command shell-quotes arguments the shell would split") {
    val wkt = """PROJCS["x y",AUTHORITY["EPSG","32633"]]"""
    val cmd = Presets.generateCliCommand(
      ProcessingParams(targetCrs = Some(wkt)), "in:1:1", "/tmp/out dir/o.tiff")
    assert(cmd.contains("--target-crs 'PROJCS[\"x y\",AUTHORITY[\"EPSG\",\"32633\"]]'"), cmd)
    assert(cmd.contains("'/tmp/out dir/o.tiff'"), cmd)
    // plain args stay unquoted
    assert(cmd.startsWith("graft -i in:1:1 -o "), cmd)
  }

  test("multiband TIFF writes a two-page file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-k2").toString
    val path = s"$dir/mb.tiff"
    val b = Array.tabulate(16 * 16)(i => i % 256)
    graft.sink.Sinks.writeTiffMultiband(path, b, b.reverse, 16, 16, u16 = false)
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.File(path))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) == 2, "two gray bands as two pages")
    assert(reader.read(0).getWidth == 16)
    reader.dispose(); in.close()
  }
}
