package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Warp
import graft.model._

/** S8 warp-plan resolution (`/root/reference/src/io/sentinel1.rs:913-1072`
  * decision semantics): skip guard, argv construction, fused -ts,
  * TPS fallback, and the CLI/preset plumbing of the CRS flags.
  */
class WarpSpec extends AnyFunSuite {

  private val utm33Wkt =
    """PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",
      |AUTHORITY["EPSG","6326"]],AUTHORITY["EPSG","4326"]],
      |AUTHORITY["EPSG","32633"]]""".stripMargin.replace("\n", "")

  test("parseEpsg takes the LAST authority (outermost CRS) and bare EPSG strings") {
    assert(Warp.parseEpsg(utm33Wkt).contains("EPSG:32633"))
    assert(Warp.parseEpsg("EPSG:4326").contains("EPSG:4326"))
    assert(Warp.parseEpsg("not a wkt").isEmpty)
  }

  test("target-CRS argument semantics: none disables, auto derives from scene center") {
    assert(Warp.resolveTargetCrs(Some("none"), Some((15.0, 45.0))).isEmpty)
    assert(Warp.resolveTargetCrs(Some("NONE"), Some((15.0, 45.0))).isEmpty)
    assert(Warp.resolveTargetCrs(None, Some((15.0, 45.0))).isEmpty)
    assert(Warp.resolveTargetCrs(Some("auto"), Some((15.0, 45.0)))
      .contains("EPSG:32633"), "auto must route through S9 lonlatToEpsg")
    assert(Warp.resolveTargetCrs(Some("auto"), None).isEmpty)
    assert(Warp.resolveTargetCrs(Some("EPSG:3857"), None).contains("EPSG:3857"))
  }

  test("skip guard: source already in the target CRS is a NoOp") {
    assert(Warp.resolveWarp(Some(utm33Wkt), "EPSG:32633") == Warp.NoOp)
    assert(Warp.resolveWarp(Some("EPSG:4326"), "epsg:4326") == Warp.NoOp)
    Warp.execute(Warp.NoOp) // must not throw
  }

  test("warp argv: bilinear default, fused -ts never upscales, TPS for unprojected") {
    // projected source, different target: plain warp, no -tps
    val p = Warp.resolveWarp(Some(utm33Wkt), "EPSG:4326",
      targetSize = Some(2048), srcCols = 26000, srcRows = 16000)
    val args = p match { case Warp.Exec(a) => a; case _ => fail("expected Exec") }
    assert(args.containsSlice(Seq("-r", "bilinear")), "bilinear is the default")
    assert(args.containsSlice(Seq("-ts", "2048", "1260")),
      "long side to target, aspect preserved, round half up")
    assert(!args.contains("-tps"))
    assert(args.containsSlice(Seq("-t_srs", "EPSG:4326")))
    // lanczos is NOT a warp alg in the reference: falls back to bilinear
    val pl = Warp.resolveWarp(Some(utm33Wkt), "EPSG:4326", resampleAlg = Some("lanczos"))
    assert(pl match { case Warp.Exec(a) => a.containsSlice(Seq("-r", "bilinear")); case _ => false })
    assert(Warp.warpResampleAlg(Some("nearest")) == "near")
    assert(Warp.warpResampleAlg(Some("cubic")) == "cubic")
    // -ts with target larger than the source: scale capped at 1.0
    val pBig = Warp.resolveWarp(Some(utm33Wkt), "EPSG:4326",
      targetSize = Some(99999), srcCols = 100, srcRows = 50)
    assert(pBig match { case Warp.Exec(a) => a.containsSlice(Seq("-ts", "100", "50")); case _ => false })
    // unprojected GRD raster: TPS + source SRS fallback
    val pt = Warp.resolveWarp(None, "EPSG:32633")
    assert(pt match { case Warp.Exec(a) => a.containsSlice(Seq("-tps", "-s_srs", "EPSG:4326")); case _ => false })
    // whitespace-only projection is absent too (same reading as the
    // Engine warp gate)
    val pw = Warp.resolveWarp(Some("  "), "EPSG:32633")
    assert(pw match { case Warp.Exec(a) => a.containsSlice(Seq("-tps", "-s_srs", "EPSG:4326")); case _ => false })
  }

  test("isGeographic accepts lon/lat CRSs only") {
    assert(Warp.isGeographic(Some("EPSG:4326")))
    assert(Warp.isGeographic(Some("EPSG:4269")))
    assert(Warp.isGeographic(
      Some("GEOGCS[\"WGS 84\",AUTHORITY[\"EPSG\",\"4326\"]]")))
    assert(Warp.isGeographic(Some("GEOGCRS[\"WGS 84\",ID[\"EPSG\",4326]]")),
      "WKT2 geographic")
    assert(!Warp.isGeographic(Some("PROJCRS[\"x\",BASEGEOGCRS[\"WGS 84\"]]")),
      "WKT2 projected")
    assert(Warp.isGeographic(Some(
      "GEODCRS[\"WGS 84\",CS[ellipsoidal,2],AXIS[\"lat\",north]]")),
      "WKT2:2015 geographic (ellipsoidal CS)")
    assert(!Warp.isGeographic(Some(
      "GEODCRS[\"WGS 84\",CS[Cartesian,3],AXIS[\"X\",geocentricX]]")),
      "WKT2:2015 geocentric (Cartesian CS)")
    assert(!Warp.isGeographic(Some("EPSG:32633")))
    assert(!Warp.isGeographic(Some(utm33Wkt)),
      "a PROJCS embedding a GEOGCS member is NOT geographic")
    assert(!Warp.isGeographic(Some("EPSG:4087")), "projected interloper")
    assert(!Warp.isGeographic(None), "absent CRS: center coords untrusted")
  }

  test("executing a real warp reports itself unsupported with the gdalwarp argv") {
    val e = intercept[graft.model.GraftException.External] {
      Warp.execute(Warp.resolveWarp(Some(utm33Wkt), "EPSG:4326"))
    }
    assert(e.getMessage.contains("gdalwarp") && e.getMessage.contains("-t_srs EPSG:4326"))
  }

  test("CLI parses --target-crs/--resample-alg; presets round-trip them") {
    val parsed = graft.cli.Cli.parse(Seq("-i", "a:8:8", "-o", "/tmp/x.tiff",
      "--target-crs", "EPSG:32633", "--resample-alg", "cubic"))
    assert(parsed.exists(_.params.targetCrs.contains("EPSG:32633")))
    assert(parsed.exists(_.params.resampleAlg.contains("cubic")))
    assert(graft.cli.Cli.parse(Seq("-i", "a:8:8", "-o", "/tmp/x",
      "--resample-alg", "boxcar")).isLeft)

    val p = ProcessingParams(targetCrs = Some("EPSG:32633"), resampleAlg = Some("cubic"))
    val rt = graft.cli.Presets.fromJson(graft.cli.Presets.toJson(p))
    assert(rt.exists(q => q.targetCrs == p.targetCrs && q.resampleAlg == p.resampleAlg))
    val rtNone = graft.cli.Presets.fromJson(graft.cli.Presets.toJson(ProcessingParams()))
    assert(rtNone.exists(q => q.targetCrs.isEmpty && q.resampleAlg.isEmpty))
    val cmd = graft.cli.Presets.generateCliCommand(p, "in", "out")
    assert(cmd.contains("--target-crs EPSG:32633") && cmd.contains("--resample-alg cubic"))
  }
}
