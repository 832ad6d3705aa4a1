package graft.geom

/** S8: reproject/warp PLAN resolution
  * (`/root/reference/src/io/sentinel1.rs:913-1072`). The reference warps
  * by shelling out to `gdalwarp` on a VRT; GDAL does not exist in this
  * environment, so execution of a real warp stays a documented
  * divergence — but the decision logic around it (the part users
  * actually hit) is ported exactly:
  *
  *  - target-CRS argument resolution: `none` disables, `auto` derives a
  *    UTM/UPS CRS from scene-center lon/lat (S9,
  *    `cli/runner.rs:69-71`, `sentinel1.rs:170-176`);
  *  - the skip-warp guard: a source already in the target CRS is read
  *    directly, no warp (`sentinel1.rs:959-986`);
  *  - the fused warp+resize `-ts` computation (`sentinel1.rs:1005-1015`);
  *  - the GCP/thin-plate-spline fallback for unprojected GRD rasters
  *    (`sentinel1.rs:1017-1030`);
  *  - resample-alg mapping with the bilinear default
  *    (`sentinel1.rs:938-943` — note Lanczos is NOT a warp alg there;
  *    anything but near/bilinear/cubic falls back to bilinear).
  *
  * At 100 TB the execution plan would be a distributed inverse-projected
  * tile resample (same halo shape as Engine.resizeTilesLanczos); the
  * resolver below is engine-agnostic and produces the same NoOp/plan
  * decisions either way.
  */
object Warp {

  sealed trait Plan
  /** Source already in the target CRS — read directly, no warp. */
  case object NoOp extends Plan
  /** The warp the reference would run (its exact `gdalwarp` argv). */
  final case class Exec(args: Vector[String]) extends Plan

  /** `AUTHORITY["EPSG","nnnn"]` extraction — LAST occurrence wins (the
    * outermost authority in a WKT is written last), mirroring the
    * reference's `rfind` (`sentinel1.rs:948-958`); a bare `EPSG:` string
    * passes through.
    */
  def parseEpsg(wkt: String): Option[String] = {
    val key = "AUTHORITY[\"EPSG\",\""
    val idx = wkt.lastIndexOf(key)
    if (idx >= 0) {
      val start = idx + key.length
      val end = wkt.indexOf('"', start)
      if (end > start) Some(s"EPSG:${wkt.substring(start, end)}") else None
    } else if (wkt.startsWith("EPSG:")) Some(wkt)
    else None
  }

  /** A CRS string whose coordinates are lon/lat degrees — the only kind
    * the auto-CRS scene-center derivation may consume (the reference
    * likewise refuses to trust GCP coordinates under a non-geographic
    * projection, `sentinel1.rs:1663-1687`). This answers "is THIS
    * string geographic"; an ABSENT/blank CRS is a separate case the
    * caller decides (Engine's warp gate treats it as the unprojected-
    * GRD convention: geotransform derived from lon/lat GCPs).
    */
  def isGeographic(crs: Option[String]): Boolean = crs.exists { s =>
    val t = s.trim
    // a WKT is judged by its OUTERMOST node alone (WKT1 GEOGCS, WKT2
    // GEOGCRS, or a WKT2:2015 GEODCRS with an ellipsoidal CS — a
    // Cartesian GEODCRS is geocentric); the EPSG code-block rule
    // applies only to bare EPSG strings (a PROJCS carrying a 4xxx
    // authority is still projected)
    if (t.contains("[")) {
      val u = t.toUpperCase
      u.startsWith("GEOGCS") || u.startsWith("GEOGCRS") ||
        (u.startsWith("GEODCRS") && u.contains("ELLIPSOIDAL"))
    } else parseEpsg(t).flatMap(_.stripPrefix("EPSG:").toIntOption)
      .exists(graft.meta.Epsg.isGeographic2D)
  }

  /** `--target-crs` argument semantics (`cli/runner.rs:69-71`):
    * none/absent → no warp; `auto` → scene-center UTM/UPS via S9;
    * anything else is an explicit CRS string.
    */
  def resolveTargetCrs(arg: Option[String],
                       sceneCenter: => Option[(Double, Double)]): Option[String] =
    arg.flatMap {
      case t if t.equalsIgnoreCase("none") => None
      case t if t.equalsIgnoreCase("auto") =>
        sceneCenter.map { case (lon, lat) => graft.meta.SafeMeta.lonlatToEpsg(lon, lat) }
      case t => Some(t)
    }

  /** Warp resample-alg mapping (`sentinel1.rs:938-943`). */
  def warpResampleAlg(alg: Option[String]): String = alg.map(_.toLowerCase) match {
    case Some("nearest") | Some("near") => "near"
    case Some("cubic") => "cubic"
    case _ => "bilinear"
  }

  /** Resolve a requested warp against the source's CRS: the skip guard,
    * then the full `gdalwarp` argv the reference would execute.
    */
  def resolveWarp(srcProjection: Option[String], targetCrs: String,
                  resampleAlg: Option[String] = None,
                  targetSize: Option[Int] = None,
                  srcCols: Int = 0, srcRows: Int = 0,
                  gcpProjection: Option[String] = None,
                  input: String = "<input>", output: String = "<output.vrt>"): Plan = {
    val srcEpsg = srcProjection.filter(_.trim.nonEmpty).flatMap(parseEpsg)
    if (srcEpsg.exists(_.equalsIgnoreCase(targetCrs))) NoOp
    else {
      val base = Vector("-of", "VRT", "-overwrite", "-r", warpResampleAlg(resampleAlg),
        "-multi", "-wo", "NUM_THREADS=ALL_CPUS", "-wm", "512",
        "--config", "GDAL_CACHEMAX", "512")
      // fused warp+resize: long side → target, aspect preserved, never
      // upscaled (`sentinel1.rs:1005-1015`)
      val ts = targetSize.filter(_ => srcCols > 0 && srcRows > 0).toVector.flatMap { t =>
        val longSide = math.max(srcCols, srcRows)
        val scale = math.min(t.toDouble / longSide, 1.0)
        val outCols = math.max(math.round(srcCols * scale), 1L)
        val outRows = math.max(math.round(srcRows * scale), 1L)
        Vector("-ts", outCols.toString, outRows.toString)
      }
      // unprojected GRD raster: geolocate via GCPs + thin plate spline
      // (`sentinel1.rs:1017-1030`); trim-aware so a whitespace-only
      // projection gets the same treatment as absent (matching the
      // Engine warp gate's reading)
      val tps = if (srcProjection.forall(_.trim.isEmpty))
        Vector("-tps", "-s_srs", gcpProjection.filter(_.trim.nonEmpty).getOrElse("EPSG:4326"))
      else Vector.empty
      Exec(base ++ ts ++ tps ++ Vector("-t_srs", targetCrs, input, output))
    }
  }

  /** Execute a plan. NoOp is the identity; a real warp is unsupported in
    * this environment (no GDAL) and reports itself as such rather than
    * silently skipping — the reference's error-on-failed-warp contract,
    * surfaced as the same `Error::External` category its API maps
    * gdalwarp failures to (`api/mod.rs:108` et al.).
    */
  def execute(plan: Plan): Unit = plan match {
    case NoOp => ()
    case Exec(args) => throw graft.model.GraftException.External(
      s"reproject requires gdalwarp (unavailable here); would run: gdalwarp ${args.mkString(" ")}")
  }
}
