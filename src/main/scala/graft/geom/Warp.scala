package graft.geom

/** S8: reproject/warp resolution
  * (`/root/reference/src/io/sentinel1.rs:913-1072`). The reference warps
  * by shelling out to `gdalwarp` on a VRT; GDAL does not exist in this
  * environment. Warps whose CRSs are in the [[Proj]] family (UTM / UPS /
  * lon-lat — everything S9 can emit) resolve to a [[NativeWarp]] that
  * [[graft.api.Engine.warpTiles]] executes as a distributed
  * inverse-projected tile resample — including UNPROJECTED sources,
  * whose absent CRS plus lon/lat-range geotransform reads as EPSG:4326
  * ([[impliedSrcEpsg]]); only warps OUTSIDE that family (or blank-CRS
  * sources without a lon/lat geotransform — the true GCP-grid/TPS case)
  * remain a documented divergence, raising with the exact gdalwarp argv. The decision logic
  * around the warp (the part users hit first) is ported exactly:
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
  * The resolver below is engine-agnostic and produces the same
  * NoOp/native/argv decisions at any scale; the distributed execution
  * lives in [[graft.api.Engine.warpTiles]].
  */
object Warp {

  sealed trait Plan
  /** Source already in the target CRS — read directly, no warp. */
  case object NoOp extends Plan
  /** The warp the reference would run (its exact `gdalwarp` argv). */
  final case class Exec(args: Vector[String]) extends Plan

  /** A warp this engine executes NATIVELY as a distributed
    * inverse-projected tile resample ([[graft.api.Engine.warpTiles]]):
    * both CRSs are in the [[Proj]] family (UTM/UPS/lon-lat — exactly
    * what S9 can emit) and the source is georeferenced. Carries the
    * fully-resolved SOURCE and OUTPUT grids so execution is pure
    * per-tile math (geotransforms as Vector[Double] so plans compare
    * by value, unlike Array's reference equality).
    */
  final case class NativeWarp(srcCrs: String, dstCrs: String, alg: String,
                              srcGt: Vector[Double], srcRows: Int, srcCols: Int,
                              dstGt: Vector[Double], dstRows: Int, dstCols: Int)

  /** Effective source CRS under the unprojected-GRD convention: an
    * explicit (non-blank) projection parses via [[parseEpsg]]; an
    * ABSENT/blank one with a geotransform whose four corner coordinates
    * all land in lon/lat range (|x| ≤ 180, |y| ≤ 90, finite) reads as
    * EPSG:4326 — the same convention [[graft.api.Engine]]'s warp gate
    * applies to scene centers, and the convention under which the
    * reference's GCP+TPS leg geolocates unprojected GRDs (its GCP SRS
    * defaults to EPSG:4326, `sentinel1.rs:1017-1030`). A blank-CRS
    * source whose geotransform is NOT lon/lat-plausible (meters, or
    * non-finite) yields None: that is the true GCP-grid case the argv
    * raise keeps.
    *
    * Residual risks, accepted and documented: (1) the native path
    * trusts the AFFINE geotransform as the geolocation, while gdalwarp
    * -tps fits the (curved) GCP grid — for a real GRD whose gt is only
    * a coarse fit of its GCPs, warped pixels carry the gt-vs-TPS
    * residual (this engine's sources construct the gt FROM the GCPs,
    * so the residual is the GCP grid's own nonlinearity); (2) a
    * blank-CRS raster in a local tangent-plane METER frame whose extent
    * happens to fall inside ±180/±90 is misread as lon/lat — no
    * metadata distinguishes it, and the reference's own TPS leg makes
    * the same degrees assumption for its default GCP SRS.
    */
  def impliedSrcEpsg(srcProjection: Option[String],
                     srcGt: Option[Array[Double]],
                     srcRows: Int, srcCols: Int): Option[String] =
    srcProjection.filter(_.trim.nonEmpty) match {
      case Some(p) => parseEpsg(p)
      case None => srcGt.filter { g =>
        g.length >= 6 && srcRows > 0 && srcCols > 0 &&
          Seq((0.0, 0.0), (srcCols.toDouble, 0.0),
            (0.0, srcRows.toDouble), (srcCols.toDouble, srcRows.toDouble))
            .forall { case (px, py) =>
              val x = g(0) + px * g(1) + py * g(2)
              val y = g(3) + px * g(4) + py * g(5)
              java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y) &&
                math.abs(x) <= 180.0 && math.abs(y) <= 90.0
            }
      }.map(_ => "EPSG:4326")
    }

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

  /** Resolve a warp the engine can run NATIVELY (no gdalwarp): both
    * CRSs in the [[Proj]] family and a georeferenced source. Computes
    * the output grid the way gdalwarp's suggested-output step does in
    * spirit — project the source extent's border into the target CRS
    * for the bounding box — with a deterministic resolution rule:
    *
    *  - fused `-ts` (`sentinel1.rs:1005-1015`): output dims come from
    *    the SOURCE dims' long-side scaling (identical to the argv's
    *    `-ts` numbers); per-axis pixel size = bbox / dims, exactly what
    *    gdalwarp does under an explicit `-ts`;
    *  - no target size: square pixels sized by the geometric mean of
    *    the scene-center pixel footprint in the target CRS (GDAL's
    *    suggested output has the same intent; bit-parity with its
    *    grid-sampled variant is not claimed — a documented divergence
    *    like the Lanczos crate; WarpSpec gates the grid on this
    *    resolver's own semantics: bbox corners, -ts dims, resolution
    *    bounds).
    *
    * The source CRS resolves through [[impliedSrcEpsg]]: an absent/blank
    * projection with a lon/lat-range geotransform executes natively as
    * EPSG:4326 — the unprojected-GRD leg real Sentinel-1 products hit
    * (`sentinel1.rs:1017-1030`) — so the argv raise remains only for
    * blank-CRS sources WITHOUT a lon/lat geotransform (true GCP-grid/
    * TPS) and CRSs outside the [[Proj]] family.
    *
    * Returns None when the source is already in the target CRS (the
    * same skip guard as [[resolveWarp]] — an identity resample would
    * needlessly degrade pixels; the caller treats an implied-4326
    * source targeting 4326 as the same skip), when any CRS is outside
    * the native family, or when the source lacks an invertible
    * geotransform — the latter two keep the honest gdalwarp-argv raise.
    */
  def nativePlan(srcProjection: Option[String], targetCrs: String,
                 srcGt: Option[Array[Double]], srcRows: Int, srcCols: Int,
                 resampleAlg: Option[String] = None,
                 targetSize: Option[Int] = None): Option[NativeWarp] = for {
    srcCrs <- impliedSrcEpsg(srcProjection, srcGt, srcRows, srcCols)
    srcProj <- Proj.fromEpsg(srcCrs)
    dstCrs <- parseEpsg(targetCrs)
    if !srcCrs.equalsIgnoreCase(dstCrs)
    dstProj <- Proj.fromEpsg(dstCrs)
    gt <- srcGt.filter(g => g.length >= 6 && g(1) * g(5) - g(2) * g(4) != 0.0)
    if srcRows > 0 && srcCols > 0
    plan <- {
      // project the source extent border (pixel-corner coordinates, the
      // full footprint polygon) into the target CRS
      val steps = 20
      var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
      var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
      var ok = true
      def visit(px: Double, py: Double): Unit = {
        val sx = gt(0) + px * gt(1) + py * gt(2)
        val sy = gt(3) + px * gt(4) + py * gt(5)
        val (lon, lat) = srcProj.inverse(sx, sy)
        val (dx, dy) = dstProj.forward(lon, lat)
        if (java.lang.Double.isFinite(dx) && java.lang.Double.isFinite(dy)) {
          if (dx < minX) minX = dx; if (dx > maxX) maxX = dx
          if (dy < minY) minY = dy; if (dy > maxY) maxY = dy
        } else ok = false
      }
      var i = 0
      while (i <= steps && ok) {
        val fx = srcCols.toDouble * i / steps
        val fy = srcRows.toDouble * i / steps
        visit(fx, 0.0); visit(fx, srcRows.toDouble)
        visit(0.0, fy); visit(srcCols.toDouble, fy)
        i += 1
      }
      if (!ok || maxX <= minX || maxY <= minY) None
      else {
        val dims: Option[(Int, Int)] = targetSize match {
          case Some(t) =>
            // the argv's exact -ts computation (long side → target,
            // aspect from SOURCE dims, never upscaled)
            val longSide = math.max(srcCols, srcRows)
            val scale = math.min(t.toDouble / longSide, 1.0)
            Some((math.max(math.round(srcCols * scale), 1L).toInt,
              math.max(math.round(srcRows * scale), 1L).toInt))
          case None =>
            // scene-center pixel footprint → square target resolution
            val cx = srcCols / 2.0; val cy = srcRows / 2.0
            def proj(px: Double, py: Double): (Double, Double) = {
              val (lon, lat) = srcProj.inverse(
                gt(0) + px * gt(1) + py * gt(2), gt(3) + px * gt(4) + py * gt(5))
              dstProj.forward(lon, lat)
            }
            val p0 = proj(cx, cy); val pr = proj(cx + 1.0, cy); val pd = proj(cx, cy + 1.0)
            val dxs = math.hypot(pr._1 - p0._1, pr._2 - p0._2)
            val dys = math.hypot(pd._1 - p0._1, pd._2 - p0._2)
            val res = math.sqrt(dxs * dys)
            if (!java.lang.Double.isFinite(res) || res <= 0.0) None
            else Some((math.max(1L, math.round((maxX - minX) / res)).toInt,
              math.max(1L, math.round((maxY - minY) / res)).toInt))
        }
        dims.map { case (outCols, outRows) =>
          val pw = (maxX - minX) / outCols
          val ph = (maxY - minY) / outRows
          NativeWarp(srcCrs, dstCrs, warpResampleAlg(resampleAlg),
            gt.toVector, srcRows, srcCols,
            Vector(minX, pw, 0.0, maxY, 0.0, -ph), outRows, outCols)
        }
      }
    }
  } yield plan

  /** Execute a plan. NoOp is the identity; an Exec plan is a warp the
    * engine could NOT resolve natively (non-[[Proj]] CRS family, or a
    * GCP/TPS source) — unsupported in this environment (no GDAL), it
    * reports itself as such rather than silently skipping: the
    * reference's error-on-failed-warp contract, surfaced as the same
    * `Error::External` category its API maps gdalwarp failures to
    * (`api/mod.rs:108` et al.). Native-family warps never reach this
    * raise: [[graft.api.Engine]]'s warp gate routes them through
    * [[nativePlan]] → [[graft.api.Engine.warpTiles]] first.
    */
  def execute(plan: Plan): Unit = plan match {
    case NoOp => ()
    case Exec(args) => throw graft.model.GraftException.External(
      s"reproject requires gdalwarp (unavailable here); would run: gdalwarp ${args.mkString(" ")}")
  }
}
