package graft.meta

/** Best-effort classification of the EPSG 4000-4999 code block — the
  * single source of truth shared by the GeoTIFF key writer
  * ([[graft.sink.Sinks]]) and the warp auto-CRS gate
  * ([[graft.geom.Warp.isGeographic]]), so the two can't drift apart.
  *
  * The block is overwhelmingly geographic-2D CRSs (4326, 4269, 4258,
  * …), but the registry parked interlopers inside it:
  *
  *  - projected CRSs: 4087/4088 (World Equidistant Cylindrical),
  *    4647 (ETRS89 / UTM 32N zE-N), 4839 (ETRS89 / LCC Germany);
  *  - geocentric / 3D CRSs, representable by NO 2D GeoKey: the WGS84
  *    family (4327-4329, 4978/4979), ETRS89 (4936/4937), WGS 72
  *    (4984/4985), NAD83(HARN) (4956/4957), and the ITRF geocentric/3D
  *    run (4896/4897, 4910-4921).
  *
  * The lists are best-effort (the full registry can't be embedded);
  * anything not excluded is treated as geographic 2D, which is the
  * correct reading for the overwhelming majority of the block.
  */
object Epsg {

  /** Projected CRSs parked inside the 4xxx geographic block. */
  val ProjectedInterlopers: Set[Int] = Set(4087, 4088, 4647, 4839)

  /** Geocentric / 3D CRSs in the block — neither geographic-2D nor
    * projected, so no 2D GeoKey applies.
    */
  val NonPlanarInterlopers: Set[Int] =
    Set(4327, 4328, 4329, 4896, 4897, 4936, 4937, 4956, 4957,
      4978, 4979, 4984, 4985) ++ (4910 to 4921)

  def isNonPlanar(code: Int): Boolean = NonPlanarInterlopers(code)

  /** Geographic 2D (lon/lat degree) CRS codes. */
  def isGeographic2D(code: Int): Boolean =
    code >= 4000 && code <= 4999 &&
      !ProjectedInterlopers(code) && !NonPlanarInterlopers(code)
}
