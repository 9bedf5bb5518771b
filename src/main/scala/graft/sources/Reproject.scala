package graft.sources

/** CRS math for the cogify stage (reference
  * `lambdas/cogify/handler.py:121-145`).
  *
  * The reference calls rasterio's `calculate_default_transform(src_crs,
  * EPSG:3857, w, h, bounds)` — a thin wrapper over GDAL's
  * `GDALSuggestedWarpOutput` (alg/gdaltransformer.cpp) — and then writes
  * the SOURCE grid (src dims, unwarped pixels, `crs=src_crs`) with the
  * resulting 3857 transform as its geotransform (`handler.py:150-162`:
  * `transform=dst_transform, crs=src_crs, height=src_height,
  * width=src_width`). I.e. the reference never resamples; the "warp" is
  * metadata-level. This object reproduces exactly that computation in
  * pure JVM: the suggested-output algorithm (edge sampling, diagonal
  * pixel size, rounded dims) over a spherical-mercator forward and, for
  * the `src_crs` configs the reference ships (`example.ini:14`,
  * `+proj=utm +zone=.. +datum=WGS84`), a Snyder (1987) transverse-
  * mercator inverse. All formulas are textbook-public (Snyder, "Map
  * Projections: A Working Manual", USGS PP 1395).
  */
object Reproject {

  /** WGS84 ellipsoid. */
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val EP2 = E2 / (1 - E2)

  sealed trait Crs { def epsg: Int }
  /** EPSG:4326, lon/lat degrees. */
  case object Geodetic extends Crs { val epsg = 4326 }
  /** EPSG:3857, spherical web-mercator meters. */
  case object WebMercator extends Crs { val epsg = 3857 }
  /** WGS84 UTM (EPSG:326zz north / 327zz south). */
  final case class Utm(zone: Int, south: Boolean) extends Crs {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone")
    def epsg: Int = (if (south) 32700 else 32600) + zone
  }

  /** Parse the `src_crs` config forms the reference accepts
    * (`CRS.from_proj4`, `handler.py:122-126`): a proj4 string. Also
    * accepts `EPSG:nnnn` for convenience. The reference's own example
    * writes `+zone=32S`; PROJ's atoi-based parsing reads that as zone
    * 32 NORTH (trailing letter ignored, no `+south`), and that runtime
    * behavior is matched here — south requires the `+south` flag.
    * Unknown projections are a Left — config errors surface at load,
    * never as a wrong grid. */
  def parseSrcCrs(s: String): Either[String, Crs] = {
    val t = s.trim
    val up = t.toUpperCase
    if (up == "EPSG:4326") Right(Geodetic)
    else if (up == "EPSG:3857") Right(WebMercator)
    else if (up.startsWith("EPSG:326") || up.startsWith("EPSG:327")) {
      // exactly 5 digits (326zz / 327zz) and zone 1..60; anything else
      // is a Left — malformed config must never throw in a task or
      // silently parse as a different zone ("EPSG:326" is not Utm(26))
      val digits = t.drop(5)
      val code =
        if (digits.length == 5 && digits.forall(_.isDigit))
          digits.toIntOption
        else None
      code match {
        case Some(c) if (c % 100) >= 1 && (c % 100) <= 60 =>
          Right(Utm(c % 100, c >= 32700))
        case _ => Left(s"unsupported src_crs '$s'")
      }
    } else if (t.startsWith("+")) {
      val kv = t.split("\\s+").map(_.stripPrefix("+")).map { p =>
        p.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k) => k -> ""
        }
      }.toMap
      kv.get("proj") match {
        case Some("longlat") | Some("latlong") => Right(Geodetic)
        case Some("utm") =>
          kv.get("zone").toRight("+proj=utm needs +zone").flatMap { z =>
            // PROJ parses +zone= with atoi: a trailing letter is
            // IGNORED, so the reference's shipped "+zone=32S"
            // (example.ini:14) is zone 32 NORTH at its runtime —
            // southern hemisphere needs the +south flag. Matched here
            // for strict parity (was previously read as south).
            val south = kv.contains("south")
            val digits = z.takeWhile(_.isDigit)
            digits.toIntOption match {
              case Some(zone) if zone >= 1 && zone <= 60 =>
                Right(Utm(zone, south))
              case _ => Left(s"bad UTM zone '$z'")
            }
          }
        case Some(p) => Left(s"unsupported projection +proj=$p")
        case None => Left(s"no +proj in '$s'")
      }
    } else Left(s"unsupported src_crs '$s'")
  }

  /** Forward spherical mercator, the EPSG:3857 definition. PROJ raises
    * F_ERROR at |lat| >= 90 and GDAL's suggested-output sampling skips
    * failed points — mirrored here as None. */
  def geodeticToMercator(lon: Double, lat: Double): Option[(Double, Double)] =
    if (lat >= 90.0 || lat <= -90.0 || lon.isNaN || lat.isNaN) None
    else {
      val x = A * math.toRadians(lon)
      // 0.5*ln((1+s)/(1-s)) == ln(tan(pi/4 + phi/2)) analytically, but
      // is exact at phi=0 (the tan form rounds to tan(pi/4) != 1.0)
      val s = math.sin(math.toRadians(lat))
      val y = A * 0.5 * math.log((1 + s) / (1 - s))
      if (x.isFinite && y.isFinite) Some((x, y)) else None
    }

  /** Inverse transverse mercator for WGS84 UTM — Snyder (1987) eq.
    * 8-17..8-25 with the standard UTM frame (k0=0.9996, FE=500 km,
    * FN=10 000 km south). Accurate to well under a meter inside a
    * zone's normal extent. */
  def utmToGeodetic(u: Utm, easting: Double, northing: Double)
  : Option[(Double, Double)] = {
    val k0 = 0.9996
    val x = easting - 500000.0
    val y = if (u.south) northing - 10000000.0 else northing
    val m = y / k0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 -
      5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1)
    val c1 = EP2 * cosP * cosP
    val t1 = math.tan(phi1) * math.tan(phi1)
    val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * k0)
    val phi = phi1 - (n1 * math.tan(phi1) / r1) * (
      d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) *
          math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 -
          3 * c1 * c1) * math.pow(d, 6) / 720)
    val lam0 = math.toRadians(u.zone * 6.0 - 183.0)
    val lam = lam0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) *
        math.pow(d, 5) / 120) / cosP
    val lat = math.toDegrees(phi); val lon = math.toDegrees(lam)
    if (lat.isFinite && lon.isFinite && math.abs(lat) < 90)
      Some((lon, lat))
    else None
  }

  /** One point, src CRS → EPSG:3857. */
  def toMercator(src: Crs, x: Double, y: Double): Option[(Double, Double)] =
    src match {
      case Geodetic => geodeticToMercator(x, y)
      case WebMercator => Some((x, y))
      case u: Utm => utmToGeodetic(u, x, y)
        .flatMap { case (lon, lat) => geodeticToMercator(lon, lat) }
    }

  /** `calculate_default_transform(src_crs, EPSG:3857, w, h, bounds)` —
    * GDAL's `GDALSuggestedWarpOutput` shape: sample 21 ratios along
    * each source edge, take the bounding box of the successful
    * transforms, derive the square pixel size from the transformed
    * diagonal (corner-to-corner where both corners transform, bbox
    * extents otherwise), round output dims to the nearest pixel.
    *
    * @return (GDAL-order geotransform [x0, xres, 0, y0, 0, -yres],
    *          dstWidth, dstHeight) — the reference uses only the
    *          transform and keeps src dims (`handler.py:150-162`); dims
    *          are returned for tests and future true-warp use. */
  def calculateDefaultTransform(src: Crs, width: Int, height: Int,
                                left: Double, bottom: Double,
                                right: Double, top: Double)
  : Either[String, (Seq[Double], Int, Int)] = {
    val steps = 20
    val pts = (0 to steps).flatMap { i =>
      val r = i.toDouble / steps
      Seq(
        (left + r * (right - left), top),
        (left + r * (right - left), bottom),
        (left, top - r * (top - bottom)),
        (right, top - r * (top - bottom)))
    }
    val ok = pts.flatMap { case (x, y) => toMercator(src, x, y) }
    // GDAL proceeds with whatever edge samples transform — a global
    // geodetic extent legitimately loses both pole edges (46/84); only
    // a bbox-degenerate survivor set (<2 points) is a config error
    if (ok.size < 2)
      Left(s"too many sample points failed to transform to EPSG:3857 " +
        s"(${pts.size - ok.size}/${pts.size})")
    else {
      val minX = ok.map(_._1).min; val maxX = ok.map(_._1).max
      val minY = ok.map(_._2).min; val maxY = ok.map(_._2).max
      val diag = (toMercator(src, left, top),
        toMercator(src, right, bottom)) match {
        case (Some((x0, y0)), Some((x1, y1))) =>
          math.hypot(x1 - x0, y1 - y0)
        case _ => math.hypot(maxX - minX, maxY - minY)
      }
      val px = diag / math.hypot(width.toDouble, height.toDouble)
      if (!(px > 0) || !px.isFinite)
        Left("degenerate pixel size in default transform")
      else {
        val w = math.max(1, ((maxX - minX) / px + 0.5).toInt)
        val h = math.max(1, ((maxY - minY) / px + 0.5).toInt)
        Right((Seq(minX, px, 0.0, maxY, 0.0, -px), w, h))
      }
    }
  }
}
