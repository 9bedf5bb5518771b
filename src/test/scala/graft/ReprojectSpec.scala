package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Reproject
import graft.sources.Reproject.{Geodetic, Utm, WebMercator}

/** The cogify CRS math (reference `lambdas/cogify/handler.py:121-145`):
  * spherical-mercator forward, UTM inverse, and the
  * `calculate_default_transform` / GDALSuggestedWarpOutput shape.
  * Expected constants are pinned from the published formulas
  * (Snyder 1987; EPSG:3857 definition), computed independently. */
class ReprojectSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, rel: Double = 1e-9): Boolean =
    math.abs(a - b) <= rel * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("geodetic -> web-mercator forward: pinned values, pole failure") {
    val (x180, _) = Reproject.geodeticToMercator(180, 0).get
    assert(approx(x180, 20037508.342789244))
    val (_, y45) = Reproject.geodeticToMercator(0, 45).get
    assert(approx(y45, 5621521.486192335))
    val (_, y81) = Reproject.geodeticToMercator(0, 81).get
    assert(approx(y81, 16213801.067583967))
    // PROJ raises F_ERROR at |lat| >= 90; GDAL's sampling skips the point
    assert(Reproject.geodeticToMercator(0, 90).isEmpty)
    assert(Reproject.geodeticToMercator(0, -90).isEmpty)
    assert(Reproject.geodeticToMercator(0, 0).get == (0.0, 0.0))
  }

  test("calculate_default_transform: mid-latitude grid (both corners ok)") {
    // 6x4 grid over (-120,-30)..(120,30) — the classicGrid fixture frame
    val (t, w, h) = Reproject
      .calculateDefaultTransform(Geodetic, 6, 4, -120, -30, 120, 30)
      .fold(e => fail(e), identity)
    assert(approx(t(0), -13358338.895192828))
    assert(approx(t(1), 3830244.8158825915))
    assert(t(2) == 0.0 && t(4) == 0.0)
    assert(approx(t(3), 3503549.843504374))
    assert(approx(t(5), -3830244.8158825915))
    assert(w == 7 && h == 2)
  }

  test("calculate_default_transform: global extent — poles fail, " +
    "bbox-diagonal fallback") {
    // the reference's default [-180,-90,180,90] envelope
    // (handler.py:118): the lat=90 edges fail to transform, bounds come
    // from the surviving 5%-step samples (max |lat| sampled = 81)
    val (t, w, h) = Reproject
      .calculateDefaultTransform(Geodetic, 6, 4, -180, -90, 180, 90)
      .fold(e => fail(e), identity)
    assert(approx(t(0), -20037508.342789244))
    assert(approx(t(3), 16213801.067583967)) // y(81 deg)
    assert(approx(t(1), 7148905.702416364))
    assert(w == 6 && h == 5)
  }

  test("parseSrcCrs: the reference's config forms") {
    // example.ini:14 writes `+zone=32S` — PROJ's atoi zone parse
    // ignores the trailing letter, so the reference runtime resolves
    // this to zone 32 NORTH; south needs the +south flag
    assert(Reproject.parseSrcCrs("+proj=utm +zone=32S +datum=WGS84") ==
      Right(Utm(32, south = false)))
    assert(Reproject.parseSrcCrs("+proj=utm +zone=32 +south +datum=WGS84") ==
      Right(Utm(32, south = true)))
    // malformed configs are Lefts, never exceptions or silent zones
    assert(Reproject.parseSrcCrs("EPSG:326ab").isLeft)
    assert(Reproject.parseSrcCrs("EPSG:326").isLeft)
    assert(Reproject.parseSrcCrs("EPSG:32699").isLeft)
    assert(Reproject.parseSrcCrs("+proj=utm +zone=99 +datum=WGS84").isLeft)
    assert(Reproject.parseSrcCrs("+proj=utm +zone=x +datum=WGS84").isLeft)
    assert(Reproject.parseSrcCrs("+proj=utm +zone=18 +datum=WGS84") ==
      Right(Utm(18, south = false)))
    assert(Utm(32, south = true).epsg == 32732)
    assert(Utm(18, south = false).epsg == 32618)
    assert(Reproject.parseSrcCrs("EPSG:4326") == Right(Geodetic))
    assert(Reproject.parseSrcCrs("EPSG:3857") == Right(WebMercator))
    assert(Reproject.parseSrcCrs("EPSG:32732") ==
      Right(Utm(32, south = true)))
    assert(Reproject.parseSrcCrs("+proj=longlat +datum=WGS84") ==
      Right(Geodetic))
    assert(Reproject.parseSrcCrs("+proj=sinu").isLeft)
    assert(Reproject.parseSrcCrs("garbage").isLeft)
  }

  // Independent Snyder (1987) FORWARD transverse mercator, so the
  // inverse under test round-trips against a separate implementation
  private def utmForward(zone: Int, south: Boolean,
                         lon: Double, lat: Double): (Double, Double) = {
    val a = 6378137.0; val f = 1 / 298.257223563
    val e2 = f * (2 - f); val ep2 = e2 / (1 - e2); val k0 = 0.9996
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    val lam0 = math.toRadians(zone * 6.0 - 183.0)
    val n = a / math.sqrt(1 - e2 * math.pow(math.sin(phi), 2))
    val t = math.pow(math.tan(phi), 2)
    val c = ep2 * math.pow(math.cos(phi), 2)
    val aa = (lam - lam0) * math.cos(phi)
    val m = a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * math.pow(e2, 3) / 256) * phi -
      (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * math.pow(e2, 3) / 1024) * math.sin(2 * phi) +
      (15 * e2 * e2 / 256 + 45 * math.pow(e2, 3) / 1024) * math.sin(4 * phi) -
      (35 * math.pow(e2, 3) / 3072) * math.sin(6 * phi))
    val x = k0 * n * (aa + (1 - t + c) * math.pow(aa, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120) + 500000.0
    val y = k0 * (m + n * math.tan(phi) * (aa * aa / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720))
    (x, if (south) y + 10000000.0 else y)
  }

  test("UTM inverse: central-meridian anchor + forward round-trip") {
    // zone 32 central meridian (lon 9), equator: E=500000, N=0 (north)
    val (lon0, lat0) = Reproject.utmToGeodetic(Utm(32, south = false),
      500000.0, 0.0).get
    assert(approx(lon0, 9.0, 1e-9) && math.abs(lat0) < 1e-9)
    // round-trip a spread of in-zone points against the independent
    // forward series; agreement must be centimeter-class (<1e-7 deg)
    val cases = Seq(
      (Utm(32, south = true), 9.5, -44.0),
      (Utm(32, south = true), 7.0, -12.5),
      (Utm(18, south = false), -73.5, 40.5),
      (Utm(33, south = false), 16.37, 48.21),
      (Utm(1, south = false), -177.0, 65.0))
    cases.foreach { case (u, lon, lat) =>
      val (e, n) = utmForward(u.zone, u.south, lon, lat)
      val (lonB, latB) = Reproject.utmToGeodetic(u, e, n).get
      assert(math.abs(lonB - lon) < 1e-7, s"$u lon: $lonB vs $lon")
      assert(math.abs(latB - lat) < 1e-7, s"$u lat: $latB vs $lat")
    }
  }

  test("UTM src_crs flows through to mercator") {
    // (lon 9, lat 45) via zone-32 coords must land on the pinned
    // geodetic mercator value for the same point
    val (e, n) = utmForward(32, south = false, 9.0, 45.0)
    val (x, y) = Reproject.toMercator(Utm(32, south = false), e, n).get
    val (xd, yd) = Reproject.geodeticToMercator(9.0, 45.0).get
    assert(math.abs(x - xd) < 0.01 && math.abs(y - yd) < 0.01)
  }
}
