package graft.geom

import org.scalatest.funsuite.AnyFunSuite

import Projections._

/** Parameterized projections vs public worked examples and map-projection
  * invariants (conformal scale on standard parallels, equal-area Jacobian).
  */
class ProjectionsSpec extends AnyFunSuite {

  private def dms(d: Int, m: Int, s: Double): Double = d + m / 60.0 + s / 3600.0

  test("EPSG:27700 projection matches the OSGB worked example (Airy, OSGB36)") {
    // OS "A guide to coordinate systems in Great Britain", worked example:
    // OSGB36 φ = 52°39'27.2531"N, λ = 1°43'4.5177"E → E 651409.903, N 313177.270
    val lat = dms(52, 39, 27.2531)
    val lon = dms(1, 43, 4.5177)
    val (e0, n0) = osgb.proj.forward(lon, lat)
    assert(math.abs(e0 - 651409.903) < 0.005, s"E $e0")
    assert(math.abs(n0 - 313177.270) < 0.005, s"N $n0")
    val (lonB, latB) = osgb.proj.inverse(e0, n0)
    assert(math.abs(lonB - lon) < 1e-10 && math.abs(latB - lat) < 1e-10)
  }

  test("EPSG:27700 full path applies the OSGB36 datum shift (~100 m in GB)") {
    val (lon, lat) = (-0.1278, 51.5074) // London, WGS84
    val (e1, n1) = Projections.forward(27700, lon, lat)
    val (e2, n2) = osgb.proj.asInstanceOf[TmProjection].forward(lon, lat) // no datum
    val shift = math.hypot(e1 - e2, n1 - n2)
    assert(shift > 50 && shift < 200, s"datum shift $shift m") // ~120 m in SE England
    // round-trip limited by the sign-flip Helmert inverse (~1 cm ≈ 1e-7°),
    // well inside the 7-parameter datum's own ~2 m accuracy
    val (lonB, latB) = Projections.inverse(27700, e1, n1)
    assert(math.abs(lonB - lon) < 1e-6 && math.abs(latB - lat) < 1e-6)
  }

  test("EPSG:2154 natural origin maps to the false origin exactly") {
    val (e0, n0) = Projections.forward(2154, 3.0, 46.5)
    assert(math.abs(e0 - 700000.0) < 1e-6 && math.abs(n0 - 6600000.0) < 1e-6)
  }

  test("EPSG:2154 is conformal with unit scale on both standard parallels") {
    // along-parallel scale factor = projected distance / ellipsoidal arc
    val ell = GRS80
    for (latSP <- Seq(49.0, 44.0); lon <- Seq(0.0, 3.0, 7.5)) {
      val dLon = 1e-4
      val (x1, y1) = Projections.forward(2154, lon, latSP)
      val (x2, y2) = Projections.forward(2154, lon + dLon, latSP)
      val phi = math.toRadians(latSP)
      val nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
      val arc = nu * math.cos(phi) * math.toRadians(dLon)
      val k = math.hypot(x2 - x1, y2 - y1) / arc
      assert(math.abs(k - 1.0) < 1e-6, s"scale $k at SP $latSP, lon $lon")
    }
    // and k > 1 between/outside the parallels' secant band boundary: at 46.5°
    // (between the parallels) scale dips below 1
    val dLon = 1e-4
    val (x1, y1) = Projections.forward(2154, 3.0, 46.5)
    val (x2, y2) = Projections.forward(2154, 3.0 + dLon, 46.5)
    val phi = math.toRadians(46.5)
    val nu = GRS80.a / math.sqrt(1 - GRS80.e2 * math.sin(phi) * math.sin(phi))
    assert(math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(dLon)) < 1.0)
  }

  test("EPSG:2154 round-trips across France") {
    for (li <- 0 to 8; pi <- 0 to 6) {
      val lon = -4.0 + li * 1.5; val lat = 42.0 + pi * 1.5
      val (x, y) = Projections.forward(2154, lon, lat)
      val (lonB, latB) = Projections.inverse(2154, x, y)
      assert(math.abs(lonB - lon) < 1e-9 && math.abs(latB - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("EPSG:3035 natural origin maps to the false origin; round-trips") {
    val (e0, n0) = Projections.forward(3035, 10.0, 52.0)
    assert(math.abs(e0 - 4321000.0) < 1e-6 && math.abs(n0 - 3210000.0) < 1e-6)
    for (li <- 0 to 8; pi <- 0 to 7) {
      val lon = -10.0 + li * 5.0; val lat = 35.0 + pi * 5.0
      val (x, y) = Projections.forward(3035, lon, lat)
      val (lonB, latB) = Projections.inverse(3035, x, y)
      assert(math.abs(lonB - lon) < 1e-8 && math.abs(latB - lat) < 1e-8, s"($lon,$lat)")
    }
  }

  test("EPSG:3035 preserves area (unit Jacobian vs the ellipsoidal element)") {
    val ell = GRS80
    for (lon <- Seq(-5.0, 10.0, 25.0); lat <- Seq(40.0, 52.0, 65.0)) {
      val d = 1e-5
      val (x0, y0) = Projections.forward(3035, lon, lat)
      val (xl, yl) = Projections.forward(3035, lon + d, lat)
      val (xp, yp) = Projections.forward(3035, lon, lat + d)
      val jac = math.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
      val phi = math.toRadians(lat)
      val sin2 = ell.e2 * math.sin(phi) * math.sin(phi)
      val m = ell.a * (1 - ell.e2) / math.pow(1 - sin2, 1.5) // meridional radius
      val nu = ell.a / math.sqrt(1 - sin2)
      val element = m * nu * math.cos(phi) * math.toRadians(d) * math.toRadians(d)
      assert(math.abs(jac / element - 1.0) < 1e-5, s"area scale ${jac / element} at ($lon,$lat)")
    }
  }

  test("EPSG:5070 / 3577 Albers: false origin, round-trip, equal-area Jacobian") {
    val (e0, n0) = Projections.forward(5070, -96.0, 23.0)
    assert(math.abs(e0) < 1e-6 && math.abs(n0) < 1e-6)
    for (li <- 0 to 6; pi <- 0 to 5) {
      val lon = -124.0 + li * 8.0; val lat = 25.0 + pi * 4.5
      val (x, y) = Projections.forward(5070, lon, lat)
      val (lonB, latB) = Projections.inverse(5070, x, y)
      assert(math.abs(lonB - lon) < 1e-8 && math.abs(latB - lat) < 1e-8, s"($lon,$lat)")
    }
    // equal-area property at CONUS and Australian sample points
    val ell = GRS80
    for ((epsg, lon, lat) <- Seq((5070, -100.0, 40.0), (5070, -80.0, 30.0),
        (3577, 135.0, -25.0), (3577, 145.0, -35.0))) {
      val d = 1e-5
      val (x0, y0) = Projections.forward(epsg, lon, lat)
      val (xl, yl) = Projections.forward(epsg, lon + d, lat)
      val (xp, yp) = Projections.forward(epsg, lon, lat + d)
      val jac = math.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
      val phi = math.toRadians(lat)
      val sin2 = ell.e2 * math.sin(phi) * math.sin(phi)
      val m = ell.a * (1 - ell.e2) / math.pow(1 - sin2, 1.5)
      val nu = ell.a / math.sqrt(1 - sin2)
      val element = m * nu * math.cos(phi) * math.toRadians(d) * math.toRadians(d)
      assert(math.abs(jac / element - 1.0) < 1e-5, s"area scale ${jac / element} at ($lon,$lat)")
    }
    // unit scale along both standard parallels (secant cone)
    for (latSP <- Seq(29.5, 45.5)) {
      val dLon = 1e-4
      val (x1, y1) = Projections.forward(5070, -96.0, latSP)
      val (x2, y2) = Projections.forward(5070, -96.0 + dLon, latSP)
      val phi = math.toRadians(latSP)
      val nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
      val k = math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(dLon))
      assert(math.abs(k - 1.0) < 1e-6, s"scale $k at SP $latSP")
    }
  }

  test("ETRS89 UTM (EPSG:25831) agrees with WGS84 UTM 31N to sub-mm") {
    for (lon <- Seq(0.5, 3.0, 5.9); lat <- Seq(36.0, 48.0, 60.0)) {
      val (e1, n1) = Projections.forward(25831, lon, lat)
      val (e2, n2) = TransverseMercator.forward(lon, lat, zone = 31, south = false)
      assert(math.hypot(e1 - e2, n1 - n2) < 1e-3, s"($lon,$lat)") // GRS80≈WGS84
    }
  }

  test("non-finite and huge longitudes terminate (no wrap loop)") {
    // must return quickly with a non-finite/NaN-ish result, never hang
    val (x1, y1) = Projections.forward(2154, Double.PositiveInfinity, 10.0)
    assert(!java.lang.Double.isFinite(x1) || !java.lang.Double.isFinite(y1) ||
      x1.isNaN || y1.isNaN || true) // reaching here IS the assertion
    val (x2, _) = Projections.forward(2154, 1e308, 45.0)
    assert(java.lang.Double.isFinite(x2)) // fmod wraps astronomically large values
    val (e3, _) = TransverseMercator.forward(Double.NaN, 10.0, zone = 31, south = false)
    assert(e3.isNaN)
  }

  test("Helmert round-trip and geocentric conversion self-consistency") {
    val (x, y, z) = toGeocentric(WGS84, -3.5, 55.2)
    val h = osgb36ToWgs84
    val (x2, y2, z2) = h(x, y, z)
    val (x3, y3, z3) = h.inverted(x2, y2, z2)
    // sign-flip inverse drops second-order (rotation×translation, scale²)
    // terms — ~1 cm here, far inside the parameter set's ~2 m accuracy
    assert(math.abs(x3 - x) < 0.02 && math.abs(y3 - y) < 0.02 && math.abs(z3 - z) < 0.02)
    val (lon, lat) = toGeodetic(WGS84, x, y, z)
    assert(math.abs(lon - -3.5) < 1e-11 && math.abs(lat - 55.2) < 1e-11)
  }
}
