package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class TransverseMercatorSpec extends AnyFunSuite {

  import TransverseMercator._

  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)

  test("central meridian identities: E=500000 exactly, equator N=0, south FN") {
    val (e0, n0) = forward(3.0, 0.0, zone = 31, south = false)
    assert(e0 == 500000.0 && n0 == 0.0)
    val (e45, n45) = forward(3.0, 45.0, 31, south = false)
    assert(e45 == 500000.0)
    // south false-northing is exactly +10^7 on the same zone math
    val (_, nS) = forward(3.0, 45.0, 31, south = true)
    assert(nS == n45 + 1e7)
    // antisymmetric in latitude
    val (_, nNeg) = forward(3.0, -45.0, 31, south = false)
    assert(math.abs(nNeg + n45) < 1e-6)
  }

  test("northing on the central meridian = k0 × meridian arc (independent integral)") {
    // meridian arc by Simpson integration of M(φ) = a(1-e²)/(1-e²sin²φ)^{3/2}
    def meridianArc(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      val steps = 100000
      val h = phi / steps
      def m(p: Double): Double = a * (1 - e2) / math.pow(1 - e2 * math.sin(p) * math.sin(p), 1.5)
      var s = m(0) + m(phi)
      var i = 1
      while (i < steps) { s += (if (i % 2 == 1) 4 else 2) * m(i * h); i += 1 }
      s * h / 3
    }
    Seq(15.0, 45.0, 70.0).foreach { lat =>
      val (_, n) = forward(3.0, lat, 31, south = false)
      val expected = 0.9996 * meridianArc(lat)
      assert(math.abs(n - expected) < 1e-3, s"lat=$lat n=$n expected=$expected")
    }
  }

  test("easting symmetric about the central meridian; scale k0 at CM") {
    val (eE, _) = forward(3.0 + 2.0, 10.0, 31, south = false)
    val (eW, _) = forward(3.0 - 2.0, 10.0, 31, south = false)
    assert(math.abs(eE + eW - 1e6) < 1e-6)
    // point scale on the CM is k0 exactly: dE/dλ at the equator ≈ k0·a
    val d = 1e-5
    val (e1, _) = forward(3.0 + d, 0.0, 31, south = false)
    val scale = (e1 - 500000.0) / (a * math.toRadians(d))
    // 1e-6 tolerance: finite-difference + fp-cancellation noise dominates
    assert(math.abs(scale - 0.9996) < 1e-6, s"scale=$scale")
  }

  test("forward∘inverse round-trips to 1e-9 degrees across the zone and beyond") {
    for {
      dLon <- Seq(-3.0, -1.5, -0.01, 0.0, 0.4, 2.9, 5.0)
      lat <- Seq(-84.0, -60.0, -30.5, -0.003, 0.0, 10.25, 45.0, 72.0, 84.0)
    } {
      val lon = 3.0 + dLon
      val (e, n) = forward(lon, lat, 31, south = lat < 0)
      val (lon2, lat2) = inverse(e, n, 31, south = lat < 0)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($e,$n) -> ($lon2,$lat2)")
    }
  }

  test("utmZoneOf parses the EPSG ranges") {
    assert(utmZoneOf(32631).contains((31, false)))
    assert(utmZoneOf(32601).contains((1, false)))
    assert(utmZoneOf(32660).contains((60, false)))
    assert(utmZoneOf(32733).contains((33, true)))
    assert(utmZoneOf(4326).isEmpty && utmZoneOf(32661).isEmpty && utmZoneOf(32700).isEmpty)
  }

  test("geometry mapping keeps structure") {
    val poly = WKT.read("POLYGON ((2 40, 4 40, 4 42, 2 42, 2 40), (2.5 40.5, 3 40.5, 3 41, 2.5 41, 2.5 40.5))")
    val utm = toUtm(poly, 31, south = false)
    val back = fromUtm(utm, 31, south = false)
    def coords(g: Geom): Seq[Double] = {
      val buf = scala.collection.mutable.ArrayBuffer[Double]()
      Geom.mapCoords(g) { (x, y) => buf += x; buf += y; (x, y) }
      buf.toSeq
    }
    val bc = coords(back); val oc = coords(poly)
    assert(bc.length == oc.length)
    bc.zip(oc).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }
}
