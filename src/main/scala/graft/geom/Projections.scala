package graft.geom

/** Parameterized map projections beyond UTM: arbitrary transverse Mercator
  * (any ellipsoid / central meridian / scale / false origin — EPSG:27700 and
  * the ETRS89 258xx family), Lambert Conformal Conic 2SP (EPSG:2154 family),
  * and Lambert Azimuthal Equal Area (EPSG:3035), plus the 7-parameter Helmert
  * datum shift for non-WGS84 datums.
  *
  * Reference semantics: erde/op/convert.py:5 accepts any EPSG via pyproj;
  * these cover the national grids a user hits after 4326/3857/UTM. Formulas
  * are public: Karney 2011 (TM series, via [[TransverseMercator]] helpers),
  * EPSG Guidance Note 7-2 / Snyder 1987 "Map Projections — A Working Manual"
  * (LCC eq. 15-1..15-11, LAEA eq. 24-2..24-14, 3-12), and the OSGB
  * "A guide to coordinate systems in Great Britain" (Helmert parameters).
  *
  * Datum caveat (documented, matching pyproj's non-grid fallback): the
  * WGS84⇄OSGB36 Helmert shift is the published 7-parameter set, accurate to
  * ~2 m across Great Britain — pyproj only beats that when the OSTN15
  * correction grid is installed.
  */
object Projections {

  final case class Ellipsoid(a: Double, f: Double) {
    val n: Double = f / (2 - f)      // third flattening
    val e2: Double = f * (2 - f)     // eccentricity²
    val e: Double = math.sqrt(e2)
  }

  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 1 / 298.257223563)
  val GRS80: Ellipsoid = Ellipsoid(6378137.0, 1 / 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 1 / 299.3249646)

  /** A projected CRS: forward takes geodetic degrees ON THE PROJECTION'S
    * DATUM and returns easting/northing metres.
    */
  sealed trait Projection extends Serializable {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  private def wrapDeg(d: Double): Double = {
    if (!java.lang.Double.isFinite(d)) return d // NaN/±Inf propagate, never loop
    var x = d % 360.0 // exact (IEEE remainder toward zero); bounds the loop
    if (x > 180) x -= 360
    if (x < -180) x += 360
    x
  }

  /** Transverse Mercator with arbitrary natural origin (Karney series to n⁶,
    * same machinery as UTM; non-zero lat0 subtracts the rectifying latitude
    * ξ₀ from the northing, per the EPSG TM (variant A) definition).
    */
  final class TmProjection(val ell: Ellipsoid, lon0Deg: Double, lat0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    import TransverseMercator.{alphaOf, betaOf, taupfE, taufE}
    private val e = ell.e
    private val bigA = ell.a / (1 + ell.n) *
      (1 + math.pow(ell.n, 2) / 4 + math.pow(ell.n, 4) / 64 + math.pow(ell.n, 6) / 256)
    private val alpha = alphaOf(ell.n)
    private val beta = betaOf(ell.n)
    private val xi0 = { // rectifying latitude of lat0 (λ = λ0 ⇒ η = 0)
      val xip = math.atan2(taupfE(math.tan(math.toRadians(lat0Deg)), e), 1.0)
      var xi = xip
      var j = 0
      while (j < 6) { xi += alpha(j) * math.sin(2.0 * (j + 1) * xip); j += 1 }
      xi
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(wrapDeg(lonDeg - lon0Deg))
      val taup = taupfE(math.tan(phi), e)
      val xip = math.atan2(taup, math.cos(lam))
      val etap = asinh(math.sin(lam) / math.hypot(taup, math.cos(lam)))
      var xi = xip
      var eta = etap
      var j = 0
      while (j < 6) {
        val k = 2.0 * (j + 1)
        xi += alpha(j) * math.sin(k * xip) * math.cosh(k * etap)
        eta += alpha(j) * math.cos(k * xip) * math.sinh(k * etap)
        j += 1
      }
      (fe + k0 * bigA * eta, fn + k0 * bigA * (xi - xi0))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - fn) / (k0 * bigA) + xi0
      val eta = (x - fe) / (k0 * bigA)
      var xip = xi
      var etap = eta
      var j = 0
      while (j < 6) {
        val k = 2.0 * (j + 1)
        xip -= beta(j) * math.sin(k * xi) * math.cosh(k * eta)
        etap -= beta(j) * math.cos(k * xi) * math.sinh(k * eta)
        j += 1
      }
      val taup = math.sin(xip) / math.hypot(math.sinh(etap), math.cos(xip))
      val lam = math.atan2(math.sinh(etap), math.cos(xip))
      val phi = math.atan(taufE(taup, e, ell.e2))
      (wrapDeg(lon0Deg + math.toDegrees(lam)), math.toDegrees(phi))
    }
  }

  private def asinh(x: Double): Double = math.log(x + math.hypot(1.0, x))

  /** Lambert Conformal Conic, 2 standard parallels (EPSG method 9802 /
    * Snyder eq. 15-1..15-11). The cone constant and scaled radii are
    * precomputed; `oracleConstants` exposes them for the DuckDB mirror.
    */
  final class LccProjection(val ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, fe: Double, fn: Double) extends Projection {
    private val e = ell.e
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val nCone = (math.log(mOf(phi1)) - math.log(mOf(phi2))) /
      (math.log(tOf(phi1)) - math.log(tOf(phi2)))
    private val aF = ell.a * mOf(phi1) / (nCone * math.pow(tOf(phi1), nCone))
    private val rho0 = aF * math.pow(tOf(math.toRadians(lat0Deg)), nCone)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val theta = nCone * math.toRadians(wrapDeg(lonDeg - lon0Deg))
      val rho = aF * math.pow(tOf(phi), nCone)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sign = if (nCone >= 0) 1.0 else -1.0
      val rho = sign * math.hypot(dx, dy)
      val theta = math.atan2(sign * dx, sign * dy)
      val t = math.pow(rho / aF, 1 / nCone)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 8) { // Snyder 7-9: converges to double precision in ≲5
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
        i += 1
      }
      (wrapDeg(lon0Deg + math.toDegrees(theta / nCone)), math.toDegrees(phi))
    }

    /** (e, nCone, aF, rho0, lon0Deg, fe, fn) for the SQL mirror. */
    private[graft] def oracleConstants: (Double, Double, Double, Double, Double, Double, Double) =
      (e, nCone, aF, rho0, lon0Deg, fe, fn)
  }

  /** Lambert Azimuthal Equal Area, oblique ellipsoidal form (EPSG method
    * 9820 / Snyder eq. 24-2..24-14 with the authalic latitude of 3-12).
    */
  final class LaeaProjection(val ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      fe: Double, fn: Double) extends Projection {
    private val e = ell.e
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - ell.e2) * (s / (1 - ell.e2 * s * s) -
        1 / (2 * e) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = qOf(math.Pi / 2)
    private val phi0 = math.toRadians(lat0Deg)
    private val beta0 = math.asin(qOf(phi0) / qp)
    private val rq = ell.a * math.sqrt(qp / 2)
    private val m0 = math.cos(phi0) / math.sqrt(1 - ell.e2 * math.sin(phi0) * math.sin(phi0))
    private val d = ell.a * m0 / (rq * math.cos(beta0))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dlam = math.toRadians(wrapDeg(lonDeg - lon0Deg))
      val beta = math.asin(qOf(phi) / qp)
      val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
        math.cos(beta0) * math.cos(beta) * math.cos(dlam)))
      (fe + b * d * math.cos(beta) * math.sin(dlam),
        fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
          math.sin(beta0) * math.cos(beta) * math.cos(dlam)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) / d
      val dy = (y - fn) * d
      val rho = math.hypot(dx, dy)
      if (rho < 1e-12) return (lon0Deg, lat0Deg)
      val ce = 2 * math.asin(rho / (2 * rq))
      val betaP = math.asin(math.cos(ce) * math.sin(beta0) +
        dy * math.sin(ce) * math.cos(beta0) / rho)
      val lam = math.atan2(dx * math.sin(ce),
        rho * math.cos(beta0) * math.cos(ce) - dy * math.sin(beta0) * math.sin(ce))
      // authalic → geodetic latitude: fixed-point on q (Snyder 3-16)
      val q = qp * math.sin(betaP)
      var phi = math.asin(q / 2)
      var i = 0
      while (i < 8) {
        val s = math.sin(phi)
        val corr = math.pow(1 - ell.e2 * s * s, 2) / (2 * math.cos(phi)) *
          (q / (1 - ell.e2) - s / (1 - ell.e2 * s * s) +
            1 / (2 * e) * math.log((1 - e * s) / (1 + e * s)))
        phi += corr
        i += 1
      }
      (wrapDeg(lon0Deg + math.toDegrees(lam)), math.toDegrees(phi))
    }

    /** (e, e2, qp, sinβ₀, cosβ₀, Rq, D, lon0Deg, fe, fn) for the SQL mirror. */
    private[graft] def oracleConstants: (Double, Double, Double, Double, Double, Double, Double, Double, Double, Double) =
      (e, ell.e2, qp, math.sin(beta0), math.cos(beta0), rq, d, lon0Deg, fe, fn)
  }

  /** Albers Equal Area Conic, 2 standard parallels (EPSG method 9822 /
    * Snyder eq. 14-1..14-12 ellipsoidal, authalic q of 3-12).
    */
  final class AlbersProjection(val ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, fe: Double, fn: Double) extends Projection {
    private val e = ell.e
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - ell.e2) * (s / (1 - ell.e2 * s * s) -
        1 / (2 * e) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val nCone = (mOf(phi1) * mOf(phi1) - mOf(phi2) * mOf(phi2)) /
      (qOf(phi2) - qOf(phi1))
    private val cBig = mOf(phi1) * mOf(phi1) + nCone * qOf(phi1)
    private val rho0 = ell.a * math.sqrt(cBig - nCone * qOf(math.toRadians(lat0Deg))) / nCone

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val theta = nCone * math.toRadians(wrapDeg(lonDeg - lon0Deg))
      val rho = ell.a * math.sqrt(cBig - nCone * qOf(phi)) / nCone
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sign = if (nCone >= 0) 1.0 else -1.0
      val rho = sign * math.hypot(dx, dy)
      val theta = math.atan2(sign * dx, sign * dy)
      val q = (cBig - (rho * nCone / ell.a) * (rho * nCone / ell.a)) / nCone
      var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
      var i = 0
      while (i < 8) { // Snyder 3-16 fixed point on the authalic latitude
        val s = math.sin(phi)
        phi += math.pow(1 - ell.e2 * s * s, 2) / (2 * math.cos(phi)) *
          (q / (1 - ell.e2) - s / (1 - ell.e2 * s * s) +
            1 / (2 * e) * math.log((1 - e * s) / (1 + e * s)))
        i += 1
      }
      (wrapDeg(lon0Deg + math.toDegrees(theta / nCone)), math.toDegrees(phi))
    }

    /** (e, e2, nCone, C, rho0, a, lon0Deg, fe, fn) for the SQL mirror. */
    private[graft] def oracleConstants: (Double, Double, Double, Double, Double, Double, Double, Double, Double) =
      (e, ell.e2, nCone, cBig, rho0, ell.a, lon0Deg, fe, fn)
  }

  // ------------------------------------------------------------------ datum

  /** 7-parameter Helmert transform on geocentric coordinates (position-vector
    * rotation convention, the EPSG 9606 sign usage the OSGB guide documents).
    * Rotations in arc-seconds, scale in ppm.
    */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, ppm: Double) {
    private val rx = math.toRadians(rxSec / 3600)
    private val ry = math.toRadians(rySec / 3600)
    private val rz = math.toRadians(rzSec / 3600)
    private val s = 1 + ppm * 1e-6
    def apply(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      tx + s * (x - rz * y + ry * z),
      ty + s * (rz * x + y - rx * z),
      tz + s * (-ry * x + rx * y + z))
    /** Small-parameter inverse (standard practice; sub-mm at these scales). */
    def inverted: Helmert = Helmert(-tx, -ty, -tz, -rxSec, -rySec, -rzSec, -ppm)
  }

  /** OSGB36 → WGS84 (published OSGB small-parameter set, ~2 m accuracy). */
  val osgb36ToWgs84: Helmert = Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

  /** Geodetic degrees (h = 0) → geocentric metres on `ell`. */
  def toGeocentric(ell: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
    (nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1 - ell.e2) * math.sin(phi))
  }

  /** Geocentric metres → geodetic degrees on `ell` (fixed-point iteration on
    * the latitude; converges to double precision for surface points).
    */
  def toGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1 - ell.e2))
    var i = 0
    while (i < 8) {
      val nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
      phi = math.atan2(z + ell.e2 * nu * math.sin(phi), p)
      i += 1
    }
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
  }

  // --------------------------------------------------------------- registry

  /** A full CRS: projection + the datum shift from WGS84 geodetic to the
    * projection's datum (None = datum is WGS84-equivalent, e.g. ETRS89/RGF93
    * at the metre scale, same convention as pyproj's ballpark transforms).
    */
  final case class CrsDef(proj: Projection, ell: Ellipsoid, fromWgs84: Option[Helmert])

  /** EPSG:27700 — British National Grid (Airy 1830, OSGB36 datum). */
  val osgb: CrsDef = CrsDef(
    new TmProjection(Airy1830, lon0Deg = -2, lat0Deg = 49, k0 = 0.9996012717,
      fe = 400000, fn = -100000),
    Airy1830, Some(osgb36ToWgs84.inverted))

  /** EPSG:2154 — RGF93 / Lambert-93 (GRS80, LCC 2SP). */
  val lambert93: CrsDef = CrsDef(
    new LccProjection(GRS80, lat1Deg = 49, lat2Deg = 44, lat0Deg = 46.5,
      lon0Deg = 3, fe = 700000, fn = 6600000),
    GRS80, None)

  /** EPSG:3035 — ETRS89-extended / LAEA Europe (GRS80). */
  val laeaEurope: CrsDef = CrsDef(
    new LaeaProjection(GRS80, lat0Deg = 52, lon0Deg = 10, fe = 4321000, fn = 3210000),
    GRS80, None)

  /** EPSG:5070 — NAD83 / Conus Albers (GRS80; NAD83 ≈ WGS84 at the metre
    * scale, same convention as the ETRS89/RGF93 entries).
    */
  val conusAlbers: CrsDef = CrsDef(
    new AlbersProjection(GRS80, lat1Deg = 29.5, lat2Deg = 45.5, lat0Deg = 23,
      lon0Deg = -96, fe = 0, fn = 0),
    GRS80, None)

  /** EPSG:3577 — GDA94 / Australian Albers (GRS80). */
  val australianAlbers: CrsDef = CrsDef(
    new AlbersProjection(GRS80, lat1Deg = -18, lat2Deg = -36, lat0Deg = 0,
      lon0Deg = 132, fe = 0, fn = 0),
    GRS80, None)

  private val registry: Map[Int, CrsDef] =
    Map(27700 -> osgb, 2154 -> lambert93, 3035 -> laeaEurope,
      5070 -> conusAlbers, 3577 -> australianAlbers) ++
      // ETRS89 / UTM zones 28N–38N (EPSG:25828–25838): standard TM on GRS80
      (25828 to 25838).map { code =>
        code -> CrsDef(
          new TmProjection(GRS80, lon0Deg = (code - 25800) * 6 - 183, lat0Deg = 0,
            k0 = 0.9996, fe = 500000, fn = 0), GRS80, None)
      }.toMap

  def supported(epsg: Int): Boolean = registry.contains(epsg)

  /** WGS84 lon/lat degrees → projected x/y for `epsg`. */
  def forward(epsg: Int, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val crs = registry(epsg)
    val (lon, lat) = crs.fromWgs84 match {
      case None => (lonDeg, latDeg)
      case Some(h) =>
        val (x, y, z) = toGeocentric(WGS84, lonDeg, latDeg)
        val (x2, y2, z2) = h(x, y, z)
        toGeodetic(crs.ell, x2, y2, z2)
    }
    crs.proj.forward(lon, lat)
  }

  /** Projected x/y for `epsg` → WGS84 lon/lat degrees. */
  def inverse(epsg: Int, x: Double, y: Double): (Double, Double) = {
    val crs = registry(epsg)
    val (lon, lat) = crs.proj.inverse(x, y)
    crs.fromWgs84 match {
      case None => (lon, lat)
      case Some(h) =>
        val (gx, gy, gz) = toGeocentric(crs.ell, lon, lat)
        val (x2, y2, z2) = h.inverted(gx, gy, gz)
        toGeodetic(WGS84, x2, y2, z2)
    }
  }

  def toProjected(g: Geom, epsg: Int): Geom = Geom.mapCoords(g)(forward(epsg, _, _))
  def fromProjected(g: Geom, epsg: Int): Geom = Geom.mapCoords(g)(inverse(epsg, _, _))
}
