package graft.geom

/** WGS84 transverse Mercator (UTM zones EPSG:326xx / 327xx), Karney-style
  * Krüger series to n⁶ (public formulas: Karney 2011 "Transverse Mercator
  * with an accuracy of a few nanometers"; the same series proj/GeographicLib
  * use). Reference driver: erde/op/convert.py:5 accepts any EPSG via pyproj —
  * UTM is the family a GIS user hits first beyond 4326/3857.
  *
  * Accuracy: sub-micrometre within a zone's extent (series truncation at n⁶);
  * forward∘inverse round-trips to ~1e-12 degrees.
  */
object TransverseMercator {

  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val n = f / (2 - f)
  private val e2 = f * (2 - f) // eccentricity²
  private val e = math.sqrt(e2)
  private val k0 = 0.9996

  /** Rectifying radius A = a/(1+n)·(1 + n²/4 + n⁴/64 + n⁶/256). */
  private val A = a / (1 + n) * (1 + math.pow(n, 2) / 4 + math.pow(n, 4) / 64 + math.pow(n, 6) / 256)

  // Karney 2011 eq. 35/36 coefficients (forward α, inverse β), order n⁶ —
  // parameterized by the third flattening so [[Projections]] reuses them for
  // arbitrary ellipsoids
  private[geom] def alphaOf(n: Double): Array[Double] = {
    val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
  }
  private[geom] def betaOf(n: Double): Array[Double] = {
    val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
  }
  private val alpha: Array[Double] = alphaOf(n)
  private val beta: Array[Double] = betaOf(n)

  /** τ' (conformal tangent) from τ = tanφ (GeographicLib Math::taupf),
    * parameterized by eccentricity for [[Projections]].
    */
  private[geom] def taupfE(tau: Double, e: Double): Double = {
    val tau1 = math.hypot(1.0, tau)
    val sig = math.sinh(e * atanh(e * tau / tau1))
    math.hypot(1.0, sig) * tau - sig * tau1
  }
  private def taupf(tau: Double): Double = taupfE(tau, e)

  /** τ from τ' by Newton iteration (GeographicLib Math::tauf). */
  private[geom] def taufE(taup: Double, e: Double, e2: Double): Double = {
    val tol = math.sqrt(Double.MinPositiveValue) // ~1.5e-154; iteration-limit guards
    var tau = taup / (1 - e2)
    val stol = tol * math.max(1.0, math.abs(taup))
    var i = 0
    while (i < 5) {
      val taupa = taupfE(tau, e)
      val dtau = (taup - taupa) * (1 + (1 - e2) * tau * tau) /
        ((1 - e2) * math.hypot(1.0, tau) * math.hypot(1.0, taupa))
      tau += dtau
      if (math.abs(dtau) < stol) i = 5 else i += 1
    }
    tau
  }
  private def tauf(taup: Double): Double = taufE(taup, e, e2)

  private[geom] def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  /** lon/lat (degrees) → (easting, northing) metres for the given zone
    * (`south` selects the 10 000 km false northing).
    */
  def forward(lonDeg: Double, latDeg: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lon0 = zone * 6.0 - 183.0
    val phi = math.toRadians(latDeg)
    var dLon = lonDeg - lon0
    if (java.lang.Double.isFinite(dLon)) {
      dLon = dLon % 360.0 // exact; non-finite values propagate instead of looping
      if (dLon > 180) dLon -= 360
      if (dLon < -180) dLon += 360
    }
    val lam = math.toRadians(dLon)
    val taup = taupf(math.tan(phi))
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
    val easting = 500000.0 + k0 * A * eta
    val northing = (if (south) 10000000.0 else 0.0) + k0 * A * xi
    (easting, northing)
  }

  /** (easting, northing) metres → lon/lat degrees. */
  def inverse(easting: Double, northing: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lon0 = zone * 6.0 - 183.0
    val xi = (northing - (if (south) 10000000.0 else 0.0)) / (k0 * A)
    val eta = (easting - 500000.0) / (k0 * A)
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
    val phi = math.atan(tauf(taup))
    (lon0 + math.toDegrees(lam), math.toDegrees(phi))
  }

  private def asinh(x: Double): Double = math.log(x + math.hypot(1.0, x))

  /** Series constants for the DuckDB oracle mirror ([[graft.OracleSql]]). */
  private[graft] def oracleConstants: (Double, Double, Double, Array[Double]) = (A, e, k0, alpha)

  /** EPSG code → (zone, south) for UTM codes 32601–32660 / 32701–32760. */
  def utmZoneOf(epsg: Int): Option[(Int, Boolean)] = {
    if (epsg >= 32601 && epsg <= 32660) Some((epsg - 32600, false))
    else if (epsg >= 32701 && epsg <= 32760) Some((epsg - 32700, true))
    else None
  }

  def toUtm(g: Geom, zone: Int, south: Boolean): Geom =
    Geom.mapCoords(g)((x, y) => forward(x, y, zone, south))
  def fromUtm(g: Geom, zone: Int, south: Boolean): Geom =
    Geom.mapCoords(g)((x, y) => inverse(x, y, zone, south))
}
