package graft.geom

/** EPSG:4326 ⇄ EPSG:3857 (spherical Web Mercator) and great-circle math.
  *
  * The reference computes "metres" as Web-Mercator planar measure scaled by
  * cos(latitude of centroid) — area × cos²(lat), length × cos(lat)
  * (reference: erde/op/area.py:44, erde/op/length.py:43, erde/utils.py:55
  * `coslat`). Same convention here so results are comparable.
  */
object Mercator {
  val R = 6378137.0
  private val MaxLat = 85.06

  def fwdX(lon: Double): Double = R * math.toRadians(lon)
  def fwdY(lat: Double): Double = {
    val clamped = math.max(-MaxLat, math.min(MaxLat, lat))
    R * math.log(math.tan(math.Pi / 4 + math.toRadians(clamped) / 2))
  }
  def invLon(x: Double): Double = math.toDegrees(x / R)
  def invLat(y: Double): Double = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)

  def toMercator(g: Geom): Geom = Geom.mapCoords(g)((x, y) => (fwdX(x), fwdY(y)))
  def toLonLat(g: Geom): Geom = Geom.mapCoords(g)((x, y) => (invLon(x), invLat(y)))

  /** cos(latitude) of the geometry's centroid, erde's planar-metre corrector
    * (erde/utils.py:55). Computed on the 3857 centroid mapped back to 4326,
    * matching the reference exactly.
    */
  def coslat(g4326: Geom): Double = {
    val c = Algos.centroid(toMercator(g4326))
    math.cos(math.toRadians(invLat(c.y)))
  }

  /** erde area-in-m² semantics: planar 3857 area × cos²(centroid lat). */
  def areaM(g4326: Geom): Double = {
    val m = toMercator(g4326)
    Algos.area(m) * math.pow(math.cos(math.toRadians(invLat(Algos.centroid(m).y))), 2)
  }

  /** erde length-in-m semantics: planar 3857 length × cos(centroid lat). */
  def lengthM(g4326: Geom): Double = {
    val m = toMercator(g4326)
    Algos.length(m) * math.cos(math.toRadians(invLat(Algos.centroid(m).y)))
  }

  /** Great-circle distance in metres (haversine, sphere R=6371008.8). */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val r = 6371008.8
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1
    val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * r * math.asin(math.min(1.0, math.sqrt(a)))
  }
}
