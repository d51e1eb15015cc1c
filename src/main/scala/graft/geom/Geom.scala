package graft.geom

/** Minimal planar geometry model for the graft engine.
  *
  * Coordinates are packed `Array[Double]` of (x0,y0,x1,y1,…) — cache-friendly,
  * allocation-lean, and 1:1 with WKB layout. No external geometry library is
  * used (the runtime image is zero-egress); all algorithms live in
  * [[Algos]] / [[Buffer]] / [[UnionOps]].
  *
  * Semantics follow what the reference exercises through Shapely/GeoPandas
  * (reference: erde/op/area.py, erde/op/length.py, erde/op/sjoin.py):
  * area of polygons (holes subtract), length of lines, perimeter of polygons,
  * centroid of the highest-dimension component, intersects/within/contains.
  */
sealed trait Geom {
  /** (minx, miny, maxx, maxy); NaNs for empty. */
  lazy val bbox: (Double, Double, Double, Double) = {
    var minx, miny = Double.PositiveInfinity
    var maxx, maxy = Double.NegativeInfinity
    def eat(cs: Array[Double]): Unit = {
      var i = 0
      while (i < cs.length) {
        val x = cs(i); val y = cs(i + 1)
        if (x < minx) minx = x
        if (x > maxx) maxx = x
        if (y < miny) miny = y
        if (y > maxy) maxy = y
        i += 2
      }
    }
    Geom.foreachPart(this)(eat)
    (minx, miny, maxx, maxy)
  }

  def geomType: String = this match {
    case _: Point => "Point"
    case _: MultiPoint => "MultiPoint"
    case _: LineString => "LineString"
    case _: MultiLineString => "MultiLineString"
    case _: Polygon => "Polygon"
    case _: MultiPolygon => "MultiPolygon"
    case _: GeomCollection => "GeometryCollection"
  }

  def isEmpty: Boolean = this match {
    case Point(x, _) => x.isNaN
    case MultiPoint(cs) => cs.isEmpty
    case LineString(cs) => cs.isEmpty
    case MultiLineString(ps) => ps.isEmpty
    case Polygon(rs) => rs.isEmpty
    case MultiPolygon(ps) => ps.isEmpty
    case GeomCollection(gs) => gs.isEmpty
  }
}

final case class Point(x: Double, y: Double) extends Geom
final case class MultiPoint(coords: Array[Double]) extends Geom
final case class LineString(coords: Array[Double]) extends Geom
final case class MultiLineString(parts: Array[Array[Double]]) extends Geom
/** rings(0) is the shell; the rest are holes. Rings are closed (first==last). */
final case class Polygon(rings: Array[Array[Double]]) extends Geom
final case class MultiPolygon(polys: Array[Array[Array[Double]]]) extends Geom
final case class GeomCollection(geoms: Array[Geom]) extends Geom

object Geom {
  /** Applies `f` to every packed coordinate array in the geometry. */
  def foreachPart(g: Geom)(f: Array[Double] => Unit): Unit = g match {
    case Point(x, y) => f(Array(x, y))
    case MultiPoint(cs) => f(cs)
    case LineString(cs) => f(cs)
    case MultiLineString(ps) => ps.foreach(f)
    case Polygon(rs) => rs.foreach(f)
    case MultiPolygon(ps) => ps.foreach(_.foreach(f))
    case GeomCollection(gs) => gs.foreach(foreachPart(_)(f))
  }

  /** Maps every coordinate pair through `f(x, y) => (x', y')`. */
  def mapCoords(g: Geom)(f: (Double, Double) => (Double, Double)): Geom = {
    def arr(cs: Array[Double]): Array[Double] = {
      val out = new Array[Double](cs.length)
      var i = 0
      while (i < cs.length) {
        val (nx, ny) = f(cs(i), cs(i + 1))
        out(i) = nx; out(i + 1) = ny
        i += 2
      }
      out
    }
    g match {
      case Point(x, y) => val (nx, ny) = f(x, y); Point(nx, ny)
      case MultiPoint(cs) => MultiPoint(arr(cs))
      case LineString(cs) => LineString(arr(cs))
      case MultiLineString(ps) => MultiLineString(ps.map(arr))
      case Polygon(rs) => Polygon(rs.map(arr))
      case MultiPolygon(ps) => MultiPolygon(ps.map(_.map(arr)))
      case GeomCollection(gs) => GeomCollection(gs.map(mapCoords(_)(f)))
    }
  }

  /** Areal components as rings arrays (empty for points/lines). */
  def polygonsOf(g: Geom): IndexedSeq[Array[Array[Double]]] = g match {
    case Polygon(rs) => IndexedSeq(rs)
    case MultiPolygon(ps) => ps.toIndexedSeq
    case GeomCollection(gs) => gs.toIndexedSeq.flatMap(polygonsOf)
    case _ => IndexedSeq.empty
  }

  def bboxIntersects(a: Geom, b: Geom): Boolean = {
    val (ax1, ay1, ax2, ay2) = a.bbox
    val (bx1, by1, bx2, by2) = b.bbox
    ax1 <= bx2 && bx1 <= ax2 && ay1 <= by2 && by1 <= ay2
  }
}
