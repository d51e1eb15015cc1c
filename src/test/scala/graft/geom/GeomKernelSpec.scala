package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomKernelSpec extends AnyFunSuite {

  private val square = Polygon(Array(Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)))
  private val squareWithHole = Polygon(Array(
    Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0),
    Array(1.0, 1, 2, 1, 2, 2, 1, 2, 1, 1)))

  test("WKT round-trips every type") {
    val wkts = Seq(
      "POINT (1 2)",
      "MULTIPOINT (1 2, 3 4)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    wkts.foreach { w => assert(WKT.write(WKT.read(w)) == w) }
  }

  test("WKT accepts nested multipoint and scientific notation") {
    assert(WKT.write(WKT.read("MULTIPOINT ((1 2), (3 4))")) == "MULTIPOINT (1 2, 3 4)")
    assert(WKT.read("POINT (1e3 -2.5E-2)") == Point(1000.0, -0.025))
  }

  test("WKB round-trips every type") {
    val gs: Seq[Geom] = Seq(
      Point(1, 2), MultiPoint(Array(1.0, 2, 3, 4)), LineString(Array(0.0, 0, 1, 1)),
      MultiLineString(Array(Array(0.0, 0, 1, 1), Array(2.0, 2, 3, 3))),
      squareWithHole,
      MultiPolygon(Array(square.rings)),
      GeomCollection(Array(Point(5, 6), square)))
    gs.foreach { g => assert(WKT.write(WKB.read(WKB.write(g))) == WKT.write(g)) }
  }

  test("area: square 16, hole subtracts") {
    assert(Algos.area(square) == 16.0)
    assert(Algos.area(squareWithHole) == 15.0)
  }

  test("length: path and perimeter") {
    assert(Algos.length(LineString(Array(0.0, 0, 3, 4))) == 5.0)
    assert(Algos.length(square) == 16.0)
  }

  test("centroid of square and of segment") {
    assert(Algos.centroid(square) == Point(2.0, 2.0))
    assert(Algos.centroid(LineString(Array(0.0, 0, 2, 0))) == Point(1.0, 0.0))
  }

  test("point in polygon honors holes") {
    assert(Algos.pointInPolygon(3, 3, squareWithHole.rings))
    assert(!Algos.pointInPolygon(1.5, 1.5, squareWithHole.rings))
    assert(!Algos.pointInPolygon(5, 5, squareWithHole.rings))
  }

  test("intersects / within / contains") {
    val inner = Polygon(Array(Array(1.0, 1, 2, 1, 2, 2, 1, 2, 1, 1)))
    val overlapping = Polygon(Array(Array(3.0, 3, 6, 3, 6, 6, 3, 6, 3, 3)))
    val disjoint = Polygon(Array(Array(10.0, 10, 11, 10, 11, 11, 10, 11, 10, 10)))
    assert(Algos.intersects(square, inner))
    assert(Algos.intersects(square, overlapping))
    assert(!Algos.intersects(square, disjoint))
    assert(Algos.within(inner, square))
    assert(!Algos.within(overlapping, square))
    assert(Algos.contains(square, Point(2, 2)))
    assert(!Algos.contains(square, Point(4, 2))) // boundary point: not contained
    assert(Algos.intersects(square, Point(4, 2))) // but does intersect
    assert(Algos.intersects(LineString(Array(-1.0, 2, 5, 2)), square))
    assert(!Algos.within(LineString(Array(-1.0, 2, 5, 2)), square))
    assert(Algos.within(LineString(Array(1.0, 2, 3, 2)), square))
  }

  test("points bit-exactly on any polygon edge are not within, but intersect") {
    // every edge and corner of the square — ray-cast parity would admit some
    val boundary = Seq((0.0, 2.0), (4.0, 2.0), (2.0, 0.0), (2.0, 4.0),
      (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    boundary.foreach { case (x, y) =>
      assert(!Algos.within(Point(x, y), square), s"($x,$y) must not be within")
      assert(!Algos.contains(square, Point(x, y)), s"($x,$y) must not be contained")
      assert(Algos.intersects(square, Point(x, y)), s"($x,$y) must intersect")
    }
    // hole boundary too
    assert(!Algos.within(Point(1.5, 1.0), squareWithHole))
    assert(Algos.within(Point(0.5, 0.5), squareWithHole))
  }

  test("distance") {
    assert(Algos.distance(Point(0, 0), Point(3, 4)) == 5.0)
    assert(Algos.distance(Point(5, 2), square) == 1.0)
    assert(Algos.distance(Point(2, 2), square) == 0.0)
  }

  test("mercator round-trip") {
    val (lon, lat) = (30.5, 50.45)
    assert(math.abs(Mercator.invLon(Mercator.fwdX(lon)) - lon) < 1e-9)
    assert(math.abs(Mercator.invLat(Mercator.fwdY(lat)) - lat) < 1e-9)
  }

  test("areaM of a small equatorial square matches true metre area ~1%") {
    // 0.01° x 0.01° at the equator ≈ 1113.2m x 1113.2m
    val d = 0.01
    val g = Polygon(Array(Array(0.0, 0, d, 0, d, d, 0, d, 0, 0)))
    val expected = math.pow(d / 360.0 * 2 * math.Pi * Mercator.R, 2)
    assert(math.abs(Mercator.areaM(g) / expected - 1) < 0.01)
  }

  test("haversine Paris-London ~343 km") {
    val d = Mercator.haversine(2.3522, 48.8566, -0.1276, 51.5072)
    assert(math.abs(d / 1000 - 343.5) < 2)
  }

  test("union area of two overlapping unit squares") {
    val a = Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0))
    val b = Array(Array(0.5, 0.5, 1.5, 0.5, 1.5, 1.5, 0.5, 1.5, 0.5, 0.5))
    assert(math.abs(UnionOps.unionArea(IndexedSeq(a, b)) - 1.75) < 1e-9)
    val mp = UnionOps.union(IndexedSeq(a, b))
    assert(math.abs(Algos.area(mp) - 1.75) < 1e-9)
  }

  test("union handles disjoint and hole-carrying polygons") {
    val a = Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0))
    val c = Array(Array(5.0, 5, 6, 5, 6, 6, 5, 6, 5, 5))
    assert(math.abs(UnionOps.unionArea(IndexedSeq(a, c)) - 2.0) < 1e-9)
    assert(math.abs(UnionOps.unionArea(IndexedSeq(squareWithHole.rings)) - 15.0) < 1e-9)
  }

  test("point buffer is a regular polygon with closed-form area") {
    val res = 8
    val n = 4 * res
    val r = 10.0
    val g = Buffer.buffer(Point(0, 0), r, res)
    val expected = 0.5 * n * r * r * math.sin(2 * math.Pi / n)
    assert(math.abs(Algos.area(g) - expected) < 1e-9)
  }

  test("segment buffer (stadium union) area ≈ 2·r·len + π·r²") {
    val r = 1.0
    val g = Buffer.buffer(LineString(Array(0.0, 0, 10, 0)), r, 16)
    val expected = 2 * r * 10 + math.Pi * r * r
    assert(math.abs(Algos.area(g) / expected - 1) < 0.01)
  }

  test("polyline buffer covers corner, excludes far point") {
    val g = Buffer.buffer(LineString(Array(0.0, 0, 5, 0, 5, 5)), 1.0, 8)
    val mp = g.asInstanceOf[MultiPolygon]
    assert(UnionOps.unionCovers(mp.polys.toIndexedSeq, 5.5, 0.0))
    assert(!UnionOps.unionCovers(mp.polys.toIndexedSeq, 0.0, 3.0))
  }

  test("polygon buffer grows a square by ~r on each side") {
    val g = Buffer.buffer(square, 1.0, 16)
    // 4x4 square buffered by 1: area = 16 + 4*4*1 + π*1²
    val expected = 16 + 16 + math.Pi
    assert(math.abs(Algos.area(g) / expected - 1) < 0.01)
  }

  test("bufferM of a point: closed-form metre area via mercator scaling") {
    val lat = 45.0
    val r = 1000.0
    val res = 8
    val g = Buffer.bufferM(Point(10.0, lat), r, res)
    val n = 4 * res
    // erde semantics: exact regular polygon of radius r/cos(lat) in 3857,
    // measured back with cos²(lat of centroid)
    val areaM = Mercator.areaM(g)
    val expected = 0.5 * n * r * r * math.sin(2 * math.Pi / n)
    assert(math.abs(areaM / expected - 1) < 1e-3)
  }

  test("flat and square cap buffers have closed-form areas") {
    import graft.geom._
    val line = LineString(Array(0.0, 0.0, 10.0, 0.0))
    val r = 2.0
    val flat = Algos.area(Buffer.buffer(line, r, resolution = 16, capStyle = "flat"))
    assert(math.abs(flat - 2 * r * 10) / (2 * r * 10) < 1e-6) // rectangle only
    val square = Algos.area(Buffer.buffer(line, r, resolution = 16, capStyle = "square"))
    assert(math.abs(square - 2 * r * (10 + 2 * r)) / square < 1e-6) // extended by r each end
    val round = Algos.area(Buffer.buffer(line, r, resolution = 64, capStyle = "round"))
    assert(math.abs(round - (2 * r * 10 + math.Pi * r * r)) / round < 1e-3)
    // polyline: flat caps keep round joins at the interior vertex
    val bent = LineString(Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0))
    val bentFlat = Algos.area(Buffer.buffer(bent, r, resolution = 64, capStyle = "flat"))
    // bounded between rectangles-minus-overlap and rectangles-plus-full-join-disc
    assert(bentFlat > 2 * (2 * r * 10) - (2 * r) * (2 * r) && bentFlat < 2 * (2 * r * 10) + math.Pi * r * r)
  }

  test("within/contains honor holes and multipolygon parts") {
    import graft.geom._
    val donut = WKT.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(!Algos.within(Point(5, 5), donut)) // in the hole
    assert(Algos.within(Point(2, 2), donut))
    val smallInHole = WKT.read("POLYGON ((4.5 4.5, 5.5 4.5, 5.5 5.5, 4.5 5.5, 4.5 4.5))")
    assert(!Algos.within(smallInHole, donut))
    assert(Algos.intersects(smallInHole, donut) == false) // fully inside the hole, no contact
    val spanning = WKT.read("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")
    assert(Algos.intersects(spanning, donut)) // overlaps the ring around the hole
    assert(!Algos.within(spanning, donut)) // crosses into the hole
    val mp = WKT.read("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))")
    assert(Algos.within(Point(11, 11), mp))
    assert(Algos.contains(mp, Point(1, 1)))
    assert(!Algos.within(Point(5, 5), mp))
  }

  test("boolean ops: intersection/difference/union areas on overlapping squares") {
    import graft.geom._
    val a = IndexedSeq(Array(Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0)))
    val b = IndexedSeq(Array(Array(2.0, 2.0, 6.0, 2.0, 6.0, 6.0, 2.0, 6.0, 2.0, 2.0)))
    def areaOf(g: Geom) = Algos.area(g)
    assert(math.abs(areaOf(UnionOps.booleanOp(a, b, "intersection")) - 4.0) < 1e-9)
    assert(math.abs(areaOf(UnionOps.booleanOp(a, b, "difference")) - 12.0) < 1e-9)
    assert(math.abs(areaOf(UnionOps.booleanOp(a, b, "union")) - 28.0) < 1e-9)
    // disjoint: intersection empty, difference = A
    val far = IndexedSeq(Array(Array(50.0, 50.0, 51.0, 50.0, 51.0, 51.0, 50.0, 51.0, 50.0, 50.0)))
    assert(areaOf(UnionOps.booleanOp(a, far, "intersection")) == 0.0)
    assert(math.abs(areaOf(UnionOps.booleanOp(a, far, "difference")) - 16.0) < 1e-9)
    // difference against a contained hole-maker leaves a donut
    val inner = IndexedSeq(Array(Array(1.0, 1.0, 3.0, 1.0, 3.0, 3.0, 1.0, 3.0, 1.0, 1.0)))
    assert(math.abs(areaOf(UnionOps.booleanOp(a, inner, "difference")) - 12.0) < 1e-9)
  }

  test("negative buffer erodes a square by ~r per side") {
    import graft.geom._
    val square = WKT.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val eroded = Buffer.buffer(square, -2.0, resolution = 16)
    val area = Algos.area(eroded)
    assert(math.abs(area - 36.0) / 36.0 < 0.01) // inner 6x6 (round joins don't matter inward)
    // erosion beyond the inradius empties the polygon
    assert(Algos.area(Buffer.buffer(square, -5.5, resolution = 8)) < 1e-6)
    // lines/points erode to empty
    assert(Algos.area(Buffer.buffer(LineString(Array(0.0,0.0,5.0,5.0)), -1.0)) == 0.0)
  }

  test("positive buffer of a donut keeps the hole, shrunk by r") {
    val r = 0.2
    val g = Buffer.buffer(squareWithHole, r, resolution = 32)
    // shell grows: 16 + perimeter*r + πr²; the 1x1 hole erodes to (1-2r)²
    val expected = 16.0 + 16.0 * r + math.Pi * r * r - math.pow(1 - 2 * r, 2)
    assert(math.abs(Algos.area(g) / expected - 1) < 0.01, s"area ${Algos.area(g)} expected $expected")
    // hole center must stay outside the buffered polygon
    assert(!Algos.intersects(g, Point(1.5, 1.5)))
    // r past the hole inradius swallows the hole entirely
    val swallowed = Buffer.buffer(squareWithHole, 0.6, resolution = 32)
    val full = 16.0 + 16.0 * 0.6 + math.Pi * 0.36
    assert(math.abs(Algos.area(swallowed) / full - 1) < 0.01)
    assert(Algos.intersects(swallowed, Point(1.5, 1.5)))
  }

  test("distance line↔multipoint has no phantom segments between points") {
    // a fake polyline through the MultiPoint would pass through (0,0) on the line
    val line = LineString(Array(0.0, 0, 10, 0))
    val mp = MultiPoint(Array(0.0, 5, 0.0, -5))
    assert(Algos.distance(line, mp) == 5.0)
    assert(Algos.distance(mp, line) == 5.0)
    // polygon ↔ multipoint likewise
    assert(Algos.distance(MultiPoint(Array(-1.0, 2, -1.0, -2)), square) == 1.0)
  }

  test("mitre and bevel join styles: right-angle polyline areas") {
    import graft.geom._
    val r = 2.0
    val bent = LineString(Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0))
    // flat caps isolate the join contribution: rects cover 2*(2r*10) minus
    // their r x r overlap at the inner corner
    val rectsOnly = 2 * (2 * r * 10) - r * r
    val bevel = Algos.area(Buffer.buffer(bent, r, 16, "flat", "bevel"))
    val mitre = Algos.area(Buffer.buffer(bent, r, 16, "flat", "mitre"))
    val round = Algos.area(Buffer.buffer(bent, r, 64, "flat", "round"))
    // right angle: bevel adds a r²-ish triangle wedge, mitre fills the full
    // r² corner square, round is between them
    assert(mitre > round && round > bevel, s"mitre $mitre round $round bevel $bevel")
    // outer corner fill: mitre = r², bevel = r²/2, round = πr²/4
    assert(math.abs(mitre - (rectsOnly + r * r)) / mitre < 0.01)
    assert(math.abs(bevel - (rectsOnly + r * r / 2)) / bevel < 0.01)
    assert(math.abs(round - (rectsOnly + math.Pi * r * r / 4)) / round < 0.01)
    // mitre limit: a hairpin spike is clipped
    val hairpin = LineString(Array(0.0, 0.0, 10.0, 0.0, 0.1, 0.5))
    val capped = Algos.area(Buffer.buffer(hairpin, r, 8, "flat", "mitre", mitreLimit = 1.5))
    val uncapped = Algos.area(Buffer.buffer(hairpin, r, 8, "flat", "mitre", mitreLimit = 50.0))
    assert(capped < uncapped)
  }
}
