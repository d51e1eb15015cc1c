package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class SubdivideSpec extends AnyFunSuite {

  private def ngon(cx: Double, cy: Double, r: Double, n: Int): Polygon = {
    val ring = new Array[Double](2 * (n + 1))
    for (i <- 0 to n) {
      val a = 2 * math.Pi * (i % n) / n
      ring(2 * i) = cx + r * math.cos(a)
      ring(2 * i + 1) = cy + r * math.sin(a)
    }
    Polygon(Array(ring))
  }

  private def nPts(g: Geom): Int = g match {
    case Polygon(rs) => rs.map(_.length / 2).sum
    case _ => fail(s"expected polygon part, got $g")
  }

  test("small polygon passes through untouched") {
    val sq = Polygon(Array(Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)))
    val parts = Subdivide.subdivide(sq, 8)
    assert(parts.length === 1 && parts(0) === sq)
  }

  test("96-gon: every part bounded, area conserved, bboxes nest") {
    val poly = ngon(3.0, -2.0, 0.7, 96)
    val whole = Algos.area(poly)
    val parts = Subdivide.subdivide(poly, 16)
    assert(parts.length > 4)
    assert(parts.forall(nPts(_) <= 16))
    assert(math.abs(parts.map(Algos.area).sum - whole) < 1e-9 * whole)
    val (x1, y1, x2, y2) = poly.bbox
    parts.foreach { p =>
      val (px1, py1, px2, py2) = p.bbox
      assert(px1 >= x1 - 1e-12 && py1 >= y1 - 1e-12 &&
        px2 <= x2 + 1e-12 && py2 <= y2 + 1e-12)
    }
  }

  test("donut: hole area subtracts exactly and the hole stays empty") {
    val shell = ngon(0.0, 0.0, 1.0, 64).rings(0)
    val hole = ngon(0.0, 0.0, 0.45, 32).rings(0)
    val donut = Polygon(Array(shell, hole))
    val whole = Algos.area(donut)
    assert(whole > 0)
    val parts = Subdivide.subdivide(donut, 20)
    assert(parts.forall(nPts(_) <= 20))
    assert(math.abs(parts.map(Algos.area).sum - whole) < 1e-9)
    // a point in the hole is covered by NO part; a point in the ring by one
    // (probes sit OFF the dyadic bbox-midline cuts — a point exactly on a
    // shared part boundary belongs to neither under Shapely-parity contains)
    val inHole = Point(0.013, 0.017)
    val inRing = Point(0.713, 0.298)
    assert(!parts.exists(p => Algos.contains(p, inHole)))
    assert(parts.count(p => Algos.contains(p, inRing)) === 1)
  }

  test("multipolygon members subdivide independently; lines pass through") {
    val mp = MultiPolygon(Array(
      ngon(0, 0, 0.5, 48).rings, ngon(10, 10, 0.5, 4).rings))
    val parts = Subdivide.subdivide(mp, 12)
    assert(parts.forall(nPts(_) <= 12))
    assert(math.abs(parts.map(Algos.area).sum - Algos.area(mp)) < 1e-9)
    val line = LineString(Array(0.0, 0, 1, 1, 2, 0))
    assert(Subdivide.subdivide(line, 8).toSeq === Seq(line))
  }

  test("non-convex shell: concave U splits without losing area") {
    // U shape: 8 vertices, forced split at maxVertices 8 won't trigger —
    // densify edges so the count exceeds the bound
    val u = Array(0.0, 0, 6, 0, 6, 6, 4, 6, 4, 2, 2, 2, 2, 6, 0, 6, 0, 0)
    // densify: insert midpoints on each edge twice
    def densify(r: Array[Double]): Array[Double] = {
      val out = scala.collection.mutable.ArrayBuffer[Double]()
      var i = 0
      while (i + 3 < r.length) {
        val ax = r(i); val ay = r(i + 1); val bx = r(i + 2); val by = r(i + 3)
        out += ax; out += ay
        out += (2 * ax + bx) / 3; out += (2 * ay + by) / 3
        out += (ax + 2 * bx) / 3; out += (ay + 2 * by) / 3
        i += 2
      }
      out += r(r.length - 2); out += r(r.length - 1)
      out.toArray
    }
    val poly = Polygon(Array(densify(densify(u))))
    val whole = Algos.area(poly)
    val parts = Subdivide.subdivide(poly, 16)
    assert(parts.forall(nPts(_) <= 16))
    assert(math.abs(parts.map(Algos.area).sum - whole) < 1e-9)
    // the notch interior stays uncovered
    assert(!parts.exists(p => Algos.contains(p, Point(3.0, 4.0))))
    assert(parts.count(p => Algos.contains(p, Point(1.0, 1.0))) === 1)
  }
}
