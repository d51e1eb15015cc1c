package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class SnapSpec extends AnyFunSuite {

  test("points snap half-up to the nearest grid intersection, origin respected") {
    assert(Algos.snapToGrid(Point(1.12, -0.13), 0.25) === Point(1.0, -0.25))
    assert(Algos.snapToGrid(Point(1.125, 0.125), 0.25) === Point(1.25, 0.25)) // half rounds up
    assert(Algos.snapToGrid(Point(1.12, 1.12), 0.25, ox = 0.1, oy = 0.1) === Point(1.1, 1.1))
  }

  test("consecutive duplicates collapse; degenerate parts drop") {
    val line = LineString(Array(0.01, 0.02, 0.04, 0.01, 0.9, 0.9, 1.02, 1.04))
    Algos.snapToGrid(line, 0.25) match {
      case LineString(cs) => assert(cs.toSeq === Seq(0.0, 0.0, 1.0, 1.0))
      case g => fail(g.toString)
    }
    // whole line collapses to one point -> empty line
    Algos.snapToGrid(LineString(Array(0.01, 0.02, 0.04, 0.01)), 1.0) match {
      case LineString(cs) => assert(cs.isEmpty)
      case g => fail(g.toString)
    }
    // thin sliver ring collapses -> empty polygon; fat ring survives closed
    Algos.snapToGrid(
      Polygon(Array(Array(0.0, 0, 1, 0.01, 2, 0, 1, 0.02, 0, 0))), 1.0) match {
      case Polygon(rs) => assert(rs.isEmpty)
      case g => fail(g.toString)
    }
    Algos.snapToGrid(
      Polygon(Array(Array(0.01, 0.02, 2.04, 0.01, 2.01, 2.02, 0.03, 1.98, 0.01, 0.02))),
      1.0) match {
      case Polygon(rs) =>
        assert(rs.length === 1)
        val r = rs.head
        assert(r.toSeq === Seq(0.0, 0, 2, 0, 2, 2, 0, 2, 0, 0))
      case g => fail(g.toString)
    }
  }

  test("snapped near-identical geometries become WKB byte-equal (the dedup contract)") {
    val a = LineString(Array(0.01, 0.02, 1.01, 0.98, 2.02, 2.01))
    val b = LineString(Array(-0.02, -0.01, 0.98, 1.02, 1.98, 1.99))
    val wa = WKB.write(Algos.snapToGrid(a, 0.5))
    val wb = WKB.write(Algos.snapToGrid(b, 0.5))
    assert(java.util.Arrays.equals(wa, wb))
  }

  test("multipolygon drops collapsed members, holes drop independently") {
    val big = Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)
    val tinyHole = Array(1.0, 1.0, 1.1, 1.0, 1.1, 1.1, 1.0, 1.1, 1.0, 1.0)
    val tinyPoly = Array(8.0, 8.0, 8.1, 8.0, 8.1, 8.1, 8.0, 8.1, 8.0, 8.0)
    val mp = MultiPolygon(Array(Array(big, tinyHole), Array(tinyPoly)))
    Algos.snapToGrid(mp, 1.0) match {
      case MultiPolygon(ps) =>
        assert(ps.length === 1 && ps.head.length === 1) // hole and tiny member gone
        assert(math.abs(Algos.area(MultiPolygon(ps)) - 16.0) < 1e-12)
      case g => fail(g.toString)
    }
  }
}
