package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Polygon union via vertical slab decomposition.
  *
  * The plane is cut at every vertex x and every pairwise segment-intersection
  * x; inside each slab the crossing segments are y-ordered and a bottom-to-top
  * sweep with per-polygon even-odd parity marks the covered y-ranges. The
  * union is returned as a MultiPolygon of slab trapezoids: coverage-exact
  * (area and point-membership equal the true union) with non-minimal
  * vertices. This powers `buffer(dissolve=true)` (reference:
  * erde/op/buffer.py:46 `unary_union`) and isochrone cell merging.
  *
  * Cost: O(S² ) intersection scan + O(slabs · S log S); intended for
  * per-group unions (one buffer's stadiums, one isochrone's cells), each
  * group running distributed on its own row/partition — never a global
  * driver-side union.
  */
object UnionOps {

  private val Eps = 1e-9

  private final class Seg(val x1: Double, val y1: Double, val x2: Double, val y2: Double, val poly: Int) {
    def yAt(x: Double): Double =
      if (math.abs(x2 - x1) < Eps) math.min(y1, y2)
      else y1 + (y2 - y1) * (x - x1) / (x2 - x1)
  }

  private def segments(polys: IndexedSeq[Array[Array[Double]]]): Array[Seg] = {
    val out = ArrayBuffer[Seg]()
    var pi = 0
    while (pi < polys.length) {
      val rings = polys(pi)
      rings.foreach { r =>
        var i = 0
        while (i + 3 < r.length) {
          val (ax, ay, bx, by) = (r(i), r(i + 1), r(i + 2), r(i + 3))
          if (math.abs(ax - bx) > Eps) { // vertical segments carry no slab width
            if (ax < bx) out += new Seg(ax, ay, bx, by, pi) else out += new Seg(bx, by, ax, ay, pi)
          }
          i += 2
        }
      }
      pi += 1
    }
    out.toArray
  }

  /** All slab boundary x's: vertices + proper pairwise intersections. */
  private def breakpoints(segs: Array[Seg]): Array[Double] = {
    val xs = ArrayBuffer[Double]()
    segs.foreach { s => xs += s.x1; xs += s.x2 }
    val byX = segs.sortBy(_.x1)
    var i = 0
    while (i < byX.length) {
      val a = byX(i)
      var j = i + 1
      while (j < byX.length && byX(j).x1 < a.x2) {
        val b = byX(j)
        // line-line intersection of the two supporting lines, kept if inside both spans
        val d = (a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1)
        if (math.abs(d) > Eps) {
          val t = ((b.x1 - a.x1) * (b.y2 - b.y1) - (b.y1 - a.y1) * (b.x2 - b.x1)) / d
          val x = a.x1 + t * (a.x2 - a.x1)
          if (x > math.max(a.x1, b.x1) + Eps && x < math.min(a.x2, b.x2) - Eps) xs += x
        }
        j += 1
      }
      i += 1
    }
    val sorted = xs.toArray
    java.util.Arrays.sort(sorted)
    // dedupe with tolerance
    val out = ArrayBuffer[Double]()
    sorted.foreach { x => if (out.isEmpty || x - out.last > Eps) out += x }
    out.toArray
  }

  /** Covered y-intervals of one slab: seq of (yLow@x1, yLow@x2, yHigh@x1, yHigh@x2). */
  private def slabRuns(segs: Array[Seg], x1: Double, x2: Double, nPolys: Int): Seq[(Double, Double, Double, Double)] = {
    val xm = (x1 + x2) / 2
    val active = segs.filter(s => s.x1 <= x1 + Eps && s.x2 >= x2 - Eps).sortBy(_.yAt(xm))
    if (active.isEmpty) return Nil
    val parity = new Array[Boolean](nPolys)
    var odd = 0
    val runs = ArrayBuffer[(Double, Double, Double, Double)]()
    var lo: Seg = null
    active.foreach { s =>
      val wasInside = odd > 0
      parity(s.poly) = !parity(s.poly)
      odd += (if (parity(s.poly)) 1 else -1)
      val isInside = odd > 0
      if (!wasInside && isInside) lo = s
      else if (wasInside && !isInside) {
        runs += ((lo.yAt(x1), lo.yAt(x2), s.yAt(x1), s.yAt(x2)))
        lo = null
      }
    }
    runs.toSeq
  }

  /** Exact area of the union of the given polygons (each as rings array). */
  def unionArea(polys: IndexedSeq[Array[Array[Double]]]): Double = {
    val segs = segments(polys)
    if (segs.isEmpty) return 0.0
    val xs = breakpoints(segs)
    var area = 0.0
    var i = 0
    while (i + 1 < xs.length) {
      val x1 = xs(i); val x2 = xs(i + 1)
      if (x2 - x1 > Eps) {
        slabRuns(segs, x1, x2, polys.length).foreach { case (l1, l2, h1, h2) =>
          area += ((h1 - l1) + (h2 - l2)) / 2.0 * (x2 - x1)
        }
      }
      i += 1
    }
    area
  }

  /** Union as a coverage-exact MultiPolygon of slab trapezoids. */
  def union(polys: IndexedSeq[Array[Array[Double]]]): MultiPolygon = {
    val segs = segments(polys)
    if (segs.isEmpty) return MultiPolygon(Array.empty)
    val xs = breakpoints(segs)
    val out = ArrayBuffer[Array[Array[Double]]]()
    var i = 0
    while (i + 1 < xs.length) {
      val x1 = xs(i); val x2 = xs(i + 1)
      if (x2 - x1 > Eps) {
        slabRuns(segs, x1, x2, polys.length).foreach { case (l1, l2, h1, h2) =>
          if ((h1 - l1) + (h2 - l2) > Eps) {
            out += Array(Array(x1, l1, x2, l2, x2, h2, x1, h1, x1, l1))
          }
        }
      }
      i += 1
    }
    MultiPolygon(out.toArray)
  }

  /** Membership in the union without materializing it. */
  def unionCovers(polys: IndexedSeq[Array[Array[Double]]], px: Double, py: Double): Boolean =
    polys.exists(rs => Algos.pointCoveredByPolygon(px, py, rs))

  // ---- boolean ops (A vs B) ----------------------------------------------

  /** Covered y-intervals of one slab under a two-set boolean op: the sweep
    * tracks inside-ness of set A (polys [0, nA)) and set B separately and
    * keeps y-ranges where `op(inA, inB)` holds.
    */
  private def booleanRuns(
      segs: Array[Seg], x1: Double, x2: Double, nA: Int, nPolys: Int,
      op: (Boolean, Boolean) => Boolean): Seq[(Double, Double, Double, Double)] = {
    val xm = (x1 + x2) / 2
    val active = segs.filter(s => s.x1 <= x1 + Eps && s.x2 >= x2 - Eps).sortBy(_.yAt(xm))
    if (active.isEmpty) return Nil
    val parity = new Array[Boolean](nPolys)
    var oddA = 0; var oddB = 0
    val runs = ArrayBuffer[(Double, Double, Double, Double)]()
    var lo: Seg = null
    active.foreach { s =>
      val wasIn = op(oddA > 0, oddB > 0)
      parity(s.poly) = !parity(s.poly)
      val delta = if (parity(s.poly)) 1 else -1
      if (s.poly < nA) oddA += delta else oddB += delta
      val isIn = op(oddA > 0, oddB > 0)
      if (!wasIn && isIn) lo = s
      else if (wasIn && !isIn) {
        runs += ((lo.yAt(x1), lo.yAt(x2), s.yAt(x1), s.yAt(x2)))
        lo = null
      }
    }
    runs.toSeq
  }

  /** Boolean operation between two polygon sets, coverage-exact slab output.
    * `op` ∈ union | intersection | difference (A minus B).
    */
  def booleanOp(
      a: IndexedSeq[Array[Array[Double]]],
      b: IndexedSeq[Array[Array[Double]]],
      op: String): MultiPolygon = {
    val f: (Boolean, Boolean) => Boolean = op match {
      case "union" => _ || _
      case "intersection" => _ && _
      case "difference" => (x, y) => x && !y
      case other => throw new IllegalArgumentException(s"op '$other' (union|intersection|difference)")
    }
    val segs = segments(a ++ b)
    if (segs.isEmpty) return MultiPolygon(Array.empty)
    val xs = breakpoints(segs)
    val out = ArrayBuffer[Array[Array[Double]]]()
    var i = 0
    while (i + 1 < xs.length) {
      val x1 = xs(i); val x2 = xs(i + 1)
      if (x2 - x1 > Eps) {
        booleanRuns(segs, x1, x2, a.length, a.length + b.length, f).foreach { case (l1, l2, h1, h2) =>
          if ((h1 - l1) + (h2 - l2) > Eps) {
            out += Array(Array(x1, l1, x2, l2, x2, h2, x1, h1, x1, l1))
          }
        }
      }
      i += 1
    }
    MultiPolygon(out.toArray)
  }
}
