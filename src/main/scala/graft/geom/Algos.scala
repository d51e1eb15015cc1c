package graft.geom

/** Planar geometry algorithms: measures, predicates, distances.
  *
  * Predicate semantics match what the reference exercises via Shapely
  * (reference: erde/op/sjoin.py — op in {intersects, within, contains}):
  * `intersects` includes boundary contact; `within` requires the interior of
  * `a` to be inside `b` (a point exactly on the boundary is not within).
  */
object Algos {

  private val Eps = 1e-12

  // ---- measures -----------------------------------------------------------

  /** Signed shoelace area of a closed ring (positive = CCW). */
  def signedRingArea(r: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = r.length
    while (i + 3 < n) {
      s += r(i) * r(i + 3) - r(i + 2) * r(i + 1)
      i += 2
    }
    s / 2.0
  }

  /** Unsigned planar area; holes subtract; lines/points are 0. */
  def area(g: Geom): Double = g match {
    case Polygon(rs) if rs.nonEmpty =>
      math.abs(signedRingArea(rs.head)) - rs.tail.map(r => math.abs(signedRingArea(r))).sum
    case MultiPolygon(ps) => ps.map(rs => area(Polygon(rs))).sum
    case GeomCollection(gs) => gs.map(area).sum
    case _ => 0.0
  }

  /** Planar length: line length; polygon perimeter (all rings); points are 0. */
  def length(g: Geom): Double = g match {
    case LineString(cs) => pathLength(cs)
    case MultiLineString(ps) => ps.map(pathLength).sum
    case Polygon(rs) => rs.map(pathLength).sum
    case MultiPolygon(ps) => ps.map(rs => rs.map(pathLength).sum).sum
    case GeomCollection(gs) => gs.map(length).sum
    case _ => 0.0
  }

  def pathLength(cs: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < cs.length) {
      val dx = cs(i + 2) - cs(i); val dy = cs(i + 3) - cs(i + 1)
      s += math.sqrt(dx * dx + dy * dy)
      i += 2
    }
    s
  }

  /** Centroid of the highest-dimension component (Shapely semantics). */
  def centroid(g: Geom): Point = {
    // polygon-weighted
    var aSum = 0.0; var ax = 0.0; var ay = 0.0
    // line-weighted
    var lSum = 0.0; var lx = 0.0; var ly = 0.0
    // point-weighted
    var pN = 0; var px = 0.0; var py = 0.0

    def ring(r: Array[Double], sign: Double): Unit = {
      var i = 0
      while (i + 3 < r.length) {
        val cross = r(i) * r(i + 3) - r(i + 2) * r(i + 1)
        aSum += sign * cross / 2.0
        ax += sign * (r(i) + r(i + 2)) * cross / 6.0
        ay += sign * (r(i + 1) + r(i + 3)) * cross / 6.0
        i += 2
      }
    }
    def path(cs: Array[Double]): Unit = {
      var i = 0
      while (i + 3 < cs.length) {
        val dx = cs(i + 2) - cs(i); val dy = cs(i + 3) - cs(i + 1)
        val len = math.sqrt(dx * dx + dy * dy)
        lSum += len
        lx += (cs(i) + cs(i + 2)) / 2.0 * len
        ly += (cs(i + 1) + cs(i + 3)) / 2.0 * len
        i += 2
      }
    }
    def walk(g: Geom): Unit = g match {
      case Point(x, y) => pN += 1; px += x; py += y
      case MultiPoint(cs) =>
        var i = 0
        while (i < cs.length) { pN += 1; px += cs(i); py += cs(i + 1); i += 2 }
      case LineString(cs) => path(cs)
      case MultiLineString(ps) => ps.foreach(path)
      case Polygon(rs) if rs.nonEmpty =>
        val shellSign = if (signedRingArea(rs.head) >= 0) 1.0 else -1.0
        ring(rs.head, shellSign)
        rs.tail.foreach { h => ring(h, -(if (signedRingArea(h) >= 0) 1.0 else -1.0)) }
      case Polygon(_) => ()
      case MultiPolygon(ps) => ps.foreach(rs => walk(Polygon(rs)))
      case GeomCollection(gs) => gs.foreach(walk)
    }
    walk(g)
    if (math.abs(aSum) > Eps) Point(ax / aSum, ay / aSum)
    else if (lSum > Eps) Point(lx / lSum, ly / lSum)
    else if (pN > 0) Point(px / pN, py / pN)
    else Point(Double.NaN, Double.NaN)
  }

  // ---- low-level predicates ----------------------------------------------

  private def orient(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Does point p lie on segment [a,b] (inclusive)? */
  def onSegment(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Boolean = {
    if (math.abs(orient(ax, ay, bx, by, px, py)) > Eps * (math.abs(ax) + math.abs(bx) + math.abs(px) + 1)) return false
    px >= math.min(ax, bx) - Eps && px <= math.max(ax, bx) + Eps &&
      py >= math.min(ay, by) - Eps && py <= math.max(ay, by) + Eps
  }

  /** Do segments [a,b] and [c,d] intersect (touching counts)? */
  def segIntersects(ax: Double, ay: Double, bx: Double, by: Double,
                    cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val d1 = orient(cx, cy, dx, dy, ax, ay)
    val d2 = orient(cx, cy, dx, dy, bx, by)
    val d3 = orient(ax, ay, bx, by, cx, cy)
    val d4 = orient(ax, ay, bx, by, dx, dy)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) && ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    onSegment(ax, ay, cx, cy, dx, dy) || onSegment(bx, by, cx, cy, dx, dy) ||
      onSegment(cx, cy, ax, ay, bx, by) || onSegment(dx, dy, ax, ay, bx, by)
  }

  /** Ray-cast point-in-ring; `true` for strictly inside, `false` on/off. Points
    * exactly on the boundary are handled separately by callers. */
  def pointInRing(px: Double, py: Double, r: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    while (i + 3 < r.length) {
      val x1 = r(i); val y1 = r(i + 1); val x2 = r(i + 2); val y2 = r(i + 3)
      if ((y1 > py) != (y2 > py)) {
        val xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        if (px < xint) inside = !inside
      }
      i += 2
    }
    inside
  }

  def pointOnBoundary(px: Double, py: Double, rings: Array[Array[Double]]): Boolean =
    rings.exists { r =>
      var i = 0; var found = false
      while (!found && i + 3 < r.length) {
        if (onSegment(px, py, r(i), r(i + 1), r(i + 2), r(i + 3))) found = true
        i += 2
      }
      found
    }

  /** Point strictly inside polygon (inside shell, outside all holes). */
  def pointInPolygon(px: Double, py: Double, rings: Array[Array[Double]]): Boolean =
    rings.nonEmpty && pointInRing(px, py, rings.head) && !rings.tail.exists(h => pointInRing(px, py, h))

  /** Point inside polygon or on its boundary. */
  def pointCoveredByPolygon(px: Double, py: Double, rings: Array[Array[Double]]): Boolean =
    pointInPolygon(px, py, rings) || pointOnBoundary(px, py, rings)

  def distPointSeg(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val l2 = dx * dx + dy * dy
    val t = if (l2 <= Eps) 0.0 else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
    val cx = ax + t * dx; val cy = ay + t * dy
    math.hypot(px - cx, py - cy)
  }

  // ---- geometry × geometry predicates --------------------------------------

  private def polys(g: Geom): Array[Array[Array[Double]]] = g match {
    case Polygon(rs) => Array(rs)
    case MultiPolygon(ps) => ps
    case GeomCollection(gs) => gs.flatMap(polys)
    case _ => Array.empty
  }

  private def lines(g: Geom): Array[Array[Double]] = g match {
    case LineString(cs) => Array(cs)
    case MultiLineString(ps) => ps
    case Polygon(rs) => rs // boundary treated as lines for crossing tests
    case MultiPolygon(ps) => ps.flatten
    case GeomCollection(gs) => gs.flatMap(lines)
    case _ => Array.empty
  }

  private def points(g: Geom): Array[Double] = g match {
    case Point(x, y) => Array(x, y)
    case MultiPoint(cs) => cs
    case LineString(cs) => cs
    case MultiLineString(ps) => ps.flatten
    case Polygon(rs) => rs.flatten
    case MultiPolygon(ps) => ps.flatten.flatten
    case GeomCollection(gs) => gs.flatMap(points)
  }

  private def anySegCross(a: Array[Array[Double]], b: Array[Array[Double]]): Boolean = {
    var ai = 0
    while (ai < a.length) {
      val p = a(ai)
      var i = 0
      while (i + 3 < p.length) {
        var bi = 0
        while (bi < b.length) {
          val q = b(bi)
          var j = 0
          while (j + 3 < q.length) {
            if (segIntersects(p(i), p(i + 1), p(i + 2), p(i + 3), q(j), q(j + 1), q(j + 2), q(j + 3)))
              return true
            j += 2
          }
          bi += 1
        }
        i += 2
      }
      ai += 1
    }
    false
  }

  /** OGC `intersects` (boundary contact counts). */
  def intersects(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!Geom.bboxIntersects(a, b)) return false
    val aPolys = polys(a); val bPolys = polys(b)
    val aIsPoint = a.geomType == "Point" || a.geomType == "MultiPoint"
    val bIsPoint = b.geomType == "Point" || b.geomType == "MultiPoint"

    // point vs anything
    if (aIsPoint) return pointsIntersect(points(a), b)
    if (bIsPoint) return pointsIntersect(points(b), a)

    // any vertex of one inside the other's polygons (covers containment)
    if (bPolys.nonEmpty) {
      val ap = points(a)
      var i = 0
      while (i < ap.length) {
        if (bPolys.exists(rs => pointCoveredByPolygon(ap(i), ap(i + 1), rs))) return true
        i += 2
      }
    }
    if (aPolys.nonEmpty) {
      val bp = points(b)
      var i = 0
      while (i < bp.length) {
        if (aPolys.exists(rs => pointCoveredByPolygon(bp(i), bp(i + 1), rs))) return true
        i += 2
      }
    }
    // otherwise boundaries must cross
    anySegCross(lines(a), lines(b))
  }

  private def pointsIntersect(pts: Array[Double], g: Geom): Boolean = {
    val gPolys = polys(g)
    val gLines = lines(g)
    val gIsPoint = g.geomType == "Point" || g.geomType == "MultiPoint"
    var i = 0
    while (i < pts.length) {
      val px = pts(i); val py = pts(i + 1)
      if (gIsPoint) {
        val gp = points(g)
        var j = 0
        while (j < gp.length) {
          if (math.abs(gp(j) - px) <= Eps && math.abs(gp(j + 1) - py) <= Eps) return true
          j += 2
        }
      } else if (gPolys.nonEmpty) {
        if (gPolys.exists(rs => pointCoveredByPolygon(px, py, rs))) return true
      } else {
        var li = 0
        while (li < gLines.length) {
          val cs = gLines(li)
          var j = 0
          while (j + 3 < cs.length) {
            if (onSegment(px, py, cs(j), cs(j + 1), cs(j + 2), cs(j + 3))) return true
            j += 2
          }
          li += 1
        }
      }
      i += 2
    }
    false
  }

  /** `a within b`: every point of `a` covered by `b`, interiors intersect.
    * Implemented for b = (Multi)Polygon (the case the reference exercises);
    * points exactly on b's boundary do not count as within (Shapely/OGC).
    */
  def within(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    val bPolys = polys(b)
    if (bPolys.isEmpty) return false
    val (ax1, ay1, ax2, ay2) = a.bbox
    val (bx1, by1, bx2, by2) = b.bbox
    if (ax1 < bx1 - Eps || ay1 < by1 - Eps || ax2 > bx2 + Eps || ay2 > by2 + Eps) return false

    a match {
      // explicit boundary exclusion: ray-cast parity alone admits points that
      // sit bit-exactly on some edges (which side depends on edge direction)
      case Point(x, y) =>
        bPolys.exists(rs => pointInPolygon(x, y, rs)) && !bPolys.exists(rs => pointOnBoundary(x, y, rs))
      case _ =>
        val ap = points(a)
        var i = 0
        while (i < ap.length) {
          if (!bPolys.exists(rs => pointCoveredByPolygon(ap(i), ap(i + 1), rs))) return false
          i += 2
        }
        // no boundary crossing allowed (touching is fine)
        if (properCross(lines(a), bPolys)) return false
        // an areal `a` must not swallow a hole of `b`: a hole strictly inside
        // a's interior means a covers area outside b (its boundaries don't
        // cross, so the hole is either fully inside or fully outside a)
        val aPolys = polys(a)
        if (aPolys.nonEmpty) {
          val holes = bPolys.flatMap(_.drop(1))
          val swallowed = holes.exists { h =>
            var j = 0
            var inside = false
            while (!inside && j + 1 < h.length) {
              if (aPolys.exists(rs => pointInPolygon(h(j), h(j + 1), rs))) inside = true
              j += 2
            }
            inside
          }
          if (swallowed) return false
        }
        true
    }
  }

  /** True when any segment of `a` properly crosses (passes strictly through)
    * any ring of the polygons. Shared endpoints / collinear touching is not a
    * proper cross.
    */
  private def properCross(a: Array[Array[Double]], polysB: Array[Array[Array[Double]]]): Boolean = {
    val ringsB = polysB.flatten
    var ai = 0
    while (ai < a.length) {
      val p = a(ai)
      var i = 0
      while (i + 3 < p.length) {
        // midpoint test: if the segment crosses a ring, one of its halves has a
        // midpoint strictly outside while an endpoint is inside, or vice versa.
        var bi = 0
        while (bi < ringsB.length) {
          val q = ringsB(bi)
          var j = 0
          while (j + 3 < q.length) {
            val d1 = orient(q(j), q(j + 1), q(j + 2), q(j + 3), p(i), p(i + 1))
            val d2 = orient(q(j), q(j + 1), q(j + 2), q(j + 3), p(i + 2), p(i + 3))
            val d3 = orient(p(i), p(i + 1), p(i + 2), p(i + 3), q(j), q(j + 1))
            val d4 = orient(p(i), p(i + 1), p(i + 2), p(i + 3), q(j + 2), q(j + 3))
            if (((d1 > Eps && d2 < -Eps) || (d1 < -Eps && d2 > Eps)) &&
                ((d3 > Eps && d4 < -Eps) || (d3 < -Eps && d4 > Eps))) return true
            j += 2
          }
          bi += 1
        }
        i += 2
      }
      ai += 1
    }
    false
  }

  def contains(a: Geom, b: Geom): Boolean = within(b, a)

  /** Douglas–Peucker simplification of one packed path. Keeps endpoints;
    * rings (first == last) keep at least 4 points.
    */
  def simplifyPath(cs: Array[Double], tolerance: Double): Array[Double] = {
    val n = cs.length / 2
    if (n <= 2) return cs
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    def dp(a: Int, b: Int): Unit = {
      if (b - a < 2) return
      var worst = -1.0
      var idx = -1
      var i = a + 1
      while (i < b) {
        val d = distPointSeg(cs(i * 2), cs(i * 2 + 1),
          cs(a * 2), cs(a * 2 + 1), cs(b * 2), cs(b * 2 + 1))
        if (d > worst) { worst = d; idx = i }
        i += 1
      }
      if (worst > tolerance) {
        keep(idx) = true
        dp(a, idx); dp(idx, b)
      }
    }
    dp(0, n - 1)
    val isRing = cs(0) == cs(cs.length - 2) && cs(1) == cs(cs.length - 1)
    if (isRing) {
      // guarantee a valid ring: ensure at least 2 interior points survive
      var kept = (0 until n).count(keep)
      if (kept < 4) {
        var i = 1
        while (kept < 4 && i < n - 1) {
          if (!keep(i)) { keep(i) = true; kept += 1 }
          i += 1
        }
      }
    }
    val out = ArrayBufferDouble()
    var i = 0
    while (i < n) {
      if (keep(i)) { out += cs(i * 2); out += cs(i * 2 + 1) }
      i += 1
    }
    out.result()
  }

  private def ArrayBufferDouble() = new scala.collection.mutable.ArrayBuilder.ofDouble

  /** Douglas–Peucker simplification of any geometry (points pass through). */
  def simplify(g: Geom, tolerance: Double): Geom = g match {
    case LineString(cs) => LineString(simplifyPath(cs, tolerance))
    case MultiLineString(ps) => MultiLineString(ps.map(simplifyPath(_, tolerance)))
    case Polygon(rs) => Polygon(rs.map(simplifyPath(_, tolerance)))
    case MultiPolygon(ps) => MultiPolygon(ps.map(_.map(simplifyPath(_, tolerance))))
    case GeomCollection(gs) => GeomCollection(gs.map(simplify(_, tolerance)))
    case other => other
  }

  /** Planar distance between geometries (0 when intersecting). */
  def distance(a: Geom, b: Geom): Double = {
    if (intersects(a, b)) return 0.0
    val ap = points(a); val bp = points(b)
    val aL = lines(a); val bL = lines(b)
    var best = Double.PositiveInfinity
    // point-to-segment both directions; falls back to point-to-point
    def ptsToSegs(pts: Array[Double], segs: Array[Array[Double]]): Unit = {
      var i = 0
      while (i < pts.length) {
        if (segs.isEmpty) ()
        var si = 0
        while (si < segs.length) {
          val cs = segs(si)
          if (cs.length == 2) {
            best = math.min(best, math.hypot(pts(i) - cs(0), pts(i + 1) - cs(1)))
          }
          var j = 0
          while (j + 3 < cs.length) {
            best = math.min(best, distPointSeg(pts(i), pts(i + 1), cs(j), cs(j + 1), cs(j + 2), cs(j + 3)))
            j += 2
          }
          si += 1
        }
        i += 2
      }
    }
    if (aL.isEmpty && bL.isEmpty) {
      var i = 0
      while (i < ap.length) {
        var j = 0
        while (j < bp.length) {
          best = math.min(best, math.hypot(ap(i) - bp(j), ap(i + 1) - bp(j + 1)))
          j += 2
        }
        i += 2
      }
    } else {
      // vertex-to-vertex covers the (Multi)Point parts on either side — a
      // side with no line work must NOT be wrapped as a fake polyline (that
      // would invent phantom segments between unrelated points).
      var i = 0
      while (i < ap.length) {
        var j = 0
        while (j < bp.length) {
          best = math.min(best, math.hypot(ap(i) - bp(j), ap(i + 1) - bp(j + 1)))
          j += 2
        }
        i += 2
      }
      if (bL.nonEmpty) ptsToSegs(ap, bL)
      if (aL.nonEmpty) ptsToSegs(bp, aL)
    }
    best
  }

  /** Snap every coordinate to the grid `origin + k·size` (nearest
    * intersection, half-up — PostGIS ST_SnapToGrid semantics re-derived):
    * the quantization step of geometry dedup and tile preparation.
    * Consecutive duplicate points collapse; parts that degenerate drop (a
    * ring below 3 distinct points, a line below 2), so a multi-geometry can
    * come back with fewer parts and a fully-collapsed areal/line geometry
    * becomes an empty multi of its kind. Snapped-identical inputs then
    * compare byte-equal as WKB — exactly what hash-dedup needs.
    */
  def snapToGrid(g: Geom, size: Double, ox: Double = 0.0, oy: Double = 0.0): Geom = {
    require(size > 0, "grid size must be positive")
    @inline def sx(v: Double): Double = math.floor((v - ox) / size + 0.5) * size + ox
    @inline def sy(v: Double): Double = math.floor((v - oy) / size + 0.5) * size + oy
    def snapPath(cs: Array[Double], close: Boolean): Array[Double] = {
      val out = new scala.collection.mutable.ArrayBuffer[Double](cs.length)
      var i = 0
      while (i + 1 < cs.length) {
        val x = sx(cs(i)); val y = sy(cs(i + 1))
        if (out.length < 2 || out(out.length - 2) != x || out(out.length - 1) != y) {
          out += x; out += y
        }
        i += 2
      }
      if (close && out.length >= 2 &&
          (out(0) == out(out.length - 2) && out(1) == out(out.length - 1)))
        out.dropRightInPlace(2) // reclose below after dedup of the seam
      if (close && out.length >= 2) { out += out(0); out += out(1) }
      out.toArray
    }
    def ring(r: Array[Double]): Array[Double] = {
      val s = snapPath(r, close = true)
      // < 3 distinct points + close, or collapsed to a collinear sliver:
      // zero-area rings are degenerate either way
      if (s.length < 8 || signedRingArea(s) == 0.0) Array.emptyDoubleArray else s
    }
    g match {
      case Point(x, y) => Point(sx(x), sy(y))
      case MultiPoint(cs) => MultiPoint(snapPath(cs, close = false))
      case LineString(cs) =>
        val s = snapPath(cs, close = false)
        LineString(if (s.length < 4) Array.emptyDoubleArray else s)
      case MultiLineString(ps) =>
        MultiLineString(ps.map(snapPath(_, close = false)).filter(_.length >= 4))
      case Polygon(rs) =>
        val shell = if (rs.isEmpty) Array.emptyDoubleArray else ring(rs.head)
        if (shell.isEmpty) Polygon(Array.empty)
        else Polygon(shell +: rs.tail.map(ring).filter(_.nonEmpty))
      case MultiPolygon(ps) =>
        MultiPolygon(ps.flatMap { rs =>
          val shell = if (rs.isEmpty) Array.emptyDoubleArray else ring(rs.head)
          if (shell.isEmpty) None
          else Some(shell +: rs.tail.map(ring).filter(_.nonEmpty))
        })
      case GeomCollection(gs) => GeomCollection(gs.map(snapToGrid(_, size, ox, oy)))
    }
  }
}
