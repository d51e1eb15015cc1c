package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Buffer construction (reference: erde/op/buffer.py — Shapely round buffers,
  * `resolution` = vertices per 90° arc, default 10 in the reference CLI).
  *
  * Point buffers are exact regular polygons. Line/polygon buffers are built
  * as the union of per-segment stadiums (rectangle + semicircular caps) —
  * mathematically identical to a round-join round-cap buffer — with the union
  * computed by [[UnionOps]]. Negative radii are not supported.
  */
object Buffer {

  /** Circle approximation: 4×resolution vertices, starting at angle 0. */
  def circle(cx: Double, cy: Double, radius: Double, resolution: Int): Array[Double] = {
    val n = math.max(4, 4 * resolution)
    val cs = new Array[Double]((n + 1) * 2)
    var k = 0
    while (k <= n) {
      val a = 2 * math.Pi * k / n
      cs(k * 2) = cx + radius * math.cos(a)
      cs(k * 2 + 1) = cy + radius * math.sin(a)
      k += 1
    }
    cs
  }

  /** Stadium (capsule) around segment [a,b]: convex ring, CCW. */
  def stadium(ax: Double, ay: Double, bx: Double, by: Double, radius: Double, resolution: Int): Array[Double] = {
    val dx = bx - ax; val dy = by - ay
    val len = math.hypot(dx, dy)
    if (len < 1e-12) return circle(ax, ay, radius, resolution)
    val ux = dx / len; val uy = dy / len
    val base = math.atan2(uy, ux)
    val n = math.max(2, 2 * resolution) // per semicircle
    val buf = ArrayBuffer[Double]()
    // cap at b: from base-90° to base+90°
    var k = 0
    while (k <= n) {
      val a = base - math.Pi / 2 + math.Pi * k / n
      buf += bx + radius * math.cos(a); buf += by + radius * math.sin(a)
      k += 1
    }
    // cap at a: from base+90° to base+270°
    k = 0
    while (k <= n) {
      val a = base + math.Pi / 2 + math.Pi * k / n
      buf += ax + radius * math.cos(a); buf += ay + radius * math.sin(a)
      k += 1
    }
    // close
    buf += buf(0); buf += buf(1)
    buf.toArray
  }

  /** Rectangle of half-width `radius` around segment [a,b], optionally
    * extended by `extendA`/`extendB` beyond the endpoints (square caps).
    */
  def segmentRect(ax: Double, ay: Double, bx: Double, by: Double, radius: Double,
      extendA: Double = 0, extendB: Double = 0): Array[Double] = {
    val dx = bx - ax; val dy = by - ay
    val len = math.hypot(dx, dy)
    val (ux, uy) = if (len < 1e-12) (1.0, 0.0) else (dx / len, dy / len)
    val nx = -uy; val ny = ux
    val ax2 = ax - ux * extendA; val ay2 = ay - uy * extendA
    val bx2 = bx + ux * extendB; val by2 = by + uy * extendB
    Array(
      ax2 + nx * radius, ay2 + ny * radius,
      bx2 + nx * radius, by2 + ny * radius,
      bx2 - nx * radius, by2 - ny * radius,
      ax2 - nx * radius, ay2 - ny * radius,
      ax2 + nx * radius, ay2 + ny * radius)
  }

  /** Buffer of any geometry, planar units. `capStyle` ∈ round | flat | square,
    * `joinStyle` ∈ round | mitre | bevel with `mitreLimit` in radii
    * (reference: erde/op/buffer.py — shapely's cap_style / join_style /
    * mitre_limit pass-throughs). Ring (polygon-outward) joins stay round.
    */
  def buffer(g: Geom, radius: Double, resolution: Int = 8, capStyle: String = "round",
      joinStyle: String = "round", mitreLimit: Double = 5.0): Geom = {
    if (radius < 0) return erode(g, -radius, resolution)
    g match {
      case Point(x, y) => Polygon(Array(circle(x, y, radius, resolution)))
      case MultiPoint(cs) =>
        val circles = ArrayBuffer[Array[Array[Double]]]()
        var i = 0
        while (i < cs.length) { circles += Array(circle(cs(i), cs(i + 1), radius, resolution)); i += 2 }
        UnionOps.union(circles.toIndexedSeq)
      case LineString(cs) =>
        UnionOps.union(lineParts(cs, radius, resolution, capStyle, joinStyle, mitreLimit).toIndexedSeq)
      case MultiLineString(ps) =>
        UnionOps.union(ps.toIndexedSeq.flatMap(cs =>
          lineParts(cs, radius, resolution, capStyle, joinStyle, mitreLimit)))
      case Polygon(rings) =>
        // outward buffer: polygon (with holes — even-odd parity keeps hole
        // interiors out) ∪ stadiums of every ring segment; the stadiums grow
        // the shell outward and shrink the holes inward by `radius`.
        UnionOps.union(IndexedSeq(rings) ++ rings.toIndexedSeq.flatMap(r => lineStadiums(r, radius, resolution)))
      case MultiPolygon(ps) =>
        UnionOps.union(ps.toIndexedSeq.flatMap { rings =>
          IndexedSeq(rings) ++ rings.toIndexedSeq.flatMap(r => lineStadiums(r, radius, resolution))
        })
      case GeomCollection(gs) =>
        val parts = gs.map(buffer(_, radius, resolution)).flatMap {
          case Polygon(rs) => Array(rs)
          case MultiPolygon(ps) => ps
          case _ => Array.empty[Array[Array[Double]]]
        }
        UnionOps.union(parts.toIndexedSeq)
    }
  }

  private def lineStadiums(cs: Array[Double], radius: Double, resolution: Int): Seq[Array[Array[Double]]] =
    lineParts(cs, radius, resolution, "round")

  /** Negative (inward) buffer of areal geometry: the polygon minus the round
    * buffer of its boundary — slab-exact difference. Non-areal input erodes
    * to empty (Shapely semantics).
    */
  private def erode(g: Geom, radius: Double, resolution: Int): Geom = {
    val polys = Geom.polygonsOf(g)
    if (polys.isEmpty) return MultiPolygon(Array.empty)
    val boundary = polys.flatMap(_.toIndexedSeq.flatMap(r => lineStadiums(r, radius, resolution)))
    UnionOps.booleanOp(polys, boundary, "difference")
  }

  /** Per-segment cover of a polyline for the given cap and join styles.
    * round/round uses stadiums directly; otherwise rectangles per segment,
    * terminal cap shapes, and one join shape per interior vertex (circle /
    * mitre quad capped at `mitreLimit`·r / bevel triangles — the inner-side
    * shape is redundant with the rectangles' overlap and harmless in the
    * union).
    */
  private def lineParts(cs: Array[Double], radius: Double, resolution: Int,
      capStyle: String, joinStyle: String = "round",
      mitreLimit: Double = 5.0): Seq[Array[Array[Double]]] = {
    if (cs.length < 4) {
      if (cs.length == 2) return Seq(Array(circle(cs(0), cs(1), radius, resolution)))
      return Nil
    }
    require(Set("round", "flat", "square")(capStyle), s"capStyle '$capStyle' (round|flat|square)")
    require(Set("round", "mitre", "bevel")(joinStyle), s"joinStyle '$joinStyle' (round|mitre|bevel)")
    val out = ArrayBuffer[Array[Array[Double]]]()
    if (capStyle == "round" && joinStyle == "round") {
      var i = 0
      while (i + 3 < cs.length) {
        out += Array(stadium(cs(i), cs(i + 1), cs(i + 2), cs(i + 3), radius, resolution))
        i += 2
      }
      return out.toSeq
    }
    val ext = if (capStyle == "square") radius else 0.0
    val lastSeg = cs.length - 4
    var i = 0
    while (i + 3 < cs.length) {
      out += Array(segmentRect(cs(i), cs(i + 1), cs(i + 2), cs(i + 3), radius,
        extendA = if (i == 0) ext else 0.0,
        extendB = if (i == lastSeg) ext else 0.0))
      if (i > 0) out ++= joinShapes(cs, i, radius, resolution, joinStyle, mitreLimit)
      i += 2
    }
    if (capStyle == "round") {
      out += Array(circle(cs(0), cs(1), radius, resolution))
      out += Array(circle(cs(cs.length - 2), cs(cs.length - 1), radius, resolution))
    }
    out.toSeq
  }

  /** Join shape(s) at interior vertex index `i` (coords offset). */
  private def joinShapes(cs: Array[Double], i: Int, radius: Double, resolution: Int,
      joinStyle: String, mitreLimit: Double): Seq[Array[Array[Double]]] = {
    val vx = cs(i); val vy = cs(i + 1)
    if (joinStyle == "round") return Seq(Array(circle(vx, vy, radius, resolution)))
    // unit normals of the incoming and outgoing segments
    def normal(ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = {
      val dx = bx - ax; val dy = by - ay
      val len = math.hypot(dx, dy)
      if (len < 1e-12) (0.0, 0.0) else (-dy / len, dx / len)
    }
    val (n1x, n1y) = normal(cs(i - 2), cs(i - 1), vx, vy)
    val (n2x, n2y) = normal(vx, vy, cs(i + 2), cs(i + 3))
    def side(sign: Double): Array[Array[Double]] = {
      val ax = vx + sign * n1x * radius; val ay = vy + sign * n1y * radius
      val bx = vx + sign * n2x * radius; val by = vy + sign * n2y * radius
      if (joinStyle == "bevel")
        Array(Array(vx, vy, ax, ay, bx, by, vx, vy))
      else { // mitre: extend along the bisector, capped at mitreLimit·r
        val mx = n1x + n2x; val my = n1y + n2y
        val mlen = math.hypot(mx, my)
        if (mlen < 1e-12) Array(Array(vx, vy, ax, ay, bx, by, vx, vy))
        else {
          val cosHalf = mlen / 2 // |n1+n2|/2 = cos(θ/2)
          val d = math.min(radius / math.max(cosHalf, 1e-9), mitreLimit * radius)
          val px = vx + sign * mx / mlen * d; val py = vy + sign * my / mlen * d
          Array(Array(vx, vy, ax, ay, px, py, bx, by, vx, vy))
        }
      }
    }
    Seq(side(1.0), side(-1.0))
  }

  /** erde metre semantics (erde/op/buffer.py:44): project to 3857, buffer by
    * `radius / cos(lat of centroid)`, return in 4326.
    */
  def bufferM(g4326: Geom, radiusMetres: Double, resolution: Int = 8,
      capStyle: String = "round", joinStyle: String = "round",
      mitreLimit: Double = 5.0): Geom = {
    val m = Mercator.toMercator(g4326)
    val cos = Mercator.coslat(g4326)
    Mercator.toLonLat(buffer(m, radiusMetres / cos, resolution, capStyle, joinStyle, mitreLimit))
  }
}
