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

  /** Buffer of any geometry, planar units. `capStyle` ∈ round | flat | square
    * (reference: erde/op/buffer.py cap_style; joins at interior vertices are
    * round in all styles, as with the reference's default join_style).
    */
  def buffer(g: Geom, radius: Double, resolution: Int = 8, capStyle: String = "round"): Geom = {
    if (radius < 0) return erode(g, -radius, resolution)
    g match {
      case Point(x, y) => Polygon(Array(circle(x, y, radius, resolution)))
      case MultiPoint(cs) =>
        val circles = ArrayBuffer[Array[Array[Double]]]()
        var i = 0
        while (i < cs.length) { circles += Array(circle(cs(i), cs(i + 1), radius, resolution)); i += 2 }
        UnionOps.union(circles.toIndexedSeq)
      case LineString(cs) =>
        UnionOps.union(lineParts(cs, radius, resolution, capStyle).toIndexedSeq)
      case MultiLineString(ps) =>
        UnionOps.union(ps.toIndexedSeq.flatMap(cs => lineParts(cs, radius, resolution, capStyle)))
      case Polygon(rings) =>
        // outward buffer: polygon itself ∪ stadiums of every ring segment
        UnionOps.union(IndexedSeq(Array(rings.head)) ++ rings.toIndexedSeq.flatMap(r => lineStadiums(r, radius, resolution)))
      case MultiPolygon(ps) =>
        UnionOps.union(ps.toIndexedSeq.flatMap { rings =>
          IndexedSeq(Array(rings.head)) ++ rings.toIndexedSeq.flatMap(r => lineStadiums(r, radius, resolution))
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

  /** Per-segment cover of a polyline for the given cap style. Round: stadiums
    * (round caps AND joins). Flat/square: rectangles per segment (extended at
    * the terminal ends for square) + circles at interior vertices (round
    * joins).
    */
  private def lineParts(cs: Array[Double], radius: Double, resolution: Int,
      capStyle: String): Seq[Array[Array[Double]]] = {
    if (cs.length < 4) {
      if (cs.length == 2) return Seq(Array(circle(cs(0), cs(1), radius, resolution)))
      return Nil
    }
    val out = ArrayBuffer[Array[Array[Double]]]()
    capStyle match {
      case "round" =>
        var i = 0
        while (i + 3 < cs.length) {
          out += Array(stadium(cs(i), cs(i + 1), cs(i + 2), cs(i + 3), radius, resolution))
          i += 2
        }
      case "flat" | "square" =>
        val ext = if (capStyle == "square") radius else 0.0
        val lastSeg = cs.length - 4
        var i = 0
        while (i + 3 < cs.length) {
          out += Array(segmentRect(cs(i), cs(i + 1), cs(i + 2), cs(i + 3), radius,
            extendA = if (i == 0) ext else 0.0,
            extendB = if (i == lastSeg) ext else 0.0))
          if (i > 0) out += Array(circle(cs(i), cs(i + 1), radius, resolution)) // round join
          i += 2
        }
      case other => throw new IllegalArgumentException(s"capStyle '$other' (round|flat|square)")
    }
    out.toSeq
  }

  /** erde metre semantics (erde/op/buffer.py:44): project to 3857, buffer by
    * `radius / cos(lat of centroid)`, return in 4326.
    */
  def bufferM(g4326: Geom, radiusMetres: Double, resolution: Int = 8,
      capStyle: String = "round"): Geom = {
    val m = Mercator.toMercator(g4326)
    val cos = Mercator.coslat(g4326)
    Mercator.toLonLat(buffer(m, radiusMetres / cos, resolution, capStyle))
  }
}
