package graft.geom

import scala.collection.mutable.ArrayBuffer

/** ST_Subdivide-style polygon decomposition (the PostGIS operator's public
  * semantics, re-derived): recursively halve the part's bbox along its
  * longer axis and clip, until every emitted part carries at most
  * `maxVertices` vertices.
  *
  * Why it exists at 100 TB: spatial join cost is per CANDIDATE PAIR times
  * per-predicate vertex count. One planet-scale polygon (a country border,
  * a coastline buffer) makes every task that meets it pay its full ring —
  * the classic straggler. Subdividing the build side first bounds the
  * per-pair predicate cost by `maxVertices` and lets the grid index place
  * each small part in exactly the cells it touches; contains/intersects
  * joins are union-equivalent over the parts (dissolve afterwards when the
  * part identity matters).
  *
  * Clipping is Sutherland–Hodgman against the axis-aligned cut, shell and
  * holes clipped independently: both close along the same cut line, so the
  * even-odd fill of the clipped rings is exactly (shell − holes) ∩ half —
  * area is conserved to float rounding, which is what the oracle checks. A
  * non-convex shell crossing the cut several times yields one ring with
  * zero-width bridges along the cut (even-odd area unaffected); parts are
  * emitted as plain polygons, never stitched back.
  */
object Subdivide {

  /** One closed ring clipped to the half-plane (axis 0 = x, 1 = y;
    * `keepLo` keeps coord <= v, else coord >= v). Intersection points land
    * EXACTLY on the cut (the cut coordinate is written as `v`, not
    * recomputed), so sibling parts share their boundary bit-for-bit.
    * Returns an empty array when nothing (2-D) survives.
    */
  private def clipRing(r: Array[Double], axis: Int, v: Double,
      keepLo: Boolean): Array[Double] = {
    val n = r.length / 2
    if (n < 4) return Array.emptyDoubleArray
    val out = new ArrayBuffer[Double](r.length + 8)
    @inline def inside(c: Double): Boolean = if (keepLo) c <= v else c >= v
    var i = 0
    while (i < n - 1) { // ring closed: edges (i, i+1), last point == first
      val ax = r(2 * i); val ay = r(2 * i + 1)
      val bx = r(2 * i + 2); val by = r(2 * i + 3)
      val ca = if (axis == 0) ax else ay
      val cb = if (axis == 0) bx else by
      val ain = inside(ca); val bin = inside(cb)
      if (ain) { out += ax; out += ay }
      if (ain != bin) {
        val t = (v - ca) / (cb - ca)
        if (axis == 0) { out += v; out += ay + t * (by - ay) }
        else { out += ax + t * (bx - ax); out += v }
      }
      i += 1
    }
    if (out.length < 6) return Array.emptyDoubleArray
    if (out(0) != out(out.length - 2) || out(1) != out(out.length - 1)) {
      out += out(0); out += out(1)
    }
    if (out.length < 8) Array.emptyDoubleArray else out.toArray
  }

  /** All rings clipped; null when the shell vanishes (or is degenerate).
    * Zero-area rings drop — they contribute nothing and would otherwise
    * accumulate as sliver parts through the recursion.
    */
  private def clipPoly(rings: Array[Array[Double]], axis: Int, v: Double,
      keepLo: Boolean): Array[Array[Double]] = {
    val shell = clipRing(rings(0), axis, v, keepLo)
    if (shell.isEmpty || Algos.signedRingArea(shell) == 0.0) return null
    val out = ArrayBuffer[Array[Double]](shell)
    var i = 1
    while (i < rings.length) {
      val h = clipRing(rings(i), axis, v, keepLo)
      if (h.nonEmpty && Algos.signedRingArea(h) != 0.0) out += h
      i += 1
    }
    out.toArray
  }

  /** Parts of `g`, each a polygon with at most `maxVertices` vertices
    * (summed over its rings, closing point included — WKT counting).
    * Non-areal geometries pass through whole; multipolygon members
    * subdivide independently. `maxDepth` caps pathological recursions
    * (vertices piled on a point): a part still over the bound at the cap is
    * emitted as-is rather than looping.
    */
  def subdivide(g: Geom, maxVertices: Int, maxDepth: Int = 24): Array[Geom] = {
    require(maxVertices >= 8, "maxVertices must be >= 8 (two quads)")
    val out = ArrayBuffer[Geom]()
    def nPts(rings: Array[Array[Double]]): Int = {
      var s = 0; var i = 0
      while (i < rings.length) { s += rings(i).length / 2; i += 1 }
      s
    }
    def rec(rings: Array[Array[Double]], depth: Int): Unit = {
      if (nPts(rings) <= maxVertices || depth >= maxDepth) {
        out += Polygon(rings); return
      }
      val r = rings(0)
      var x1 = Double.MaxValue; var y1 = Double.MaxValue
      var x2 = -Double.MaxValue; var y2 = -Double.MaxValue
      var i = 0
      while (i + 1 < r.length) {
        val x = r(i); val y = r(i + 1)
        if (x < x1) x1 = x; if (x > x2) x2 = x
        if (y < y1) y1 = y; if (y > y2) y2 = y
        i += 2
      }
      val axis = if (x2 - x1 >= y2 - y1) 0 else 1
      val mid = if (axis == 0) (x1 + x2) / 2 else (y1 + y2) / 2
      val lo = clipPoly(rings, axis, mid, keepLo = true)
      val hi = clipPoly(rings, axis, mid, keepLo = false)
      if (lo == null && hi == null) { out += Polygon(rings); return }
      if (lo != null) rec(lo, depth + 1)
      if (hi != null) rec(hi, depth + 1)
    }
    g match {
      case Polygon(rs) if rs.nonEmpty => rec(rs, 0)
      case MultiPolygon(ps) => ps.foreach(rs => if (rs.nonEmpty) rec(rs, 0))
      case GeomCollection(gs) =>
        gs.foreach(sub => out ++= subdivide(sub, maxVertices, maxDepth))
      case other => out += other
    }
    out.toArray
  }
}
