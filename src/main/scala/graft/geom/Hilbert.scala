package graft.geom

/** Hilbert curve over the same lon/lat grid as [[ZOrder]] — the
  * better-locality layout option: unlike Morton's diagonal jumps, every
  * consecutive pair of curve positions is grid-adjacent, so a bbox covers
  * in FEWER contiguous ranges and clustered row groups are tighter. The
  * classic iterative index (Hilbert 1891 via the rot/flip formulation of
  * Warren, Hacker's Delight §16): walk bit planes from the top, accumulate
  * the quadrant offset, rotate/reflect the frame.
  *
  * [[cell]] with `bits = d` gives the depth-d cell prefix: the full-depth
  * curve visits each depth-d cell's 4^(bits−d) points contiguously, so a
  * cell's range is `prefix·4^(bits−d) … (prefix+1)·4^(bits−d) − 1` — the
  * property [[cover]] relies on (same quadtree descent as the Morton
  * cover, different prefix function).
  */
object Hilbert {

  /** Hilbert index of grid cell (x, y) on a 2^bits × 2^bits grid. The
    * reflection complements over the FULL grid (`n−1−x`, not `s−1−x`) so
    * coordinates stay in [0, n) at every step — the already-consumed high
    * bits are complemented too, harmlessly, while a per-quadrant reflection
    * would go negative whenever a high bit is still set (and negative
    * operands are exactly where Scala's `& s` and SQL's `// %` disagree).
    */
  def cell(x0: Long, y0: Long, bits: Int): Long = {
    val full = (1L << bits) - 1L
    var x = x0; var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = full - x; y = full - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert key of a lon/lat point, 2·bits significant bits. */
  def encode(lon: Double, lat: Double, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    cell(ZOrder.index(lon, -180.0, 360.0, bits),
      ZOrder.index(lat, -90.0, 180.0, bits), bits)
  }

  /** Contiguous Hilbert ranges covering a bbox — the [[ZOrder.cover]]
    * descent with the Hilbert cell prefix; same superset guarantee, same
    * budget discipline, typically FEWER ranges (curve continuity).
    */
  def cover(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
      bits: Int, maxDepth: Int = 8, maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 31 && maxDepth >= 0 && maxRanges >= 1)
    val qx0 = ZOrder.index(minLon, -180.0, 360.0, bits)
    val qx1 = ZOrder.index(maxLon, -180.0, 360.0, bits)
    val qy0 = ZOrder.index(minLat, -90.0, 180.0, bits)
    val qy1 = ZOrder.index(maxLat, -90.0, 180.0, bits)
    val depthCap = math.min(bits, maxDepth)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    def rec(d: Int, x: Long, y: Long): Unit = {
      val shift = bits - d
      val cx0 = x << shift; val cx1 = ((x + 1L) << shift) - 1L
      val cy0 = y << shift; val cy1 = ((y + 1L) << shift) - 1L
      if (cx1 < qx0 || cx0 > qx1 || cy1 < qy0 || cy0 > qy1) return
      val inside = cx0 >= qx0 && cx1 <= qx1 && cy0 >= qy0 && cy1 <= qy1
      if (inside || d >= depthCap) {
        val lo = cell(x, y, d) << (2 * shift)
        out += ((lo, lo + (1L << (2 * shift)) - 1L))
      } else {
        rec(d + 1, 2 * x, 2 * y); rec(d + 1, 2 * x + 1, 2 * y)
        rec(d + 1, 2 * x, 2 * y + 1); rec(d + 1, 2 * x + 1, 2 * y + 1)
      }
    }
    rec(0, 0L, 0L)

    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    while (merged.length > maxRanges) {
      var best = 1; var bestGap = Long.MaxValue
      var i = 1
      while (i < merged.length) {
        val gap = merged(i)._1 - merged(i - 1)._2
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      merged(best - 1) = (merged(best - 1)._1, merged(best)._2)
      merged.remove(best)
    }
    merged.toSeq
  }
}
