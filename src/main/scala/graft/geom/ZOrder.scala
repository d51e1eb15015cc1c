package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Morton (Z-order) space-filling curve over lon/lat: the storage-layout half
  * of the 100 TB spatial story. Writing a table clustered by `encode(lon,
  * lat, bits)` puts spatially-near rows into the same parquet row groups, so
  * a bbox query reads only the row groups whose `__z` min/max stats intersect
  * the bbox's curve ranges — the spatial filter becomes an ordinary pushed
  * column predicate the scan prunes on, no spatial index structure needed.
  *
  * [[cover]] turns a bbox into a bounded set of contiguous z ranges
  * (quadtree descent; partial leaf cells are over-approximated, so a residual
  * exact lon/lat filter always follows — over-approximation can only cost
  * I/O, never correctness).
  *
  * The double arithmetic in [[encode]] is written step-for-step the way the
  * DuckDB oracle mirror spells it, so both engines see bit-identical indexes.
  */
object ZOrder {

  /** Grid index of a coordinate: floor-scaled into [0, 2^bits), clamped (the
    * lon=180 / lat=90 edge lands in the last cell).
    */
  def index(v: Double, lo: Double, span: Double, bits: Int): Long = {
    val scale = (1L << bits).toDouble
    val i = math.floor((v - lo) / span * scale).toLong
    if (i < 0L) 0L else if (i > (1L << bits) - 1) (1L << bits) - 1 else i
  }

  /** Bit-interleave of two `bits`-wide indexes: x in the even bits, y in the
    * odd bits.
    */
  def interleave(ix: Long, iy: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((ix >> b) & 1L) << (2 * b)
      z |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** Z-order key of a lon/lat point, 2·bits significant bits. */
  def encode(lon: Double, lat: Double, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    interleave(index(lon, -180.0, 360.0, bits), index(lat, -90.0, 180.0, bits), bits)
  }

  /** Contiguous z ranges covering a bbox: quadtree descent to `maxDepth`,
    * adjacent ranges merged, then greedily merged down to `maxRanges` by
    * closing the smallest gaps (a superset of the exact cover — the caller's
    * residual lon/lat filter keeps semantics exact). Every point inside the
    * bbox has its z key inside some returned range.
    */
  def cover(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
      bits: Int, maxDepth: Int = 8, maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 31 && maxDepth >= 0 && maxRanges >= 1)
    val qx0 = index(minLon, -180.0, 360.0, bits)
    val qx1 = index(maxLon, -180.0, 360.0, bits)
    val qy0 = index(minLat, -90.0, 180.0, bits)
    val qy1 = index(maxLat, -90.0, 180.0, bits)
    val depthCap = math.min(bits, maxDepth)
    val out = ArrayBuffer.empty[(Long, Long)]

    def rec(d: Int, x: Long, y: Long): Unit = {
      val shift = bits - d
      val cx0 = x << shift; val cx1 = ((x + 1L) << shift) - 1L
      val cy0 = y << shift; val cy1 = ((y + 1L) << shift) - 1L
      if (cx1 < qx0 || cx0 > qx1 || cy1 < qy0 || cy0 > qy1) return
      val inside = cx0 >= qx0 && cx1 <= qx1 && cy0 >= qy0 && cy1 <= qy1
      if (inside || d >= depthCap) {
        val zlo = interleave(x, y, d) << (2 * shift)
        out += ((zlo, zlo + (1L << (2 * shift)) - 1L))
      } else {
        rec(d + 1, 2 * x, 2 * y); rec(d + 1, 2 * x + 1, 2 * y)
        rec(d + 1, 2 * x, 2 * y + 1); rec(d + 1, 2 * x + 1, 2 * y + 1)
      }
    }
    rec(0, 0L, 0L)

    // merge touching/overlapping ranges, then close smallest gaps to budget
    val sorted = out.sortBy(_._1)
    val merged = ArrayBuffer.empty[(Long, Long)]
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
