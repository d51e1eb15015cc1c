package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Filled marching squares: the region of a scalar grid where value ≤
  * threshold, as a MultiPolygon with edge crossings linearly interpolated
  * (reference: erde/op/isochrone.py — raster interpolate + contour of the
  * duration field). Saddle squares take the simple boundary-walk resolution
  * (connects through the square) — at isochrone resolutions the artifact is
  * below one cell.
  */
object Contour {

  /** Linear triangular interpolation of a sample lattice onto an `r`×-finer
    * raster (reference: erde/op/isochrone.py:196-208 — matplotlib
    * `Triangulation` + `LinearTriInterpolator` onto a linspace raster before
    * contouring). Each sample square splits along the fixed 00→11 diagonal
    * into two triangles — a valid Delaunay triangulation of a square lattice
    * — and raster nodes take barycentric values. Raster node k maps to
    * sample cell min(k/r, n−2) with local offset (k − cell·r)/r, so lattice
    * nodes reproduce their sample values exactly. A non-finite corner
    * (unreachable sample) makes the whole pixel unreachable, mirroring the
    * reference's NaN → nan_value fill.
    */
  def interpolate(vals: Array[Array[Double]], r: Int): Array[Array[Double]] = {
    val n = vals.length
    val m = (n - 1) * r + 1
    val out = Array.ofDim[Double](m, m)
    var kx = 0
    while (kx < m) {
      val cx = math.min(kx / r, n - 2)
      val u = (kx - cx * r).toDouble / r
      var ky = 0
      while (ky < m) {
        val cy = math.min(ky / r, n - 2)
        val v = (ky - cy * r).toDouble / r
        val z00 = vals(cx)(cy); val z10 = vals(cx + 1)(cy)
        val z01 = vals(cx)(cy + 1); val z11 = vals(cx + 1)(cy + 1)
        out(kx)(ky) =
          if (!java.lang.Double.isFinite(z00) || !java.lang.Double.isFinite(z10) ||
              !java.lang.Double.isFinite(z01) || !java.lang.Double.isFinite(z11))
            Double.PositiveInfinity
          else if (u + v <= 1) z00 + u * (z10 - z00) + v * (z01 - z00)
          else z11 + (1 - u) * (z01 - z11) + (1 - v) * (z10 - z11)
        ky += 1
      }
      kx += 1
    }
    out
  }

  /** `vals(ix)(iy)` on an (nx × ny) grid; grid node (ix, iy) sits at
    * (x0 + ix·step, y0 + iy·step). Returns the ≤ `t` region.
    */
  def filled(vals: Array[Array[Double]], x0: Double, y0: Double, step: Double, t: Double): MultiPolygon = {
    val nx = vals.length
    val ny = if (nx == 0) 0 else vals(0).length
    val pieces = ArrayBuffer[Array[Array[Double]]]()

    def interp(xa: Double, ya: Double, va: Double, xb: Double, yb: Double, vb: Double): (Double, Double) = {
      val f = if (math.abs(vb - va) < 1e-300) 0.5 else (t - va) / (vb - va)
      val fc = math.max(0.0, math.min(1.0, f))
      (xa + fc * (xb - xa), ya + fc * (yb - ya))
    }

    var ix = 0
    while (ix + 1 < nx) {
      var iy = 0
      while (iy + 1 < ny) {
        // corners in boundary order: 00 → 10 → 11 → 01
        val xs = Array(x0 + ix * step, x0 + (ix + 1) * step, x0 + (ix + 1) * step, x0 + ix * step)
        val ys = Array(y0 + iy * step, y0 + iy * step, y0 + (iy + 1) * step, y0 + (iy + 1) * step)
        val vs = Array(vals(ix)(iy), vals(ix + 1)(iy), vals(ix + 1)(iy + 1), vals(ix)(iy + 1))
        val in = vs.map(_ <= t)
        if (in.forall(identity)) {
          pieces += Array(Array(
            xs(0), ys(0), xs(1), ys(1), xs(2), ys(2), xs(3), ys(3), xs(0), ys(0)))
        } else if (in.exists(identity)) {
          // walk the square boundary, keeping inside corners and inserting
          // interpolated crossings where inside-ness flips
          val ring = ArrayBuffer[Double]()
          var k = 0
          while (k < 4) {
            val k2 = (k + 1) % 4
            if (in(k)) { ring += xs(k); ring += ys(k) }
            if (in(k) != in(k2)) {
              val (cx, cy) = interp(xs(k), ys(k), vs(k), xs(k2), ys(k2), vs(k2))
              ring += cx; ring += cy
            }
            k += 1
          }
          if (ring.length >= 6) {
            ring += ring(0); ring += ring(1)
            pieces += Array(ring.toArray)
          }
        }
        iy += 1
      }
      ix += 1
    }
    UnionOps.union(pieces.toIndexedSeq)
  }
}
