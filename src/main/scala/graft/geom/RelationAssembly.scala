package graft.geom

import scala.collection.mutable.ArrayBuffer

/** OSM relation geometry assembly — rings from member ways (reference:
  * erde/op/osm.py:10-15, whose ogr2ogr stage exports `multipolygons` /
  * `multilinestrings` layers; the stitching below is the standard
  * OGR/osm2pgsql ring-building contract re-implemented from the OSM
  * multipolygon relation spec, not from any code).
  *
  * All functions are pure and deterministic: ring seeds follow member order
  * and extension always picks the FIRST unused member whose endpoint matches
  * the ring's open end (reversing the member when its tail matches), so the
  * same member list always yields the same vertex sequence — a requirement
  * for the distributed oracle compare.
  */
object RelationAssembly {

  private def isClosed(buf: ArrayBuffer[Double]): Boolean =
    buf.length >= 4 && buf(0) == buf(buf.length - 2) && buf(1) == buf(buf.length - 1)

  /** Stitches member coordinate paths (flat [x0,y0,x1,y1,…]) into closed
    * rings. Endpoint matching is exact double equality — OSM ways sharing a
    * junction share the node, hence the coordinate bits. Returns None when
    * any ring fails to close (a member is missing — the extract-boundary
    * completeness contract, same as dropping partial ways).
    */
  def stitchRings(parts: Array[Array[Double]]): Option[Array[Array[Double]]] = {
    val used = new Array[Boolean](parts.length)
    val rings = ArrayBuffer[Array[Double]]()
    var seed = 0
    while (seed < parts.length) {
      if (!used(seed)) {
        used(seed) = true
        val buf = ArrayBuffer[Double](parts(seed).toIndexedSeq: _*)
        var closed = isClosed(buf)
        var progress = true
        while (!closed && progress) {
          progress = false
          val ex = buf(buf.length - 2); val ey = buf(buf.length - 1)
          var i = 0
          while (i < parts.length && !progress) {
            if (!used(i) && parts(i).length >= 4) {
              val p = parts(i)
              if (p(0) == ex && p(1) == ey) {
                var j = 2
                while (j + 1 < p.length) { buf += p(j); buf += p(j + 1); j += 2 }
                used(i) = true; progress = true
              } else if (p(p.length - 2) == ex && p(p.length - 1) == ey) {
                var j = p.length - 4
                while (j >= 0) { buf += p(j); buf += p(j + 1); j -= 2 }
                used(i) = true; progress = true
              }
            }
            i += 1
          }
          closed = isClosed(buf)
        }
        // a valid ring repeats the first vertex: ≥3 distinct vertices = 8 doubles
        if (!closed || buf.length < 8) return None
        rings += buf.toArray
      }
      seed += 1
    }
    Some(rings.toArray)
  }

  /** Builds a MultiPolygon from member ways: `inner` flags run parallel to
    * `parts` (role == "inner"; every other role — "outer", "", or the
    * occasional typo — is outer, the OGR leniency). Inner rings attach to the
    * first outer ring containing their first vertex (single-outer relations
    * skip the test). None when stitching fails or an inner is orphaned.
    */
  def buildMultiPolygon(parts: Array[Array[Double]], inner: Array[Boolean]): Option[MultiPolygon] = {
    val outerParts = ArrayBuffer[Array[Double]]()
    val innerParts = ArrayBuffer[Array[Double]]()
    var i = 0
    while (i < parts.length) {
      (if (inner(i)) innerParts else outerParts) += parts(i)
      i += 1
    }
    if (outerParts.isEmpty) return None
    for {
      outers <- stitchRings(outerParts.toArray)
      inners <- stitchRings(innerParts.toArray)
    } yield {
      val polys = outers.map(o => ArrayBuffer[Array[Double]](o))
      var ok = true
      inners.foreach { r =>
        if (outers.length == 1) polys(0) += r
        else {
          val at = outers.indexWhere(o => Algos.pointInRing(r(0), r(1), o))
          if (at < 0) ok = false else polys(at) += r
        }
      }
      if (!ok) return None
      MultiPolygon(polys.map(_.toArray).toArray)
    }
  }
}
