package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.geom._

/** Distributed geometry union (dissolve). The buffer is a MultiPolygon WKB
  * that accumulates incoming polygons *without* unioning (concatenation is
  * coverage-equivalent), collapsing through the slab union only when the part
  * count exceeds a cap — so a partition of n rows costs O(n/cap) unions of
  * bounded size, not one O(n²) re-union per row. Partials merge once per
  * partition at the end; the driver never sees raw rows.
  * (reference: erde/op/buffer.py `dissolve=True` — Shapely unary_union.)
  */
object UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  /** Collapse threshold: parts accumulate lazily up to this many, then one
    * slab union folds them. Bounds both memory and union input size.
    */
  private val CollapseAt = 256

  private def polysOf(g: Geom): IndexedSeq[Array[Array[Double]]] = g match {
    case Polygon(rs) => IndexedSeq(rs)
    case MultiPolygon(ps) => ps.toIndexedSeq
    case GeomCollection(gs) => gs.toIndexedSeq.flatMap(polysOf)
    case _ => IndexedSeq.empty
  }

  private def combine(a: Array[Byte], b: Array[Byte], force: Boolean): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val polys = polysOf(WKB.read(a)) ++ polysOf(WKB.read(b))
    if (force || polys.length > CollapseAt)
      WKB.write(UnionOps.union(polys))
    else
      WKB.write(MultiPolygon(polys.toArray)) // lazy concat: coverage-equal
  }

  override def zero: Array[Byte] = Array.empty[Byte]
  override def reduce(buf: Array[Byte], row: Array[Byte]): Array[Byte] =
    combine(buf, row, force = false)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    combine(a, b, force = false)
  override def finish(buf: Array[Byte]): Array[Byte] =
    if (buf.isEmpty) WKB.write(MultiPolygon(Array.empty))
    else WKB.write(UnionOps.union(polysOf(WKB.read(buf))))
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  private lazy val fn = udaf(this, Encoders.BINARY)

  /** Column aggregate: `df.agg(UnionAgg.unionAgg(col("geometry")))`. */
  def unionAgg(geom: Column): Column = fn(geom)
}
