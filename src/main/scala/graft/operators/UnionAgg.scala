package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.geom._

/** Distributed geometry union (dissolve). Two-level: each partition folds its
  * polygons into one MultiPolygon (map-side partial), partials merge once at
  * the end — the reduce tree moves unioned geometry, never row sets, so a
  * dissolve over 100 TB of buffers shuffles one geometry per partition.
  * (reference: erde/op/buffer.py `dissolve=True` — Shapely unary_union.)
  */
object UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  private def polysOf(g: Geom): IndexedSeq[Array[Array[Double]]] = g match {
    case Polygon(rs) => IndexedSeq(rs)
    case MultiPolygon(ps) => ps.toIndexedSeq
    case GeomCollection(gs) => gs.toIndexedSeq.flatMap(polysOf)
    case _ => IndexedSeq.empty
  }

  private def unionWkb(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val polys = polysOf(WKB.read(a)) ++ polysOf(WKB.read(b))
    WKB.write(UnionOps.union(polys))
  }

  override def zero: Array[Byte] = Array.empty[Byte]
  override def reduce(buf: Array[Byte], row: Array[Byte]): Array[Byte] = unionWkb(buf, row)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = unionWkb(a, b)
  override def finish(buf: Array[Byte]): Array[Byte] =
    if (buf.isEmpty) WKB.write(MultiPolygon(Array.empty)) else buf
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  private lazy val fn = udaf(this, Encoders.BINARY)

  /** Column aggregate: `df.agg(UnionAgg.unionAgg(col("geometry")))`. */
  def unionAgg(geom: Column): Column = fn(geom)
}
