package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass mergeable quantile sketch in the KLL family (Karnin, Lang,
  * Liberty 2016, "Optimal quantile approximation in streams"), deterministic
  * variant: each level is a compactor of capacity `k`; on overflow the level
  * is sorted and every other item survives to the level above with doubled
  * weight, the surviving offset alternating 0/1 per level per compaction (a
  * parity bit per level replaces the paper's coin flip, so a given arrival
  * order reproduces bit-identically).
  *
  * Why it exists next to [[Sketch.histQuantiles]]: the histogram needs TWO
  * corpus passes (min/max, then bin counts); the KLL sketch is ONE pass,
  * needs no a-priori value range, and its state is mergeable — persist one
  * sketch row per shard / per day, [[Kll.mergeQuantilesAgg]] across shards
  * without rescanning. At 100 TB that halves scan cost and turns corpus
  * profiling into sketch-table algebra, the same shape as the HLL / CMS /
  * Bloom register tables.
  *
  * Exact mode: with `k >= n` nothing ever compacts, the sketch holds the
  * full multiset, and `quantile(q)` is exactly the discrete lower quantile
  * (smallest value whose cumulative count reaches ⌈q·n⌉) — the oracle gate
  * runs this mode against DuckDB's native `quantile_disc`. Compacted mode
  * carries the classic additive rank-error O(levels/k), spec'd empirically.
  *
  * Scale shape: buffers live as mutable objects inside the hash aggregate
  * (serialization only at partial-merge shuffle boundaries), map-side
  * partials combine per partition, and the output is O(k · log(n/k)) bytes
  * whatever the input size.
  */
object Kll {

  /** Mutable aggregation buffer: `levels(l)` holds items of weight `2^l`,
    * `parity(l)` the next compaction offset for level `l`.
    */
  final class Buf(val k: Int) extends Serializable {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    val parity: ArrayBuffer[Boolean] = ArrayBuffer(false)

    def isEmpty: Boolean = levels.forall(_.isEmpty)

    def insert(v: Double): Unit = {
      levels(0) += v
      if (levels(0).length >= k) compact(0)
    }

    /** Sort level `l`, promote alternating items (starting at the level's
      * parity offset) to `l+1` with doubled weight, flip the parity. An odd
      * straggler stays behind at its own weight so total weight is conserved
      * EXACTLY (promoting ⌈len/2⌉ of an odd level would inflate it). Cascades
      * while the receiving level overflows in turn.
      */
    private def compact(l: Int): Unit = {
      var lvl = l
      while (lvl < levels.length && levels(lvl).length >= k) {
        val items = levels(lvl).toArray
        java.util.Arrays.sort(items)
        if (lvl + 1 >= levels.length) { levels += ArrayBuffer.empty[Double]; parity += false }
        val off = if (parity(lvl)) 1 else 0
        parity(lvl) = !parity(lvl)
        val evenLen = items.length & ~1
        levels(lvl).clear()
        if (items.length != evenLen) levels(lvl) += items(items.length - 1)
        var i = off
        while (i < evenLen) { levels(lvl + 1) += items(i); i += 2 }
        lvl += 1
      }
    }

    def mergeIn(other: Buf): Unit = {
      var l = 0
      while (l < other.levels.length) {
        if (l >= levels.length) { levels += ArrayBuffer.empty[Double]; parity += false }
        levels(l) ++= other.levels(l)
        l += 1
      }
      l = 0
      while (l < levels.length) { if (levels(l).length >= k) compact(l); l += 1 }
    }

    /** Compact wire format: [k][nLevels][count_0 items_0 …] (big-endian). */
    def serialize(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(k)
      out.writeInt(levels.length)
      levels.foreach { lv =>
        out.writeInt(lv.length)
        lv.foreach(out.writeDouble)
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buf(in.readInt())
    val n = in.readInt()
    var l = 0
    while (l < n) {
      if (l >= buf.levels.length) { buf.levels += ArrayBuffer.empty[Double]; buf.parity += false }
      val c = in.readInt()
      var i = 0
      while (i < c) { buf.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    buf
  }

  /** Discrete lower quantile from the weighted sample: smallest value whose
    * cumulative weight reaches `q · W` — DuckDB `quantile_disc` semantics,
    * exact when the sketch never compacted.
    */
  def quantile(buf: Buf, q: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < buf.levels.length) {
      val w = 1L << l
      buf.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    require(items.nonEmpty, "quantile of an empty sketch")
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Aggregates raw doubles into serialized sketch bytes — the per-shard
    * persistable state.
    */
  final class SketchAgg(k: Int) extends Aggregator[Double, Buf, Array[Byte]] {
    override def zero: Buf = new Buf(k)
    override def reduce(b: Buf, v: Double): Buf = { b.insert(v); b }
    override def merge(a: Buf, b: Buf): Buf = { a.mergeIn(b); a }
    override def finish(b: Buf): Array[Byte] = b.serialize()
    override def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregates raw doubles straight to the quantile vector (one shot). */
  final class QuantilesAgg(k: Int, qs: Array[Double])
      extends Aggregator[Double, Buf, Array[Double]] {
    override def zero: Buf = new Buf(k)
    override def reduce(b: Buf, v: Double): Buf = { b.insert(v); b }
    override def merge(a: Buf, b: Buf): Buf = { a.mergeIn(b); a }
    override def finish(b: Buf): Array[Double] =
      if (b.isEmpty) Array.empty else qs.map(quantile(b, _))
    override def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Merges serialized sketch rows (per-shard state) to the quantile vector
    * without touching the raw corpus.
    */
  final class MergeQuantilesAgg(qs: Array[Double])
      extends Aggregator[Array[Byte], Buf, Array[Double]] {
    override def zero: Buf = new Buf(0)
    override def reduce(b: Buf, sk: Array[Byte]): Buf = merge(b, deserialize(sk))
    override def merge(a: Buf, b: Buf): Buf =
      if (a.k == 0) b else if (b.k == 0) a else { a.mergeIn(b); a }
    override def finish(b: Buf): Array[Double] =
      if (b.k == 0 || b.isEmpty) Array.empty else qs.map(quantile(b, _))
    override def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  def sketchAgg(valueCol: Column, k: Int): Column =
    udaf(new SketchAgg(k), Encoders.scalaDouble)(valueCol)

  def quantilesAgg(valueCol: Column, k: Int, qs: Seq[Double]): Column =
    udaf(new QuantilesAgg(k, qs.toArray), Encoders.scalaDouble)(valueCol)

  def mergeQuantilesAgg(sketchCol: Column, qs: Seq[Double]): Column =
    udaf(new MergeQuantilesAgg(qs.toArray), Encoders.BINARY)(sketchCol)

  /** `(q, quantile)` rows of `valueCol` in one corpus pass. Exact (and gate-
    * oracled vs native `quantile_disc`) whenever `k >= n`; additive-rank-
    * error approximate above that, state O(k·log(n/k)).
    */
  def kllQuantiles(df: DataFrame, valueCol: String, k: Int = 4096,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(k >= 8, "k must be >= 8")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), "quantiles must be in [0, 1]")
    val data = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val qlits = array(qs.map(lit): _*)
    data.agg(quantilesAgg(col("__v"), k, qs).as("__qv"))
      .select(posexplode(col("__qv")).as(Seq("__pos", "quantile")))
      .select(element_at(qlits, col("__pos") + 1).as("q"), col("quantile"))
  }

  /** Per-group sketch rows `(groupCols…, kll)` — the persistable shard
    * state; reduce with [[mergeQuantilesAgg]].
    */
  def kllSketches(df: DataFrame, valueCol: String, groupCols: Seq[String], k: Int = 4096): DataFrame = {
    val data = df.where(col(valueCol).isNotNull)
    val agg = sketchAgg(col(valueCol).cast("double"), k).as("kll")
    if (groupCols.isEmpty) data.agg(agg)
    else data.groupBy(groupCols.map(col): _*).agg(agg)
  }
}
