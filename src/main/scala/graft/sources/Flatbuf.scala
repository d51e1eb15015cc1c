package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal FlatBuffers wire-format support for the FlatGeobuf driver
  * (format reference: https://flatbuffers.dev/ wire format;
  * https://flatgeobuf.org/ — both open specifications).
  *
  * Reading: [[FbTable]] resolves vtable-indirected fields at absolute buffer
  * positions. Writing: [[FbBuilder]] lays tables out forward (parents before
  * children — uoffsets always point to higher addresses), breadth-first with
  * offset patching, which yields spec-valid buffers without the upstream
  * builder's backward allocation.
  */
private[sources] object Flatbuf {

  def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  /** Table view: `pos` is the absolute position of the table (where the
    * soffset to its vtable lives).
    */
  final class FbTable(val bb: ByteBuffer, val pos: Int) {
    private val vtable = pos - bb.getInt(pos) // soffset: table_pos - value
    private val vtableFields = (bb.getShort(vtable) & 0xffff) / 2 - 2

    /** Absolute position of field `id`'s slot, or 0 when absent. */
    def slot(id: Int): Int = {
      if (id >= vtableFields) return 0
      val off = bb.getShort(vtable + 4 + id * 2) & 0xffff
      if (off == 0) 0 else pos + off
    }

    def getByte(id: Int, dflt: Byte = 0): Byte = {
      val s = slot(id); if (s == 0) dflt else bb.get(s)
    }
    def getBool(id: Int, dflt: Boolean = false): Boolean = {
      val s = slot(id); if (s == 0) dflt else bb.get(s) != 0
    }
    def getShort(id: Int, dflt: Short = 0): Short = {
      val s = slot(id); if (s == 0) dflt else bb.getShort(s)
    }
    def getInt(id: Int, dflt: Int = 0): Int = {
      val s = slot(id); if (s == 0) dflt else bb.getInt(s)
    }
    def getLong(id: Int, dflt: Long = 0): Long = {
      val s = slot(id); if (s == 0) dflt else bb.getLong(s)
    }
    def getDouble(id: Int, dflt: Double = 0): Double = {
      val s = slot(id); if (s == 0) dflt else bb.getDouble(s)
    }

    /** Absolute position of the data a uoffset field points to (0 if absent). */
    private def indirect(id: Int): Int = {
      val s = slot(id); if (s == 0) 0 else s + bb.getInt(s)
    }

    def string(id: Int): Option[String] = {
      val p = indirect(id)
      if (p == 0) None
      else {
        val len = bb.getInt(p)
        val out = new Array[Byte](len)
        var i = 0
        while (i < len) { out(i) = bb.get(p + 4 + i); i += 1 }
        Some(new String(out, "UTF-8"))
      }
    }

    /** (absolute data position, element count) of a vector field. */
    def vector(id: Int): Option[(Int, Int)] = {
      val p = indirect(id)
      if (p == 0) None else Some((p + 4, bb.getInt(p)))
    }

    def doubleVector(id: Int): Array[Double] = vector(id) match {
      case None => Array.empty
      case Some((p, n)) => Array.tabulate(n)(i => bb.getDouble(p + i * 8))
    }
    def intVector(id: Int): Array[Int] = vector(id) match {
      case None => Array.empty
      case Some((p, n)) => Array.tabulate(n)(i => bb.getInt(p + i * 4))
    }
    def byteVectorPos(id: Int): Option[(Int, Int)] = vector(id)

    /** Tables of a vector-of-tables field. */
    def tableVector(id: Int): IndexedSeq[FbTable] = vector(id) match {
      case None => IndexedSeq.empty
      case Some((p, n)) =>
        (0 until n).map { i => new FbTable(bb, p + i * 4 + bb.getInt(p + i * 4)) }
    }
    def table(id: Int): Option[FbTable] = {
      val p = indirect(id)
      if (p == 0) None else Some(new FbTable(bb, p))
    }
  }

  // ---- writing -------------------------------------------------------------

  sealed trait FbValue
  /** Inline scalar: `width` bytes of `bytes` stored in the table. */
  final case class Scalar(bytes: Array[Byte]) extends FbValue
  /** Out-of-line child (string/vector/table): table stores a patched uoffset. */
  final case class Ref(write: FbBuilder => Int) extends FbValue

  /** Forward-writing builder. Children are queued and written after the
    * current table; each queued slot is patched with `child_pos - slot_pos`.
    */
  final class FbBuilder {
    val out = new ArrayBuffer[Byte]()
    private val patches = ArrayBuffer[(Int, FbBuilder => Int)]()

    def pos: Int = out.length
    def pad(alignment: Int, tail: Int = 0): Unit =
      while ((out.length + tail) % alignment != 0) out += 0
    def putByte(v: Byte): Unit = out += v
    def putShort(v: Short): Unit = { out += v.toByte; out += (v >> 8).toByte }
    def putInt(v: Int): Unit = { var i = 0; while (i < 4) { out += (v >> (8 * i)).toByte; i += 1 } }
    def putLong(v: Long): Unit = { var i = 0; while (i < 8) { out += (v >> (8 * i)).toByte; i += 1 } }
    def putDouble(v: Double): Unit = putLong(java.lang.Double.doubleToLongBits(v))
    def putBytes(b: Array[Byte]): Unit = out ++= b
    def patchInt(at: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { out(at + i) = (v >> (8 * i)).toByte; i += 1 }
    }

    /** Writes a table NOW: vtable, then table data; queues children. Fields
      * are (id, value) with absent fields omitted. Returns the table pos.
      */
    def writeTable(fields: Seq[(Int, FbValue)]): Int = {
      val present = fields.sortBy(_._1)
      val maxId = if (present.isEmpty) -1 else present.map(_._1).max
      // layout of table body: soffset(4) then fields in declaration order,
      // each aligned to its width
      var tblSize = 4
      val fieldOffsets = scala.collection.mutable.Map[Int, Int]()
      present.foreach { case (id, v) =>
        val w = v match {
          case Scalar(b) => b.length
          case _: Ref => 4
        }
        while (tblSize % math.min(w, 8) != 0) tblSize += 1
        fieldOffsets(id) = tblSize
        tblSize += w
      }
      val vtSize = 4 + (maxId + 1) * 2
      pad(2)
      val vtPos = pos
      putShort(vtSize.toShort)
      putShort(tblSize.toShort)
      (0 to maxId).foreach { id => putShort(fieldOffsets.getOrElse(id, 0).toShort) }
      pad(4)
      val tblPos = pos
      putInt(tblPos - vtPos) // soffset (positive: vtable is before the table)
      var cur = 4
      present.foreach { case (id, v) =>
        val target = fieldOffsets(id)
        while (cur < target) { putByte(0); cur += 1 }
        v match {
          case Scalar(b) => putBytes(b); cur += b.length
          case Ref(write) =>
            patches += ((pos, write))
            putInt(0); cur += 4
        }
      }
      while (cur < tblSize) { putByte(0); cur += 1 }
      tblPos
    }

    /** Writes all queued children (breadth-first) and patches their slots. */
    def flush(): Unit = {
      while (patches.nonEmpty) {
        val batch = patches.toIndexedSeq
        patches.clear()
        batch.foreach { case (slotPos, write) =>
          val childPos = write(this)
          patchInt(slotPos, childPos - slotPos)
        }
      }
    }

    def writeString(s: String): Int = {
      val b = s.getBytes("UTF-8")
      pad(4)
      val p = pos
      putInt(b.length); putBytes(b); putByte(0)
      p
    }
    def writeByteVector(b: Array[Byte]): Int = {
      pad(4)
      val p = pos
      putInt(b.length); putBytes(b)
      p
    }
    def writeIntVector(v: Array[Int]): Int = {
      pad(4)
      val p = pos
      putInt(v.length); v.foreach(putInt)
      p
    }
    def writeDoubleVector(v: Array[Double]): Int = {
      pad(8, tail = 4) // length word lands so the doubles are 8-aligned
      val p = pos
      putInt(v.length); v.foreach(putDouble)
      p
    }
    /** Vector of uoffsets to tables produced by `writes`. */
    def writeTableVector(writes: Seq[FbBuilder => Int]): Int = {
      pad(4)
      val p = pos
      putInt(writes.length)
      val slots = writes.map { w => val s = pos; putInt(0); (s, w) }
      slots.foreach { case (s, w) => patches += ((s, w)) }
      p
    }

    /** Finishes a size-prefixed buffer whose root table was written at
      * `rootPos`: returns [size][root uoffset][..data..] bytes.
      */
    def sizePrefixed(rootPos: Int): Array[Byte] = {
      flush()
      val body = out.toArray
      val buf = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(4 + body.length)
      buf.putInt(4 + rootPos) // uoffset from its own position to the root
      buf.put(body)
      buf.array()
    }
  }
}
