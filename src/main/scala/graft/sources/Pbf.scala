package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal protobuf wire-format reader/writer for the OSM PBF driver
  * (format reference: https://protobuf.dev/programming-guides/encoding/ and
  * https://wiki.openstreetmap.org/wiki/PBF_Format — both open specs).
  */
private[sources] object Pbf {

  /** Sequential reader over `bytes[from, until)`. */
  final class Reader(bytes: Array[Byte], from: Int, until: Int) {
    var pos: Int = from
    def hasMore: Boolean = pos < until

    def varint(): Long = {
      var out = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }

    /** (fieldNumber, wireType) */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }

    def lenDelimited(): (Int, Int) = { // (start, length)
      val len = varint().toInt
      val start = pos
      pos += len
      (start, len)
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val _ = lenDelimited()
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"pbf wire type $other")
    }

    def slice(start: Int, len: Int): Reader = new Reader(bytes, start, start + len)
    def sliceBytes(start: Int, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, start, start + len)

    def packedVarints(start: Int, len: Int): Array[Long] = {
      val r = new Reader(bytes, start, start + len)
      val out = ArrayBuffer[Long]()
      while (r.hasMore) out += r.varint()
      out.toArray
    }
    def packedZigzags(start: Int, len: Int): Array[Long] = {
      val r = new Reader(bytes, start, start + len)
      val out = ArrayBuffer[Long]()
      while (r.hasMore) out += r.zigzag()
      out.toArray
    }
  }

  /** Append-only writer. */
  final class Writer {
    val out = new ArrayBuffer[Byte]()
    def toBytes: Array[Byte] = out.toArray

    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      out += v.toByte
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out ++= b
    }
    def stringField(field: Int, s: String): Unit = bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def packedVarints(field: Int, vs: Seq[Long]): Unit = {
      val w = new Writer
      vs.foreach(w.varint)
      bytesField(field, w.toBytes)
    }
    def packedZigzags(field: Int, vs: Seq[Long]): Unit = {
      val w = new Writer
      vs.foreach(w.zigzag)
      bytesField(field, w.toBytes)
    }
  }
}
