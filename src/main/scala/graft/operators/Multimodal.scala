package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextKernel.mix64

/** Multimodal (image/audio/video) column plumbing: opaque `binary` payloads +
  * typed metadata, processed with per-partition batched transforms — the
  * Spark-side shape a production pipeline needs (schema, batching, partition
  * preservation). The actual codecs are NOT in this environment, so the
  * decode/resize/frame-sample *computations* are deterministic STUBS (clearly
  * marked below); swapping in a real codec changes only the function body,
  * none of the distributed plumbing.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + s.length && s.indices.forall(i => (b(o + i) & 0xff) == s.charAt(i))

  /** Real container-header metadata where the format is recognizable —
    * pure-JVM byte parsing, no codec:
    *   - PNG: 8-byte signature, IHDR width/height at offsets 16/20 (big-endian)
    *   - JPEG: FF D8, then marker segments scanned for SOF0/1/2 (dimensions)
    * Unrecognized payloads fall back to the deterministic STUB (pseudo-meta
    * from a byte hash) so the pipeline shape stays testable without codecs.
    */
  private def decodeStub(bytes: Array[Byte]): (String, Int, Int, Int) = {
    // PNG: \x89PNG\r\n\x1a\n + IHDR (first chunk by spec)
    if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      return ("png", be32(bytes, 16), be32(bytes, 20), 1)
    // JPEG: SOI then marker segments; SOFn carries height/width
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < bytes.length && (bytes(i) & 0xff) == 0xff) {
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return ("jpeg", be16(bytes, i + 7), be16(bytes, i + 5), 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else i += 2 + be16(bytes, i + 2)
      }
      return ("jpeg", 0, 0, 1) // truncated header: recognized, dimensionless
    }
    // GIF87a/89a: little-endian logical screen, frame count by block walk
    if (bytes.length >= 13 && (ascii(bytes, 0, "GIF87a") || ascii(bytes, 0, "GIF89a"))) {
      val w = le16(bytes, 6); val h = le16(bytes, 8)
      var frames = 0
      var i = 13 + (if ((bytes(10) & 0x80) != 0) 3 * (2 << (bytes(10) & 0x07)) else 0)
      var done = false
      while (!done && i < bytes.length) {
        (bytes(i) & 0xff) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: label byte, then length-prefixed sub-blocks
            i += 2
            while (i < bytes.length && bytes(i) != 0) i += 1 + (bytes(i) & 0xff)
            i += 1
          case 0x2c => // image descriptor (+ optional local color table)
            frames += 1
            if (i + 10 > bytes.length) { done = true }
            else {
              i += 10 + (if ((bytes(i + 9) & 0x80) != 0) 3 * (2 << (bytes(i + 9) & 0x07)) else 0)
              i += 1 // LZW minimum code size
              while (i < bytes.length && bytes(i) != 0) i += 1 + (bytes(i) & 0xff)
              i += 1
            }
          case _ => done = true // corrupt block stream: keep what we counted
        }
      }
      return ("gif", w, h, math.max(frames, 1))
    }
    // WebP: RIFF container, WEBP form; VP8 (lossy) / VP8L (lossless) / VP8X
    if (bytes.length >= 30 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WEBP")) {
      if (ascii(bytes, 12, "VP8X"))
        return ("webp", le24(bytes, 24) + 1, le24(bytes, 27) + 1, 1)
      if (ascii(bytes, 12, "VP8L") && (bytes(20) & 0xff) == 0x2f) {
        val b = le32(bytes, 21)
        return ("webp", (b & 0x3fff) + 1, ((b >> 14) & 0x3fff) + 1, 1)
      }
      if (ascii(bytes, 12, "VP8 "))
        return ("webp", le16(bytes, 26) & 0x3fff, le16(bytes, 28) & 0x3fff, 1)
    }
    // STUB fallback: deterministic pseudo-metadata from the payload hash
    var h = 0L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { h = mix64(h ^ bytes(i)); i += 1 }
    val fmt = Seq("png", "jpeg", "webp")(((h % 3) + 3).toInt % 3)
    val w = 64 + (math.abs(h >> 8) % 1024).toInt
    val hgt = 64 + (math.abs(h >> 24) % 1024).toInt
    val frames = 1 + (math.abs(h >> 40) % 64).toInt
    (fmt, w, hgt, frames)
  }

  /** STUB resize: emits a deterministic payload of the target size's scale.
    * A real implementation decodes, resamples, re-encodes.
    */
  private def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val outLen = math.max(16, math.min(4096, w * h / 64))
    val out = new Array[Byte](outLen)
    var acc = mix64(bytes.length.toLong ^ (w.toLong << 32) ^ h.toLong)
    var i = 0
    while (i < outLen) {
      if (i % 8 == 0) acc = mix64(acc)
      out(i) = (acc >>> ((i % 8) * 8)).toByte
      i += 1
    }
    out
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Real RIFF/WAVE header metadata — walks the chunk list for `fmt ` (sample
    * rate, channels, bit depth) and `data` (payload size → duration). Pure
    * byte parsing; non-WAV payloads get a deterministic STUB like decodeStub.
    */
  private[operators] def audioMetaStub(bytes: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (bytes.length >= 44 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE")) {
      var sampleRate = 0; var channels = 0; var bits = 0; var byteRate = 0
      var dataLen = 0L
      var i = 12
      var ok = true
      while (ok && i + 8 <= bytes.length) {
        // unsigned chunk size + long advance: a corrupt size can't walk i
        // negative or wrap past Int.MaxValue
        val size = le32(bytes, i + 4).toLong & 0xffffffffL
        if (ascii(bytes, i, "fmt ") && i + 24 <= bytes.length) {
          channels = le16(bytes, i + 10)
          sampleRate = le32(bytes, i + 12)
          byteRate = le32(bytes, i + 16)
          bits = le16(bytes, i + 22)
        } else if (ascii(bytes, i, "data")) {
          dataLen = size
        }
        val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
        if (next > Int.MaxValue) ok = false else i = next.toInt
      }
      val durMs = if (byteRate > 0) dataLen * 1000L / byteRate else 0L
      return ("wav", sampleRate, channels, bits, durMs)
    }
    // STUB fallback: deterministic pseudo-metadata from the payload hash
    var h = 0L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { h = mix64(h ^ bytes(i)); i += 1 }
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    ("audio", rates((((h >> 8) % 5).toInt + 5) % 5), 1 + (math.abs(h >> 24) % 2).toInt,
      16, 500L + math.abs(h >> 32) % 60000L)
  }

  /** Adds an `audio_meta` struct parsed from `binCol` (real for WAV; STUB
    * otherwise) — same per-partition batch shape as [[withMeta]].
    */
  def withAudioMeta(df: DataFrame, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField("audio_meta", audioMetaSchema, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val meta = if (bytes == null) null else {
          val (fmt, sr, ch, bits, dur) = audioMetaStub(bytes)
          Row(fmt, sr, ch, bits, dur)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Adds a `media_meta` struct decoded from `binCol`. Runs as a
    * per-partition batch pass (mapPartitions — one decoder init per
    * partition, the mapInPandas-equivalent batching shape on the JVM).
    */
  def withMeta(df: DataFrame, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField("media_meta", metaSchema, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (real codec: expensive setup)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val meta = if (bytes == null) null else {
          val (fmt, w, h, f) = decodeStub(bytes)
          Row(fmt, w, h, f)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Replaces `binCol` with a resized payload (STUB computation, real
    * batching): partition-preserving, no shuffle.
    */
  def resize(df: DataFrame, w: Int, h: Int, binCol: String = "content"): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out = if (bytes == null) null else resizeStub(bytes, w, h)
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }

  /** Extracts fixed-size audio features (STUB: deterministic pseudo-MFCC
    * vector; a real implementation decodes PCM and runs the filterbank) into
    * an `audio_features array<float>` column. Same mapPartitions batch shape.
    */
  def audioFeatures(df: DataFrame, dim: Int = 13, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(
      StructField("audio_features", ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) null else {
          var h = mix64(bytes.length.toLong)
          var i = 0
          val n = math.min(bytes.length, 256)
          while (i < n) { h = mix64(h ^ bytes(i)); i += 1 }
          Array.tabulate(dim) { d =>
            ((mix64(h ^ d) % 2000) / 1000.0f) - 1.0f
          }
        }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Samples every `everyN`-th frame of a video payload into a
    * `frames array<binary>` column (STUB frame extraction; the explode-ready
    * array shape is what a real sampler produces).
    */
  def frameSample(df: DataFrame, everyN: Int, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(
      StructField("frames", ArrayType(BinaryType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val frames = if (bytes == null) null else {
          val (_, w, h, n) = decodeStub(bytes)
          (0 until n by everyN).map(i => resizeStub(bytes, w ^ i, h)).toArray
        }
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(enc)
  }
}
