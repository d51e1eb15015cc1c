package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.functions.TextKernel.mix64

/** Multimodal (image/audio/video) column plumbing: opaque `binary` payloads +
  * typed metadata, processed with per-partition batched transforms — the
  * Spark-side shape a production pipeline needs (schema, batching, partition
  * preservation).
  *
  * The pixel and PCM compute is REAL where the JVM can decode the payload:
  * `javax.imageio` (PNG/JPEG/GIF/BMP readers ship with the JDK) backs decode,
  * resize (bilinear `Graphics2D`), frame sampling (multi-image `ImageReader`)
  * and pixel statistics; WAV PCM samples are parsed straight from the RIFF
  * data chunk for RMS / zero-crossing / spectral-band features. Payloads no
  * JVM codec understands (e.g. WebP pixels, arbitrary bytes) fall back to a
  * clearly-marked deterministic stub so the pipeline shape stays testable on
  * any input.
  */
object Multimodal {

  ImageIO.setUseCache(false) // byte-array streams only — never spill to disk

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

  // ---------------------------------------------------------------- decode

  /** Real image decode via `javax.imageio` (PNG/JPEG/GIF/BMP in the JDK).
    * Returns null when no installed reader understands the payload.
    */
  def decodeImage(bytes: Array[Byte]): BufferedImage =
    try ImageIO.read(new ByteArrayInputStream(bytes)) catch { case _: Exception => null }

  /** PNG-encode (lossless) — the canonical re-encode for derived payloads. */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Container-header metadata where the format is recognizable — pure byte
    * parsing, no decode (cheap path for the big four):
    *   - PNG: 8-byte signature, IHDR width/height at offsets 16/20 (big-endian)
    *   - JPEG: FF D8, then marker segments scanned for SOF0/1/2 (dimensions)
    *   - GIF: logical screen + image-descriptor block walk (frame count)
    *   - WebP: RIFF/WEBP with VP8 / VP8L / VP8X payloads
    * Unrecognized payloads get one real `ImageIO` decode attempt (covers BMP
    * et al.), then fall back to the deterministic STUB (pseudo-meta from a
    * byte hash) so the pipeline shape stays testable on non-media bytes.
    */
  private[operators] def mediaMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
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
    // real decode attempt for formats without a hand-parsed header (BMP, …)
    val img = decodeImage(bytes)
    if (img != null) return ("image", img.getWidth, img.getHeight, 1)
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

  // ---------------------------------------------------------------- resize

  /** Real bilinear resample to exactly w×h (RGB). */
  def resizeImage(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** STUB resize for undecodable payloads: deterministic bytes of the target
    * size's scale, so non-media rows still flow through the pipeline.
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

  // ----------------------------------------------------------------- audio

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Real RIFF/WAVE header metadata — walks the chunk list for `fmt ` (sample
    * rate, channels, bit depth) and `data` (payload size → duration). Pure
    * byte parsing; non-WAV payloads get a deterministic STUB like mediaMeta.
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

  /** Real 16-bit PCM samples from a RIFF/WAVE payload (interleaved channels
    * flattened in order). Returns null when the payload is not PCM16 WAV.
    */
  def pcmSamples16(bytes: Array[Byte]): Array[Int] = {
    if (!(bytes.length >= 44 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE"))) return null
    var bits = 0; var fmtCode = 0
    var dataOff = -1; var dataLen = 0L
    var i = 12
    var ok = true
    while (ok && i + 8 <= bytes.length) {
      val size = le32(bytes, i + 4).toLong & 0xffffffffL
      if (ascii(bytes, i, "fmt ") && i + 24 <= bytes.length) {
        fmtCode = le16(bytes, i + 8)
        bits = le16(bytes, i + 22)
      } else if (ascii(bytes, i, "data") && dataOff < 0) {
        dataOff = i + 8; dataLen = size
      }
      val next = i.toLong + 8L + size + (size & 1L)
      if (next > Int.MaxValue) ok = false else i = next.toInt
    }
    if (fmtCode != 1 || bits != 16 || dataOff < 0) return null
    val avail = math.min(dataLen, (bytes.length - dataOff).toLong).toInt
    val n = avail / 2
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = (le16(bytes, dataOff + k * 2) << 16) >> 16 // sign-extend
      k += 1
    }
    out
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

  val pcmStatsSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("mean_sample", DoubleType, nullable = false)))

  /** Adds a `pcm_stats` struct computed from REAL decoded WAV PCM16 samples:
    * RMS (normalized to [0,1] by 32768), zero-crossing count, sample mean.
    * Null for payloads that aren't PCM16 WAV. Integer-exact accumulators so
    * the result is reproducible (and SQL-mirrorable) bit-for-bit.
    */
  def withPcmStats(df: DataFrame, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField("pcm_stats", pcmStatsSchema, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val stats: Row = if (bytes == null) null else {
          val s = pcmSamples16(bytes)
          if (s == null) null else {
            val (_, sr, _, _, durMs) = audioMetaStub(bytes)
            var sum = 0L; var sumSq = 0L; var zc = 0L
            var k = 0
            while (k < s.length) {
              sum += s(k)
              sumSq += s(k).toLong * s(k)
              if (k > 0 && s(k - 1).toLong * s(k) < 0) zc += 1
              k += 1
            }
            val n = s.length
            val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n) / 32768.0
            val mean = if (n == 0) 0.0 else sum.toDouble / n
            Row(sr, n.toLong, durMs, rms, zc, mean)
          }
        }
        Row.fromSeq(r.toSeq :+ stats)
      }
    }(enc)
  }

  /** Extracts fixed-size audio features from REAL WAV PCM: [rms, zero-crossing
    * rate, mean] then Goertzel log-energies at `dim - 3` evenly spaced
    * frequencies up to Nyquist (the classic single-bin DFT recurrence —
    * Goertzel 1958, public domain). Non-WAV payloads fall back to a
    * deterministic STUB vector so arbitrary rows still flow.
    */
  def audioFeatures(df: DataFrame, dim: Int = 13, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(
      StructField("audio_features", ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats: Array[Float] = if (bytes == null) null else {
          val s = pcmSamples16(bytes)
          if (s != null) {
            val n = math.min(s.length, 8192) // bounded per-row work
            var sum = 0L; var sumSq = 0L; var zc = 0L
            var k = 0
            while (k < n) {
              sum += s(k); sumSq += s(k).toLong * s(k)
              if (k > 0 && s(k - 1).toLong * s(k) < 0) zc += 1
              k += 1
            }
            val rms = if (n == 0) 0f else (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat
            val zcr = if (n > 1) zc.toFloat / (n - 1) else 0f
            val mean = if (n == 0) 0f else (sum.toDouble / n / 32768.0).toFloat
            val head = Array(rms, zcr, mean)
            if (dim <= 3) head.take(dim)
            else head ++ Array.tabulate(dim - 3) { b =>
              // Goertzel power at f = (b+1) / (dim-2) * sr/2
              val w = 2.0 * math.Pi * (b + 1).toDouble / (dim - 2) / 2.0
              val coeff = 2.0 * math.cos(w)
              var s1 = 0.0; var s2 = 0.0
              var i = 0
              while (i < n) {
                val s0 = s(i) / 32768.0 + coeff * s1 - s2
                s2 = s1; s1 = s0
                i += 1
              }
              val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
              math.log10(1.0 + power).toFloat
            }
          } else {
            // STUB fallback: deterministic pseudo-features from the byte hash
            var h = mix64(bytes.length.toLong)
            var i = 0
            val nb = math.min(bytes.length, 256)
            while (i < nb) { h = mix64(h ^ bytes(i)); i += 1 }
            Array.tabulate(dim) { d => ((mix64(h ^ d) % 2000) / 1000.0f) - 1.0f }
          }
        }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  // --------------------------------------------------------- df-level ops

  /** Adds a `media_meta` struct decoded from `binCol`. Runs as a
    * per-partition batch pass (mapPartitions — one decoder init per
    * partition, the mapInPandas-equivalent batching shape on the JVM).
    */
  def withMeta(df: DataFrame, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField("media_meta", metaSchema, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val meta = if (bytes == null) null else {
          val (fmt, w, h, f) = mediaMeta(bytes)
          Row(fmt, w, h, f)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  val pixelStatsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** Adds a `pixel_stats` struct from a REAL `ImageIO` decode of `binCol`:
    * decoded width/height (not header fields), pixel count, and mean channel
    * intensity = Σ(r+g+b) / (3·n_px) over the full raster — an integer-exact
    * sum, so the double division is reproducible bit-for-bit. Null when no
    * JVM reader decodes the payload.
    */
  def withPixelStats(df: DataFrame, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField("pixel_stats", pixelStatsSchema, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val stats: Row = if (bytes == null) null else {
          val img = decodeImage(bytes)
          if (img == null) null else {
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Row(w, h, n, sum.toDouble / (3.0 * n))
          }
        }
        Row.fromSeq(r.toSeq :+ stats)
      }
    }(enc)
  }

  /** 64-bit average-hash (aHash) of a decoded image — the classic
    * perceptual fingerprint: pixels pool into an 8×8 block grid (block of
    * (x, y) = (y·8/h)·8 + x·8/w, integer division), bit b is set iff block
    * b's mean channel sum exceeds the global mean. The comparison is
    * cross-multiplied in Long arithmetic (blockSum·nPx > totalSum·blockPx),
    * so the hash is integer-exact and SQL-mirrorable — no float thresholds.
    * Near-identical images land within a few bits (crop/noise/re-encode),
    * which the hamming-ball dedup ([[Dedup.hammingDedup]]) then collapses.
    */
  def aHash64(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val bs = new Array[Long](64)
    val bc = new Array[Long](64)
    var ts = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val s = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val b = by * 8 + x * 8 / w
        bs(b) += s; bc(b) += 1; ts += s
        x += 1
      }
      y += 1
    }
    val tc = w.toLong * h
    var out = 0L
    var b = 0
    while (b < 64) {
      if (bc(b) > 0 && bs(b) * tc > ts * bc(b)) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Adds a 64-bit perceptual `ahash` ([[aHash64]]) from a REAL decode of
    * `binCol`; null when no JVM reader decodes the payload. Feed to
    * [[Dedup.hammingDedup]] for image near-dup removal.
    */
  def withImageAHash(df: DataFrame, binCol: String = "content",
      out: String = "ahash"): DataFrame = {
    val outSchema = df.schema.add(StructField(out, LongType, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val ah: Any = if (bytes == null) null else {
          val img = decodeImage(bytes)
          if (img == null) null else aHash64(img)
        }
        Row.fromSeq(r.toSeq :+ ah)
      }
    }(enc)
  }

  /** Replaces `binCol` with a REAL resized payload (`ImageIO` decode →
    * bilinear resample → PNG re-encode) when the payload decodes; a
    * deterministic stub otherwise. Partition-preserving, no shuffle.
    */
  def resize(df: DataFrame, w: Int, h: Int, binCol: String = "content"): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out = if (bytes == null) null else {
          val img = decodeImage(bytes)
          if (img != null) encodePng(resizeImage(img, w, h)) else resizeStub(bytes, w, h)
        }
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }

  /** Samples every `everyN`-th frame of a multi-frame payload into a
    * `frames array<binary>` column. REAL for formats whose `ImageReader`
    * exposes multiple images (GIF): each sampled frame is decoded and
    * re-encoded as PNG. Undecodable payloads get stub frames sized from the
    * header walk so the explode-ready array shape is preserved.
    */
  def frameSample(df: DataFrame, everyN: Int, binCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(
      StructField("frames", ArrayType(BinaryType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val frames: Array[Array[Byte]] = if (bytes == null) null else {
          val real = realFrames(bytes, everyN)
          if (real != null) real
          else {
            val (_, w, h, n) = mediaMeta(bytes)
            (0 until n by everyN).map(i => resizeStub(bytes, w ^ i, h)).toArray
          }
        }
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(enc)
  }

  /** Real frame extraction: every `everyN`-th image of the payload's
    * `ImageReader`, PNG re-encoded. Null when no reader claims the payload.
    */
  private def realFrames(bytes: Array[Byte], everyN: Int): Array[Array[Byte]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          (0 until n by everyN).map(i => encodePng(reader.read(i))).toArray
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => null }

  // ------------------------------------------------------------- fixtures

  /** Deterministic grayscale gradient PNG: pixel (x,y) has r=g=b =
    * (x·31 + y·17 + seed) mod 256. Lossless, so a real decode recovers the
    * exact values — the formula is mirrored in `OracleSql.multimodalPixels`.
    */
  def synthPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 31L + y * 17L + seed) % 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic PCM16 mono WAV: n samples at `sampleRate`, sample i =
    * ((seed·31 + i·7) mod 2003) − 1001 — mirrored in
    * `OracleSql.multimodalAudio`.
    */
  def synthWav(n: Int, seed: Long, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = s.indices.foreach(i => out(o + i) = s.charAt(i).toByte)
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def putLe16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, 1)
    putLe32(24, sampleRate); putLe32(28, sampleRate * 2); putLe16(32, 2); putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < n) {
      val s = (((seed * 31L + i * 7L) % 2003L) - 1001L).toInt
      putLe16(44 + i * 2, s & 0xffff)
      i += 1
    }
    out
  }

  /** Real animated GIF via the JDK's sequence writer: `frames` grayscale
    * gradient frames (seed advances per frame), w×h each.
    */
  def synthGif(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((x * 31L + y * 17L + seed + f) % 256L).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Adds a synthetic gradient PNG `content` column derived from `idCol`:
    * width = 8 + id mod 24, height = 8 + (id div 7) mod 24, seed = id.
    * The fixture generator for the real-decode oracle path.
    */
  def withSyntheticImage(df: DataFrame, idCol: String, out: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField(out, BinaryType, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idx) match { case l: Long => l; case i: Int => i.toLong; case x => x.toString.toLong }
        val w = (8 + id % 24).toInt
        val h = (8 + (id / 7) % 24).toInt
        Row.fromSeq(r.toSeq :+ synthPng(w, h, id))
      }
    }(enc)
  }

  /** Adds a synthetic PCM16 WAV `content` column derived from `idCol`:
    * n = 256 + id mod 256 samples at 8 kHz, seed = id.
    */
  def withSyntheticWav(df: DataFrame, idCol: String, out: String = "content",
      sampleRate: Int = 8000): DataFrame = {
    val outSchema = df.schema.add(StructField(out, BinaryType, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idx) match { case l: Long => l; case i: Int => i.toLong; case x => x.toString.toLong }
        val n = (256 + id % 256).toInt
        Row.fromSeq(r.toSeq :+ synthWav(n, id, sampleRate))
      }
    }(enc)
  }
}
