package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Real (non-stub) multimodal compute: ImageIO decode / resize / frame
  * sampling and WAV PCM statistics, verified against closed-form expectations
  * on deterministic fixtures.
  */
class MultimodalRealSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("withPixelStats decodes synthetic PNGs back to exact dims and mean") {
    val ids = Seq(0L, 1L, 7L, 100L, 255L)
    val df = Multimodal.withSyntheticImage(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.withPixelStats(df)
      .select("doc_id", "pixel_stats.width", "pixel_stats.height", "pixel_stats.n_px",
        "pixel_stats.mean_intensity")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    ids.foreach { id =>
      val w = (8 + id % 24).toInt
      val h = (8 + (id / 7) % 24).toInt
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) sum += 3 * ((x * 31L + y * 17L + id) % 256L)
      val (gw, gh, gn, gm) = got(id)
      assert(gw == w && gh == h && gn == w.toLong * h)
      assert(gm == sum.toDouble / (3.0 * w * h)) // bit-exact: integer sums
    }
  }

  test("withPixelStats is null for undecodable payloads") {
    val df = Seq((1L, "not an image".getBytes)).toDF("id", "content")
    assert(Multimodal.withPixelStats(df).select("pixel_stats").head().isNullAt(0))
  }

  test("resize really resamples: constant image stays constant at new dims") {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, 0x708090)
    val df = Seq((1L, Multimodal.encodePng(img))).toDF("id", "content")
    val out = Multimodal.resize(df, 16, 16).head().getAs[Array[Byte]]("content")
    val back = Multimodal.decodeImage(out)
    assert(back.getWidth == 16 && back.getHeight == 16)
    // bilinear over a constant field is that constant everywhere
    for (y <- 0 until 16; x <- 0 until 16) assert((back.getRGB(x, y) & 0xffffff) == 0x708090)
    // and the gradient fixture at least preserves the global mean direction
    val grad = Multimodal.withSyntheticImage(Seq(100L).toDF("doc_id"), "doc_id")
    val resized = Multimodal.resize(grad, 8, 8)
    val stats = Multimodal.withPixelStats(resized).select("pixel_stats.width").head()
    assert(stats.getInt(0) == 8)
  }

  test("JPEG payloads decode through the real path (lossy-tolerant)") {
    val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) { val v = 120; img.setRGB(x, y, (v << 16) | (v << 8) | v) }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpeg", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "content")
    val r = Multimodal.withPixelStats(df)
      .select("pixel_stats.width", "pixel_stats.height", "pixel_stats.mean_intensity").head()
    assert(r.getInt(0) == 40 && r.getInt(1) == 30)
    assert(math.abs(r.getDouble(2) - 120.0) < 3.0) // JPEG is lossy but close on flat fields
  }

  test("synthGif animates; frameSample extracts real decodable frames") {
    val gif = Multimodal.synthGif(24, 16, frames = 5, seed = 9L)
    val df = Seq((1L, gif)).toDF("id", "content")
    val meta = Multimodal.withMeta(df).select("media_meta.format", "media_meta.n_frames").head()
    assert(meta.getString(0) == "gif" && meta.getInt(1) == 5)
    val frames = Multimodal.frameSample(df, everyN = 2)
      .select(explode(col("frames")).as("f")).collect().map(_.getAs[Array[Byte]]("f"))
    assert(frames.length == 3) // frames 0, 2, 4
    frames.foreach { f =>
      val img = Multimodal.decodeImage(f)
      assert(img != null && img.getWidth == 24 && img.getHeight == 16)
    }
  }

  test("withPcmStats matches the closed-form PCM accumulation exactly") {
    val ids = Seq(0L, 1L, 42L, 255L)
    val df = Multimodal.withSyntheticWav(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.withPcmStats(df)
      .select("doc_id", "pcm_stats.n_samples", "pcm_stats.duration_ms", "pcm_stats.rms",
        "pcm_stats.zero_crossings", "pcm_stats.mean_sample")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    ids.foreach { id =>
      val n = (256 + id % 256).toInt
      val s = Array.tabulate(n)(i => (((id * 31L + i * 7L) % 2003L) - 1001L).toInt)
      val sum = s.map(_.toLong).sum
      val sumSq = s.map(v => v.toLong * v).sum
      val zc = (1 until n).count(i => s(i - 1).toLong * s(i) < 0)
      val (gn, gd, gr, gz, gm) = got(id)
      assert(gn == n.toLong)
      assert(gd == (2L * n * 1000) / 16000)
      assert(gr == math.sqrt(sumSq.toDouble / n) / 32768.0)
      assert(gz == zc.toLong)
      assert(gm == sum.toDouble / n)
    }
  }

  test("audioFeatures: band energies localize a pure tone; stub for non-WAV") {
    val sr = 8000
    val dim = 13
    // tone centred on band b=4 of the Goertzel bank: f = (4+1)/(2*(dim-2)) * sr
    val f = (4 + 1).toDouble / (2 * (dim - 2)) * sr
    val n = 4096
    val samples = Array.tabulate(n)(i => (8000 * math.sin(2 * math.Pi * f * i / sr)).round.toInt)
    val wav = {
      val base = Multimodal.synthWav(n, 0L, sr)
      var i = 0
      while (i < n) {
        val v = samples(i)
        base(44 + i * 2) = v.toByte; base(44 + i * 2 + 1) = (v >> 8).toByte
        i += 1
      }
      base
    }
    val df = Seq((1L, wav), (2L, "plain text".getBytes)).toDF("id", "content")
    val feats = Multimodal.audioFeatures(df, dim)
      .select("id", "audio_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val tone = feats(1L)
    assert(tone.length == dim)
    // rms of a full-scale-ish sine ≈ A/√2/32768
    assert(math.abs(tone(0) - 8000.0 / math.sqrt(2) / 32768.0) < 0.005)
    val bands = tone.drop(3)
    assert(bands.indexOf(bands.max) == 4)
    // non-WAV fallback is deterministic
    val again = Multimodal.audioFeatures(df, dim)
      .select("id", "audio_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(feats(2L).toSeq == again(2L).toSeq)
  }

  test("aHash64: shift-invariant on smooth images, sensitive to structure") {
    def gradient(w: Int, h: Int, bias: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(255, math.max(0, x * 4 + bias))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val base = Multimodal.aHash64(gradient(64, 64, 0))
    // a uniform +10 brightness shift (no clipping structure change) keeps
    // every block's relation to the mean: identical hash
    assert(Multimodal.aHash64(gradient(64, 64, 10)) == base)
    // transposing the gradient flips the structure: many bits differ
    val img2 = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = math.min(255, y * 4)
      img2.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(java.lang.Long.bitCount(Multimodal.aHash64(img2) ^ base) > 10)
    // downscale of the same structure stays within a small hamming ball
    val small = Multimodal.aHash64(gradient(32, 32, 0))
    assert(java.lang.Long.bitCount(small ^ base) <= 8)
  }

  test("withImageAHash + hammingDedup collapse re-encoded duplicates") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      Multimodal.encodePng(img)
    }
    val a = png(40, 40, (x, y) => x * 3 + y)          // structure A
    val a2 = png(40, 40, (x, y) => x * 3 + y + 6)     // same structure, brighter
    val b = png(40, 40, (x, y) => 255 - (x * 3 + y))  // inverted structure
    val rows = Seq((1L, a), (2L, a2), (3L, b), (4L, Array[Byte](1, 2, 3)))
    val df = rows.toDF("doc_id", "content")
    val hashed = Multimodal.withImageAHash(df)
    val ahashes = hashed.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(ahashes(4L).isEmpty, "undecodable payload hashes to null")
    assert(ahashes(1L) == ahashes(2L), "brightness shift preserved the hash")
    assert(ahashes(1L) != ahashes(3L))
    val kept = Dedup.hammingDedup(hashed, "ahash", "doc_id", maxHamming = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L), s"got $kept") // 2 collapses into 1; null survives
  }
}
