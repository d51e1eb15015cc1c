package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalOsmSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  private lazy val media = Seq(
    (1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    (2L, Array[Byte](9, 9, 9, 9)),
    (3L, null.asInstanceOf[Array[Byte]]))
    .toDF("id", "content")

  test("withMeta adds a typed meta struct, deterministic, null-safe") {
    val out = Multimodal.withMeta(media)
    assert(out.schema("media_meta").dataType.typeName == "struct")
    val rows = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Any]("media_meta")).toMap
    assert(rows(3L) == null)
    val again = Multimodal.withMeta(media).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Any]("media_meta")).toMap
    assert(rows(1L) == again(1L)) // deterministic stub
    val m = out.where(col("id") === 1).select("media_meta.width", "media_meta.height").head()
    assert(m.getInt(0) >= 64 && m.getInt(1) >= 64)
  }

  test("withMeta parses real PNG IHDR and JPEG SOF0 headers") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // minimal PNG: signature + IHDR chunk (length, type, 640x480, rest zeroed)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0)
    // minimal JPEG: SOI, APP0 (skipped), SOF0 with 480 high x 640 wide
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 'J', 'F') ++ // APP0 len=4
      Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8) ++
      Array[Byte](0x01, 0xe0.toByte) ++ Array[Byte](0x02, 0x80.toByte) ++ // 480, 640
      new Array[Byte](10)
    val real = Seq((1L, png), (2L, jpeg)).toDF("id", "content")
    val metas = Multimodal.withMeta(real)
      .select("id", "media_meta.format", "media_meta.width", "media_meta.height", "media_meta.n_frames")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(metas(1L) == (("png", 640, 480, 1)))
    assert(metas(2L) == (("jpeg", 640, 480, 1)))
  }

  test("withMeta parses GIF logical screen + frame count and WebP variants") {
    // GIF89a 320x200, no GCT, two frames (image descriptors with empty LZW data)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def gifFrame(w: Int, h: Int) =
      Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
        Array[Byte](0x00, 0x02, 0x01, 0x00, 0x00) // no LCT, min code 2, 1-byte block, terminator
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++ Array[Byte](0x00, 0x00, 0x00) ++
      gifFrame(320, 200) ++ gifFrame(320, 200) ++ Array[Byte](0x3b)
    // WebP lossy VP8: RIFF header, VP8 chunk; dims at payload bytes 6..9
    val vp8 = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WEBPVP8 ".getBytes ++
      Array[Byte](0, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      le16(550) ++ le16(368) ++ new Array[Byte](4)
    // WebP lossless VP8L: 0x2f signature then 14-bit (w-1), 14-bit (h-1)
    val dims = 99 | (149 << 14)
    val vp8l = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WEBPVP8L".getBytes ++
      Array[Byte](0, 0, 0, 0, 0x2f) ++
      Array[Byte](dims.toByte, (dims >> 8).toByte, (dims >> 16).toByte, (dims >> 24).toByte) ++
      new Array[Byte](8)
    val df = Seq((1L, gif), (2L, vp8), (3L, vp8l)).toDF("id", "content")
    val metas = Multimodal.withMeta(df)
      .select("id", "media_meta.format", "media_meta.width", "media_meta.height", "media_meta.n_frames")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(metas(1L) == (("gif", 320, 200, 2)))
    assert(metas(2L) == (("webp", 550, 368, 1)))
    assert(metas(3L) == (("webp", 100, 150, 1)))
  }

  test("withAudioMeta parses a real RIFF/WAVE header; stubs elsewhere") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // 16-bit stereo 44.1 kHz, 1 second of data (176400 bytes declared)
    val byteRate = 44100 * 2 * 2
    val wav = "RIFF".getBytes ++ le32(36 + 16) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(byteRate) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(byteRate) ++ new Array[Byte](16)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3))).toDF("id", "content")
    val metas = Multimodal.withAudioMeta(df)
      .select("id", "audio_meta.format", "audio_meta.sample_rate", "audio_meta.channels",
        "audio_meta.bits_per_sample", "audio_meta.duration_ms")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(metas(1L) == (("wav", 44100, 2, 16, 1000L)))
    assert(metas(2L)._1 == "audio") // deterministic stub fallback
    assert(Multimodal.withAudioMeta(df).where(col("id") === 2).select("audio_meta").head() ==
      Multimodal.withAudioMeta(df).where(col("id") === 2).select("audio_meta").head())
  }

  test("header parsers never throw on corrupt/truncated payloads") {
    val rnd = new scala.util.Random(42)
    val magics = Seq[Array[Byte]](
      Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "GIF89a".getBytes, "GIF87a".getBytes,
      "RIFF1234WEBPVP8 ".getBytes, "RIFF1234WEBPVP8L".getBytes,
      "RIFF1234WAVEfmt ".getBytes, "RIFFxxxxWEBPVP8X".getBytes)
    val payloads = (0 until 200).map { i =>
      val len = rnd.nextInt(64)
      val junk = Array.fill(len)(rnd.nextInt().toByte)
      if (i % 2 == 0) magics(i % magics.length).take(rnd.nextInt(20)) ++ junk else junk
    } :+ Array.empty[Byte]
    val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "content")
    // every parser path: image meta, audio meta, frame sampling
    assert(Multimodal.withMeta(df).count() == payloads.length)
    assert(Multimodal.withAudioMeta(df).count() == payloads.length)
    assert(Multimodal.frameSample(df, everyN = 3).count() == payloads.length)
  }

  test("resize replaces the payload, partition-preserving (no shuffle)") {
    val out = Multimodal.resize(media, 128, 128)
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
    val b = out.where(col("id") === 1).head().getAs[Array[Byte]]("content")
    assert(b != null && b.length == 128 * 128 / 64)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("frameSample yields an explode-ready frames array") {
    val out = Multimodal.frameSample(media.where(col("id") === 1), everyN = 7)
    val frames = out.select(explode(col("frames"))).count()
    assert(frames >= 1)
  }

  private lazy val osm = Seq(
    ("n", 1L, Map("amenity" -> "cafe")),
    ("w", 2L, Map("highway" -> "primary", "name" -> "Main St")),
    ("w", 3L, Map("highway" -> "footway")),
    ("r", 4L, Map("highway" -> "secondary")),
    ("n", 5L, Map("shop" -> "bakery")))
    .toDF("type", "osm_id", "tags")

  test("OsmFilter: osmium-style specs select by type/key/value") {
    val roads = OsmFilter.tagFilter(osm, Seq("wr/highway=primary,secondary"))
      .select("osm_id").as[Long].collect().toSet
    assert(roads == Set(2L, 4L))

    val anyHighway = OsmFilter.tagFilter(osm, Seq("w/highway"))
      .select("osm_id").as[Long].collect().toSet
    assert(anyHighway == Set(2L, 3L))

    val multi = OsmFilter.tagFilter(osm, Seq("n/amenity", "n/shop"))
      .select("osm_id").as[Long].collect().toSet
    assert(multi == Set(1L, 5L))
  }

  test("OsmFilter: bare key spec applies to all element types") {
    val any = OsmFilter.tagFilter(osm, Seq("highway"))
      .select("osm_id").as[Long].collect().toSet
    assert(any == Set(2L, 3L, 4L))
  }

  test("OsmFilter.tagsToColumns projects tags") {
    val out = OsmFilter.tagsToColumns(osm, Seq("highway", "name"))
    val r = out.where(col("osm_id") === 2).head()
    assert(r.getAs[String]("highway") == "primary" && r.getAs[String]("name") == "Main St")
  }

  // crop fixture: nodes 1-4 (1,2 inside the unit square's [0..2]² area),
  // way 10 = [1, 3] (node 1 inside), way 11 = [3, 4] (none inside),
  // relation 20 = [10, 4] (kept via way 10), relation 21 = [11] (dropped)
  private lazy val cropOsm = {
    val nodes = Seq(
      (1L, 0.5, 0.5), (2L, 1.5, 1.5), (3L, 5.0, 5.0), (4L, 6.0, 6.0))
      .map { case (i, x, y) =>
        ("n", i, Map.empty[String, String], Option(x), Option(y), Option.empty[Seq[Long]]) }
    val ways = Seq((10L, Seq(1L, 3L)), (11L, Seq(3L, 4L)))
      .map { case (i, rs) =>
        ("w", i, Map.empty[String, String], Option.empty[Double], Option.empty[Double], Option(rs)) }
    val rels = Seq((20L, Seq(10L, 4L)), (21L, Seq(11L)))
      .map { case (i, rs) =>
        ("r", i, Map.empty[String, String], Option.empty[Double], Option.empty[Double], Option(rs)) }
    (nodes ++ ways ++ rels).toDF("type", "id", "tags", "lon", "lat", "refs")
  }

  test("OsmFilter.crop: node PIP, way/relation membership cascade") {
    val area = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    val kept = OsmFilter.crop(cropOsm, area)
      .select("type", "id").as[(String, Long)].collect().toSet
    assert(kept == Set(("n", 1L), ("n", 2L), ("w", 10L), ("r", 20L)))
    // a super-relation referencing kept relation 20 survives via the nested
    // round; at relationDepth=1 it would be dropped
    val withSuper = cropOsm.unionByName(Seq(
      ("r", 30L, Map.empty[String, String], Option.empty[Double], Option.empty[Double],
        Option(Seq(20L)))).toDF("type", "id", "tags", "lon", "lat", "refs"))
    val nested = OsmFilter.crop(withSuper, area)
      .select("type", "id").as[(String, Long)].collect().toSet
    assert(nested == kept + (("r", 30L)))
    val shallow = OsmFilter.crop(withSuper, area, relationDepth = 1)
      .select("type", "id").as[(String, Long)].collect().toSet
    assert(shallow == kept)
    // complete_ways keeps every node of a kept way (node 3 rides along)
    val complete = OsmFilter.crop(cropOsm, area, completeWays = true)
      .select("type", "id").as[(String, Long)].collect().toSet
    assert(complete == kept + (("n", 3L)))
  }

  test("OsmFilter.assemble: tagged points, ordered way lines, closed building polygons") {
    import graft.functions.GeoFunctions._
    val rows =
      Seq(("n", 1L, Map("amenity" -> "pub"), Option(0.0), Option(0.0), Option.empty[Seq[Long]]),
        ("n", 2L, Map.empty[String, String], Option(2.0), Option(0.0), Option.empty[Seq[Long]]),
        ("n", 3L, Map.empty[String, String], Option(2.0), Option(3.0), Option.empty[Seq[Long]]),
        ("w", 10L, Map("brand" -> "x"), Option.empty[Double], Option.empty[Double], Option(Seq(1L, 2L, 3L))),
        ("w", 11L, Map("building" -> "yes"), Option.empty[Double], Option.empty[Double], Option(Seq(1L, 2L, 3L, 1L))),
        ("w", 12L, Map("brand" -> "y"), Option.empty[Double], Option.empty[Double], Option(Seq(1L, 99L))))
      .toDF("type", "id", "tags", "lon", "lat", "refs")
    val out = OsmFilter.assemble(rows)
    val byId = out.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[String]("layer"), r.getAs[Array[Byte]]("geometry")))).toMap
    assert(byId.keySet == Set(1L, 10L, 11L)) // node 2,3 untagged; way 12 incomplete
    assert(byId(1L)._1 == "points")
    assert(byId(10L)._1 == "lines")
    assert(byId(11L)._1 == "multipolygons")
    // line follows ref order 1→2→3: planar length 2 + 3
    val lineLen = out.where(col("id") === 10L)
      .select(st_length(col("geometry"))).head().getDouble(0)
    assert(math.abs(lineLen - 5.0) < 1e-12)
    // triangle (0,0)-(2,0)-(2,3): area 3
    val area = out.where(col("id") === 11L)
      .select(st_area(col("geometry"))).head().getDouble(0)
    assert(math.abs(area - 3.0) < 1e-12)
    // keepUntagged admits bare nodes
    assert(OsmFilter.assemble(rows, keepUntagged = true)
      .where(col("layer") === "points").count() == 3)
    // the ini list's key=VALUE tail: a closed highway=platform way is a
    // polygon, a closed highway=primary ring stays a line
    val platforms = rows.where(col("type") === "n").unionByName(Seq(
      ("w", 20L, Map("highway" -> "platform"), Option.empty[Double], Option.empty[Double],
        Option(Seq(1L, 2L, 3L, 1L))),
      ("w", 21L, Map("highway" -> "primary"), Option.empty[Double], Option.empty[Double],
        Option(Seq(1L, 2L, 3L, 1L))))
      .toDF("type", "id", "tags", "lon", "lat", "refs"))
    val layers = OsmFilter.assemble(platforms)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("layer")).toMap
    assert(layers(20L) == "multipolygons" && layers(21L) == "lines")
    // a duplicated node id must not fake completeness or inject vertices
    val dupNode = rows.unionByName(Seq(
      ("n", 2L, Map.empty[String, String], Option(9.0), Option(9.0), Option.empty[Seq[Long]]))
      .toDF("type", "id", "tags", "lon", "lat", "refs"))
    val dOut = OsmFilter.assemble(dupNode)
    assert(dOut.where(col("id") === 12L).count() == 0) // still incomplete
    assert(dOut.where(col("id") === 10L)
      .select(st_npoints(col("geometry"))).head().getInt(0) == 3)
  }

  test("OsmFilter.merge: later extract wins shared (type, id); others union") {
    val patch = cropOsm.where(col("id") === 1)
      .withColumn("tags", map(lit("fixme"), lit("moved")))
      .unionByName(cropOsm.where(col("id") === 4).withColumn("id", lit(99L)))
    val merged = OsmFilter.merge(Seq(cropOsm, patch))
    assert(merged.count() == cropOsm.count() + 1) // 99 added, 1 replaced in place
    assert(merged.where(col("id") === 1).head().getAs[Map[String, String]]("tags")
      == Map("fixme" -> "moved"))
    assert(merged.columns.toSeq == cropOsm.columns.toSeq)
  }

  test("OsmFilter.merge totalTiebreak: within-frame duplicates resolve deterministically") {
    // ONE frame with (type, id) duplicated — osmium's precondition violated.
    // Default merge picks arbitrarily; totalTiebreak must pick the same
    // winner under every partitioning, and equal-content maps with different
    // internal entry order must compare equal (sorted canonical entries)
    val dup = Seq(
      ("n", 1L, Map("b" -> "2", "a" -> "1"), Some(1.0)),
      ("n", 1L, Map("a" -> "1", "b" -> "2"), Some(1.0)), // same content, reordered map
      ("n", 1L, Map("a" -> "1", "c" -> "9"), Some(2.0)), // different content
      ("n", 2L, Map("x" -> "x"), Some(3.0))
    ).toDF("type", "id", "tags", "lon")
    def run(df: org.apache.spark.sql.DataFrame) =
      OsmFilter.merge(Seq(df), totalTiebreak = true)
        .select(col("type"), col("id"), to_json(array_sort(map_entries(col("tags")))).as("t"),
          col("lon"))
        .as[(String, Long, String, Option[Double])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val a = run(dup)
    val b = run(dup.repartition(7))
    val c = run(dup.orderBy(desc("lon")).repartition(3))
    assert(a == b && b == c, s"partitioning-dependent merge: $a vs $b vs $c")
    assert(a.length == 2)
    // id=1 winner is the greatest canonical payload — the c->9 row
    assert(a.head._3.contains("\"key\":\"c\""), s"unexpected winner ${a.head}")
    assert(a.head._4.contains(2.0), s"winner fields not atomic: ${a.head}")
  }
}
