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
}
