package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GeoFunctions._

class GeoStreamSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  private lazy val zones = Seq(
    (1, "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"),
    (2, "POLYGON ((10 10, 13 10, 13 13, 10 13, 10 10))"))
    .toDF("zid", "wkt")
    .select(col("zid"), st_geomfromtext(col("wkt")).as("geometry"))

  test("stream-static spatial join matches points to zones per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Double, Double)]
    val stream = mem.toDF().toDF("pid", "lon", "lat")
      .select(col("pid"), st_point(col("lon"), col("lat")).as("geometry"))
    val q = GeoStream.sjoinStream(stream, zones)
      .select("pid", "zid")
      .writeStream.format("memory").queryName("geo_join").outputMode("append").start()
    try {
      mem.addData((1, 1.0, 1.0), (2, 11.0, 11.0), (3, 50.0, 50.0))
      q.processAllAvailable()
      mem.addData((4, 2.0, 2.5))
      q.processAllAvailable()
      val got = spark.table("geo_join").as[(Int, Int)].collect().toSet
      assert(got == Set((1, 1), (2, 2), (4, 1))) // 3 matches nothing
    } finally q.stop()
  }

  test("streaming spatial filter keeps only stream columns") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Double, Double)]
    val stream = mem.toDF().toDF("pid", "lon", "lat")
      .select(col("pid"), st_point(col("lon"), col("lat")).as("geometry"))
    val filtered = GeoStream.sfilterStream(stream, zones)
    assert(filtered.columns.toSeq == Seq("pid", "geometry"))
    val q = filtered.select("pid")
      .writeStream.format("memory").queryName("geo_filter").outputMode("append").start()
    try {
      mem.addData((1, 1.0, 1.0), (3, 50.0, 50.0))
      q.processAllAvailable()
      assert(spark.table("geo_filter").as[Int].collect().toSet == Set(1))
    } finally q.stop()
  }
}
