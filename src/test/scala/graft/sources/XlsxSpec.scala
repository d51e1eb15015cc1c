package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GeoFunctions._

class XlsxSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("reads the reference points.ods and agrees with the CSV twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ods")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/tests/io/data/points.ods"),
      dir.resolve("points.ods"))
    val ods = Xlsx.readOds(spark, dir.toString)
      .withColumn("geometry", st_try_geomfromtext(col("WKT")))
    val csv = GeoSources.GeoCSV.read(spark, "/root/reference/tests/io/data/points.csv",
      geometryCol = "WKT")
    assert(ods.where(col("geometry").isNotNull).count()
      == csv.where(col("WKT").isNotNull).count())
    assert(ods.columns.take(2).toSeq == Seq("WKT", "fid"))
  }

  test("reads the reference points.xlsx and agrees with the CSV twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/tests/io/data/points.xlsx"),
      dir.resolve("points.xlsx"))
    val xlsx = Xlsx.read(spark, dir.toString)
      .withColumn("geometry", st_try_geomfromtext(col("WKT")))
    val csv = GeoSources.GeoCSV.read(spark, "/root/reference/tests/io/data/points.csv",
      geometryCol = "WKT")
    assert(xlsx.count() == csv.count())
    def pts(xs: Array[Double]) = xs.map(x => math.rint(x * 1e6) / 1e6).toSet
    assert(pts(xlsx.where(col("geometry").isNotNull)
        .select(st_x(col("geometry"))).as[Double].collect())
      == pts(csv.select(st_x(col("WKT"))).as[Double].collect()))
    assert(xlsx.columns.take(3).toSeq == Seq("WKT", "fid", "number"))
  }
}
