package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GeoFunctions._

class GpkgSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  private val data = "/root/reference/tests/io/data"

  private def stage(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-gpkg")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$data/$name"), dir.resolve(name))
    dir.toString
  }

  test("reads the reference points.gpkg and agrees with the CSV twin") {
    val gpkg = Gpkg.read(spark, stage("points.gpkg"))
    val csv = GeoSources.GeoCSV.read(spark, s"$data/points.csv", geometryCol = "WKT")
    assert(gpkg.count() == csv.count())
    def rounded(xs: Array[Double]) = xs.map(x => math.rint(x * 1e6) / 1e6).toSet
    val gPts = rounded(gpkg.select(st_x(col("geom"))).as[Double].collect())
    val cPts = rounded(csv.select(st_x(col("WKT"))).as[Double].collect())
    assert(gPts == cPts)
    // rowid-alias fid is materialized
    assert(gpkg.select("fid").as[Long].collect().toSet == (1L to gpkg.count()).toSet)
  }

  test("parseColumns keeps full declarations; rowid alias is INTEGER PRIMARY KEY only") {
    val cols = Gpkg.parseColumns(
      """CREATE TABLE "t" ("rank" INTEGER, "fid" INTEGER PRIMARY KEY AUTOINCREMENT,
        | "geom" POINT, "name" TEXT NOT NULL, CHECK (rank > 0))""".stripMargin)
    assert(cols.map(_._1) == Seq("rank", "fid", "geom", "name"))
    // a plain nullable INTEGER column before the fid must NOT be taken for the
    // rowid alias (its NULLs would silently be back-filled with the rowid)
    assert(cols.indexWhere(_._2.contains("INTEGER PRIMARY KEY")) == 1)
    assert(cols(0)._2 == "INTEGER")
  }

  test("reads lines.gpkg geometries with correct lengths") {
    val gpkg = Gpkg.read(spark, stage("lines.gpkg"))
    val csv = GeoSources.GeoCSV.read(spark, s"$data/lines.csv", geometryCol = "WKT")
    val gl = gpkg.select(st_length(col("geom"))).as[Double].collect().sorted
    val cl = csv.select(st_length(col("WKT"))).as[Double].collect().sorted
    assert(gl.length == cl.length)
    gl.zip(cl).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
  }

  test("multi-layer gpkg: layers listed, explicit selection required") {
    val dir = stage("multiple-layers.gpkg")
    val names = Gpkg.layers(spark, dir)
    assert(names.size > 1)
    intercept[IllegalArgumentException](Gpkg.read(spark, dir).count())
    val one = Gpkg.read(spark, dir, layer = Some(names.head))
    assert(one.count() > 0)
  }

  test("multi-page table with overflow records: 3000 rows, interior b-tree pages") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkg-big")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("src/test/resources/big.gpkg"), dir.resolve("big.gpkg"))
    val df = Gpkg.read(spark, dir.toString)
    assert(df.count() == 3000)
    assert(df.select("fid").as[Long].collect().toSet == (1L to 3000L).toSet)
    // overflow-page texts come back intact
    val long = df.where(col("fid") === 500).select("name").as[String].head()
    assert(long.startsWith("row-00500-") && long.length > 2000)
    // values and geometry decode across all pages
    assert(df.agg(sum("val")).head().getDouble(0) == (1 to 3000).map(_ * 0.5).sum)
    val x = df.where(col("fid") === 101).select(st_x(col("geom"))).head().getDouble(0)
    assert(x == 1.5)
  }

  test("polygons.gpkg parses areal geometries") {
    val gpkg = Gpkg.read(spark, stage("polygons.gpkg"))
    val areas = gpkg.select(st_area(gpkg.columns.filter(c =>
      gpkg.schema(c).dataType.typeName == "binary").headOption.map(col)
      .getOrElse(col("geom")))).as[Double].collect()
    assert(areas.nonEmpty && areas.forall(_ > 0))
  }
}
