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

  test("typed columns: numeric xlsx/ods columns come back long/double like the CSV twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-t")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/tests/io/data/points.xlsx"),
      dir.resolve("points.xlsx"))
    val xlsx = Xlsx.read(spark, dir.toString)
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv("/root/reference/tests/io/data/points.csv")
    def typesOf(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    val xt = typesOf(xlsx); val ct = typesOf(csv)
    // numeric columns must agree with csv inferSchema; WKT stays string
    assert(xt("WKT") == "string")
    Seq("fid", "number").foreach { c =>
      assert(Set("long", "integer", "double")(xt(c)), s"$c: ${xt(c)}")
      val widen = Map("integer" -> "long") // csv infers int where we use long
      assert(widen.getOrElse(ct(c), ct(c)) == xt(c), s"$c: xlsx ${xt(c)} vs csv ${ct(c)}")
    }
    // values survive the cast
    assert(xlsx.agg(sum("fid")).head().getLong(0)
      == csv.agg(sum("fid")).head().getLong(0))
    // inference is opt-out
    assert(Xlsx.read(spark, dir.toString, inferSchema = false)
      .schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("sheet addressed by user-visible name through workbook.xml") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-s")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/tests/io/data/points.xlsx"),
      dir.resolve("points.xlsx"))
    // Calc names the sheet "points" but stores it as worksheets/sheet1.xml —
    // the name must resolve through workbook.xml + rels
    val byName = Xlsx.read(spark, dir.toString, sheet = Some("points"))
    assert(byName.count() == Xlsx.read(spark, dir.toString).count())
    val err = intercept[IllegalArgumentException] {
      Xlsx.read(spark, dir.toString, sheet = Some("nope"))
    }
    assert(err.getMessage.contains("points"))
    // and through the readAuto :sheet path suffix
    val auto = GeoSources.readAuto(spark, s"$dir/points.xlsx:points")
    assert(auto.count() == byName.count())
  }

  test("inferType: narrowest of long/double/boolean/string") {
    import org.apache.spark.sql.types._
    assert(Xlsx.inferType(Seq("1", "2", null)) == LongType)
    assert(Xlsx.inferType(Seq("1", "2.5")) == DoubleType)
    assert(Xlsx.inferType(Seq("true", "FALSE", "")) == BooleanType)
    assert(Xlsx.inferType(Seq("1", "x")) == StringType)
    assert(Xlsx.inferType(Seq(null, "")) == StringType)
  }
}
