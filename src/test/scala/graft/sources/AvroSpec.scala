package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AvroSpec extends AnyFunSuite with SparkSpec {
  import testImplicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_avro_$name").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  test("roundtrip: primitives, binary, timestamp micros, nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 7, 1.5f, 2.25, true, "héllo", Array[Byte](1, 2, -3), ts),
      Row(2L, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("prim")
    Avro.write(df, s"$dir/t.avro")
    val back = Avro.read(spark, s"$dir/t.avro")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val m = back.collect().map(r => r.getLong(0) -> r).toMap
    val r1 = m(1L)
    assert(r1.getInt(1) == 7 && r1.getFloat(2) == 1.5f && r1.getDouble(3) == 2.25)
    assert(r1.getBoolean(4) && r1.getString(5) == "héllo")
    assert(r1.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, -3))
    // timestamp survives at MICROsecond precision through the logical type
    assert(r1.getTimestamp(7) == ts)
    val r2 = m(2L)
    (1 to 7).foreach(i => assert(r2.isNullAt(i), s"field $i should be null"))
  }

  test("roundtrip: arrays, maps, nested structs") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("kv", MapType(StringType, LongType, valueContainsNull = false), nullable = true),
      StructField("sub", StructType(Seq(
        StructField("a", StringType, nullable = true),
        StructField("b", IntegerType, nullable = false))), nullable = true)))
    val rows = Seq(
      Row(1L, Seq(1.0, 2.5), Map("x" -> 1L, "y" -> 2L), Row("in", 9)),
      Row(2L, Seq.empty[Double], Map.empty[String, Long], null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp("nested")
    Avro.write(df, s"$dir/t.avro")
    val back = Avro.read(spark, s"$dir/t.avro").collect().map(r => r.getLong(0) -> r).toMap
    assert(back(1L).getSeq[Double](1) == Seq(1.0, 2.5))
    assert(back(1L).getMap[String, Long](2) == Map("x" -> 1L, "y" -> 2L))
    assert(back(1L).getStruct(3) == Row("in", 9))
    assert(back(2L).getSeq[Double](1).isEmpty && back(2L).getMap[String, Long](2).isEmpty)
    assert(back(2L).isNullAt(3))
  }

  test("splittable read: small splitBytes fans one file out without dup/loss") {
    val df = spark.range(20000).select(col("id"),
      concat(lit("row-"), col("id")).as("s"))
    val dir = tmp("split")
    Avro.write(df.repartition(1), s"$dir/t.avro", codec = "null")
    val one = new java.io.File(s"$dir/t.avro").listFiles().filter(_.getName.endsWith(".avro"))
    assert(one.length == 1, "expected a single container file")
    // ~tens of sync blocks: 4 KB ranges must partition them exactly
    val back = Avro.read(spark, s"$dir/t.avro", splitBytes = 4096)
    assert(back.rdd.getNumPartitions > 4, "expected many byte-range tasks")
    assert(back.count() == 20000)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 20000L).sum)
  }

  test("codecs: null, deflate and snappy all roundtrip; deflate shrinks") {
    val df = spark.range(5000).select(col("id"),
      lit("abcabcabcabcabcabcabcabc").as("pad"))
    def sizeOf(codec: String): Long = {
      val dir = tmp(s"codec_$codec")
      Avro.write(df.repartition(1), s"$dir/t.avro", codec = codec)
      assert(Avro.read(spark, s"$dir/t.avro").count() == 5000)
      new java.io.File(s"$dir/t.avro").listFiles()
        .filter(_.getName.endsWith(".avro")).map(_.length()).sum
    }
    val (raw, defl, snap) = (sizeOf("null"), sizeOf("deflate"), sizeOf("snappy"))
    assert(defl < raw / 2, s"deflate $defl vs raw $raw")
    assert(snap < raw, s"snappy $snap vs raw $raw")
  }

  test("empty frame writes a header-only shard that reads back with schema") {
    val df = spark.range(0).select(col("id"), lit("x").as("s"))
    val dir = tmp("empty")
    Avro.write(df.where(lit(false)), s"$dir/t.avro")
    val back = Avro.read(spark, s"$dir/t.avro")
    assert(back.columns.toSeq == Seq("id", "s"))
    assert(back.count() == 0)
  }

  test("auto dispatch: .avro path routes through readAuto/writeAuto with WKB geometry") {
    import graft.functions.GeoFunctions._
    val pts = Seq((1L, 2.5, 3.5), (2L, -10.0, 45.0)).toDF("id", "lon", "lat")
      .withColumn("geometry", st_point(col("lon"), col("lat"))).drop("lon", "lat")
    val dir = tmp("auto")
    GeoSources.writeAuto(pts, s"$dir/pts.avro")
    val back = GeoSources.readAuto(spark, s"$dir/pts.avro")
      .select(col("id"), st_x(col("geometry")).as("x"), st_y(col("geometry")).as("y"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(back(1L) == ((2.5, 3.5)) && back(2L) == ((-10.0, 45.0)))
  }
}
