package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The text/vector sketch kernels on the pure-SQL surface:
  * TextFunctions.registerAll must make every kernel callable from
  * `spark.sql(...)` with results identical to the Column API (integer SQL
  * literals cast up to Long seeds, vectors cast to array<double>).
  */
class TextSqlSurfaceSpec extends AnyFunSuite with SparkSpec {
  import testImplicits._

  test("registerAll exposes the sketch kernels to spark.sql with Column-API parity") {
    TextFunctions.registerAll(spark)
    Seq(("the quick brown fox jumps over the lazy dog", 1L))
      .toDF("t", "id").createOrReplaceTempView("sqlsurf")

    val viaSql = spark.sql(
      """SELECT simhash64(t) AS sh, lang_id(t) AS lid,
        |  string_hash64(t, 42) AS h, mix64_hash(id, 7) AS mh,
        |  size(minhash_sig(t, 16, 5)) AS msz,
        |  size(winnow_fps(t, 8, 4)) AS wsz,
        |  vec_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS vc
        |FROM sqlsurf""".stripMargin).head()

    val viaCols = spark.table("sqlsurf").select(
      TextFunctions.simhash64(col("t")).as("sh"),
      TextFunctions.lang_id(col("t")).as("lid"),
      TextFunctions.string_hash64(col("t"), 42L).as("h"),
      TextFunctions.mix64_hash(col("id"), 7L).as("mh"),
      size(TextFunctions.minhash_sig(col("t"), 16, 5)).as("msz"),
      size(TextFunctions.winnow_fps(col("t"), 8, 4)).as("wsz"),
      TextFunctions.vec_cosine(
        array(lit(1.0), lit(0.0)), array(lit(1.0), lit(1.0))).as("vc")).head()

    assert(viaSql == viaCols)
    assert(viaSql.getAs[Long]("sh") != 0L)
    assert(math.abs(viaSql.getAs[Double]("vc") - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("graft.functions.registerAll installs BOTH families in one call") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT st_astext(st_point(3.0, 4.0)) AS wkt,
        |  round(st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0)), 9) AS d,
        |  string_hash64('x', 42) AS h,
        |  st_zorder(0.25, 0.25, 16) AS z""".stripMargin).head()
    assert(r.getAs[String]("wkt") == "POINT (3 4)")
    assert(r.getAs[Double]("d") == 5.0)
    assert(r.getAs[Long]("h") != 0L)
  }

  test("seed arguments accept plain SQL integer literals (cast to long)") {
    TextFunctions.registerAll(spark)
    // would ClassCastException without the Cast-to-Long in the builders
    val r = spark.sql("SELECT mix64_hash(5, 42) AS a, string_hash64('x', 42) AS b").head()
    assert(r.getAs[Long]("a") == graft.functions.TextKernel.mix64(5L ^ 42L))
  }
}
