package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SketchSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("hllDistinct tracks true cardinality within ~5% across magnitudes") {
    for (n <- Seq(100, 2000, 50000)) {
      val ids = spark.range(0, n).select((col("id") * 7 + 3).as("v"))
      val est = Sketch.hllDistinct(ids, Seq("v")).select("approx_distinct")
        .as[Double].head()
      assert(math.abs(est - n) / n < 0.05, s"n=$n est=$est")
    }
  }

  test("string columns hash through the polynomial fold") {
    val docs = (1 to 3000).map(i => s"document number $i").toDF("t")
    val est = Sketch.hllDistinct(docs, Seq("t")).select("approx_distinct").as[Double].head()
    assert(math.abs(est - 3000) / 3000 < 0.05, s"est=$est")
  }

  test("estimate is independent of partitioning and duplication") {
    val base = spark.range(0, 5000).select(col("id").as("v"))
    val e1 = Sketch.hllDistinct(base.repartition(3), Seq("v")).select("approx_distinct").as[Double].head()
    val e2 = Sketch.hllDistinct(base.repartition(31), Seq("v")).select("approx_distinct").as[Double].head()
    val e3 = Sketch.hllDistinct(base.unionAll(base).unionAll(base), Seq("v"))
      .select("approx_distinct").as[Double].head()
    assert(e1 == e2 && e2 == e3) // registers are set-determined, sum is exact integer math
  }

  test("registers merge: union of halves == whole") {
    val all = spark.range(0, 8000).select(col("id").as("v"))
    val lo = all.where(col("v") < 3000)
    val hi = all.where(col("v") >= 3000)
    val merged = Sketch.hllEstimate(
      Sketch.hllMerge(Sketch.hllRegisters(lo, "v"), Sketch.hllRegisters(hi, "v")))
      .select("approx_distinct").as[Double].head()
    val whole = Sketch.hllEstimate(Sketch.hllRegisters(all, "v"))
      .select("approx_distinct").as[Double].head()
    assert(merged == whole)
  }

  test("register table is bounded by 2^p and nulls are ignored") {
    val withNulls = spark.range(0, 100000)
      .select(when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).cast("long").as("v"))
    val regs = Sketch.hllRegisters(withNulls, "v", p = 8)
    assert(regs.count() <= 256)
    val est = Sketch.hllEstimate(regs, p = 8).select("approx_distinct").as[Double].head()
    assert(math.abs(est - 90000) / 90000 < 0.15) // p=8 → σ ≈ 6.5%
  }

  test("empty input estimates 0; small input takes the linear-counting branch") {
    val empty = Seq.empty[Long].toDF("v")
    assert(Sketch.hllDistinct(empty, Seq("v")).select("approx_distinct").as[Double].head() == 0.0)
    val tiny = (1L to 5L).toDF("v")
    val est = Sketch.hllDistinct(tiny, Seq("v")).select("approx_distinct").as[Double].head()
    assert(math.abs(est - 5.0) < 0.01) // m·ln(m/V) ≈ exact at tiny cardinality
  }
}
