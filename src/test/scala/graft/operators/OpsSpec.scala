package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OpsSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("splitByHash: deterministic, complete, proportions near weights") {
    val df = spark.range(0, 20000).toDF("id")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Ops.splitByHash(df, "id", weights)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 20000)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01)
    // stable across runs and partitionings
    val again = Ops.splitByHash(df.repartition(7), "id", weights)
      .select("id", "split").as[(Long, String)].collect().toMap
    val first = out.select("id", "split").as[(Long, String)].collect().toMap
    assert(first == again)
    // different seed shuffles membership
    val reseeded = Ops.splitByHash(df, "id", weights, seed = 7L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(first != reseeded)
    // no shuffle: pure projection
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("splitByHash rejects weights that do not sum to 1") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Ops.splitByHash(df, "id", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }
}
