package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllSpec extends SparkSpec {
  import testImplicits._

  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val target = math.max(1L, math.ceil(q * s.length).toLong)
    s((target - 1).toInt)
  }

  test("exact mode (k >= n) reproduces the discrete lower quantile") {
    val xs = (1 to 1000).map(i => ((i * 7919) % 1000).toDouble)
    val df = xs.toDF("v")
    val out = Kll.kllQuantiles(df, "v", k = 2048, qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      assert(out(q) === exactQ(xs, q), s"q=$q")
  }

  test("compacted mode stays within additive rank error at k=256, n=100k") {
    val n = 100000
    val xs = (0 until n).map(i => ((i.toLong * 48271) % 99991).toDouble)
    val df = spark.range(n).select((col("id") * 48271L % 99991L).cast("double").as("v"))
      .repartition(8)
    val out = Kll.kllQuantiles(df, "v", k = 256, qs = Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = out(q)
      // rank of the estimate in the true data; KLL guide error for this
      // shape is a few /k — assert a loose 5% bound, typically ~1%
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) < 0.05, s"q=$q est=$est rank=$rank")
    }
  }

  test("merged per-shard sketches agree with the single-pass sketch (exact mode)") {
    val xs = (1 to 5000).map(i => ((i * 104729) % 5000).toDouble)
    val df = xs.toDF("v").withColumn("shard", (col("v") % 7).cast("int"))
    val sketches = Kll.kllSketches(df, "v", Seq("shard"), k = 8192)
    assert(sketches.count() === 7)
    val merged = sketches.agg(Kll.mergeQuantilesAgg(col("kll"), Seq(0.5, 0.99)).as("qv"))
      .select(posexplode(col("qv"))).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(merged(0) === exactQ(xs, 0.5))
    assert(merged(1) === exactQ(xs, 0.99))
  }

  test("serialization roundtrip preserves the sketch") {
    val buf = new Kll.Buf(64)
    (1 to 1000).foreach(i => buf.insert(((i * 31) % 997).toDouble))
    val back = Kll.deserialize(buf.serialize())
    assert(back.k === buf.k)
    assert(back.levels.map(_.toList) === buf.levels.map(_.toList))
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(Kll.quantile(back, q) === Kll.quantile(buf, q))
  }

  test("compaction conserves total weight exactly") {
    val buf = new Kll.Buf(33) // odd capacity forces odd-length compactions
    val n = 12345
    (1 to n).foreach(i => buf.insert(((i * 7) % 1000).toDouble))
    val weight = buf.levels.zipWithIndex.map { case (lv, l) => lv.length.toLong << l }.sum
    assert(weight === n.toLong)
  }

  test("nulls are ignored; empty input yields no rows") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val out = Kll.kllQuantiles(df, "v", k = 64, qs = Seq(1.0)).collect()
    assert(out.length === 1 && out(0).getDouble(1) === 3.0)
    val empty = Kll.kllQuantiles(Seq.empty[Double].toDF("v"), "v", k = 64, qs = Seq(0.5))
    assert(empty.collect().isEmpty)
  }
}
