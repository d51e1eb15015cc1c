package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ClusteringSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  /** Brute-force DBSCAN with the same deterministic conventions: closed
    * eps-ball, self counts, component = min core id, border joins the min
    * component among core neighbors, noise = -1.
    */
  private def brute(rows: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
      : Map[Long, (Boolean, Long)] = {
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = rows.map(a => a._1 -> rows.filter(b => d2(a, b) <= eps * eps)).toMap
    val core = rows.filter(a => nbrs(a._1).size >= minPts).map(_._1).toSet
    val parent = scala.collection.mutable.Map(core.toSeq.map(k => k -> k): _*)
    def find(a: Long): Long = { var x = a; while (parent(x) != x) x = parent(x); x }
    for (a <- rows if core(a._1); b <- nbrs(a._1) if core(b._1)) {
      val (ra, rb) = (find(a._1), find(b._1)); if (ra != rb) parent(ra) = rb
    }
    val comp = core.groupBy(find).flatMap { case (_, ms) => ms.map(_ -> ms.min) }
    rows.map { a =>
      if (core(a._1)) a._1 -> ((true, comp(a._1)))
      else {
        val cn = nbrs(a._1).map(_._1).filter(core)
        a._1 -> ((false, if (cn.isEmpty) -1L else cn.map(comp).min))
      }
    }.toMap
  }

  private def run(rows: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
      : Map[Long, (Boolean, Long)] =
    Clustering.dbscan(rows.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .select("id", "is_core", "cluster").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("dbscan: two clusters, a border point, and noise (closed form)") {
    val rows = Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5),   // cluster A cores
      (4L, 1.3, 0.0),                                    // border of A (near 2)
      (10L, 10.0, 10.0), (11L, 10.5, 10.0), (12L, 10.0, 10.5), // cluster B cores
      (20L, 50.0, 50.0))                                 // noise
    val out = run(rows, eps = 1.0, minPts = 3)
    assert(out(1L) == ((true, 1L)) && out(2L) == ((true, 1L)) && out(3L) == ((true, 1L)))
    assert(out(4L) == ((false, 1L)))  // within eps of core 2, not core itself
    assert(out(10L) == ((true, 10L)) && out(11L) == ((true, 10L)) && out(12L) == ((true, 10L)))
    assert(out(20L) == ((false, -1L)))
  }

  test("dbscan matches brute force on jittered random points") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(220)(i =>
      (i.toLong, rnd.nextDouble() * 20, rnd.nextDouble() * 20))
    for ((eps, mp) <- Seq((1.0, 3), (1.5, 4), (0.7, 2)))
      assert(run(rows, eps, mp) == brute(rows, eps, mp), s"eps=$eps minPts=$mp")
  }

  test("dbscan: minPts=1 makes every point a singleton-or-better core") {
    val rows = Seq((1L, 0.0, 0.0), (2L, 100.0, 100.0))
    val out = run(rows, 1.0, 1)
    assert(out == Map(1L -> ((true, 1L)), 2L -> ((true, 2L))))
  }

  test("dbscan: cross-cell pairs are found (points straddling a cell edge)") {
    // 0.99 apart, cells differ at eps=1.0 — the 3x3 neighbor explode must pair them
    val rows = Seq((1L, 0.995, 0.0), (2L, 1.985, 0.0), (3L, 0.005, 0.0))
    val out = run(rows, 1.0, 2)
    assert(out(1L)._1 && out(2L)._1 && out(3L)._1)
    assert(out.values.map(_._2).toSet == Set(1L)) // one chain-connected cluster
  }

  test("dbscan: null coordinates land in noise, not exceptions") {
    val df = Seq((1L, Some(0.0), Some(0.0)), (2L, Some(0.1), Some(0.0)),
      (3L, None: Option[Double], Some(1.0))).toDF("id", "x", "y")
    val out = Clustering.dbscan(df, "id", "x", "y", 1.0, 2)
      .select("id", "is_core", "cluster").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((true, 1L)) && out(2L) == ((true, 1L)))
    assert(out(3L) == ((false, -1L)))
  }

  test("dbscan: string ids fail loudly; hashed string ids work") {
    val df = Seq(("a", 0.0, 0.0), ("b", 0.1, 0.0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Clustering.dbscan(df, "id", "x", "y", 1.0, 2)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // the documented escape hatch: hash the string key to a long first
    val hashed = df.withColumn("hid", xxhash64(col("id")))
    val out = Clustering.dbscan(hashed, "hid", "x", "y", 1.0, 2)
      .select("cluster").as[Long].collect()
    assert(out.length == 2 && out.distinct.length == 1 && out.head != -1L)
  }

  test("kmeans: string ids fail loudly too (init ordering would hash nulls)") {
    val df = Seq(("a", Seq(0.0, 0.0)), ("b", Seq(1.0, 1.0))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeans(df, "v", "id", k = 2, iters = 1)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    val hashed = df.withColumn("hid", xxhash64(col("id")))
    assert(Clustering.kmeans(hashed, "v", "hid", k = 2, iters = 1).count() == 2)
  }

  test("dbscan plans hash joins only — no cartesian, no BNLJ") {
    val df = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0)).toDF("id", "x", "y")
    val plan = Clustering.dbscan(df, "id", "x", "y", 1.0, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("kmeans: two separated blobs resolve to two pure clusters") {
    val pts = (0 until 40).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 0.0 else 100.0
      (i.toLong, Seq(base + (i % 7) * 0.1, base - (i % 5) * 0.1))
    }
    val df = pts.toDF("id", "vec")
    val out = Clustering.kmeans(df, "vec", "id", k = 2, iters = 3)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    val byBlob = pts.map(_._1).groupBy(id => id % 2).map { case (b, ids) =>
      b -> ids.map(out).toSet
    }
    assert(byBlob(0L).size == 1 && byBlob(1L).size == 1, s"mixed clusters: $byBlob")
    assert(byBlob(0L) != byBlob(1L))
    // distances to the blob mean are tiny relative to the blob separation
    val d2 = Clustering.kmeans(df, "vec", "id", k = 2, iters = 3)
      .agg(max("dist2_6")).head().getDouble(0)
    assert(d2 < 1.0, s"max within-cluster dist2 $d2")
  }

  test("assignClusters is a pure projection — no exchange, no join") {
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0))).toDF("id", "vec")
    val plan = Clustering.assignClusters(df, "vec", Array(Array(0.0, 0.0), Array(2.0, 2.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignClusters shuffled:\n$plan")
    assert(!plan.contains("Join"), s"assignClusters joined:\n$plan")
  }

  test("kmeans model scores a STREAM: assignClusters parity with batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val pts = (0 until 30).map { i =>
      val base = if (i % 2 == 0) 0.0 else 50.0
      (i.toLong, Seq(base + (i % 3) * 0.1, base + (i % 5) * 0.1))
    }
    val df = pts.toDF("id", "vec")
    val cents = Clustering.kmeansCentroids(df, "vec", "id", k = 2, iters = 2)
    val batch = Clustering.kmeans(df, "vec", "id", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = Clustering.assignClusters(mem.toDF().toDF("id", "vec"), "vec", cents)
      .select("id", "cluster", "dist2_6")
      .writeStream.format("memory").queryName("km_stream").outputMode("append").start()
    try {
      mem.addData(pts: _*)
      q.processAllAvailable()
      val streamed = spark.table("km_stream")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("kmeans: deterministic across partitioning; empty clusters keep centroids") {
    val pts = (0 until 60).map(i => (i.toLong, Seq((i % 9) * 1.0, (i % 4) * 1.0)))
    val a = Clustering.kmeans(pts.toDF("id", "vec"), "vec", "id", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val b = Clustering.kmeans(pts.toDF("id", "vec").repartition(7), "vec", "id",
        k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // k larger than the number of DISTINCT points: some cluster never wins
    // a point; its centroid must survive the update untouched (no NPE, no
    // shrunken k) and the populated clusters still partition the data
    val tiny = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(9.0, 9.0)))
    val out = Clustering.kmeans(tiny.toDF("id", "vec"), "vec", "id", k = 3, iters = 2)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(out(1L) == out(2L) && out(1L) != out(3L))
  }
}
