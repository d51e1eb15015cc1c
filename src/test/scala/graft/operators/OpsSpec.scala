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

  test("splitByCluster: near-dup pairs can never straddle a split boundary") {
    // 3 planted near-dup families (long shared text, one token changed) +
    // singletons; enough distinct singleton ids that every split label
    // appears somewhere
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val fams = for (f <- 0 until 3; m <- 0 until 4)
      yield (f * 100L + m, base + s"family $f member tail token$m")
    val singles = (1000L until 1200L).map(i => (i, s"unique standalone text $i " * 10 + i.toString))
    val df = (fams ++ singles).toDF("doc_id", "text")
    val out = Ops.splitByCluster(df, "text", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.6)
    // every row labeled, all rows survive
    assert(out.count() === df.count())
    // each family resolves to ONE cluster and ONE split label
    val famSides = out.where($"doc_id" < 1000L)
      .groupBy(($"doc_id" / 100).cast("int").as("fam"))
      .agg(countDistinct($"cluster").as("nc"), countDistinct($"split").as("ns"))
      .as[(Int, Long, Long)].collect()
    assert(famSides.length === 3 && famSides.forall { case (_, nc, ns) => nc == 1L && ns == 1L })
    // determinism across partitionings
    val again = Ops.splitByCluster(df.repartition(7), "text", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.6)
      .select("doc_id", "cluster", "split").as[(Long, Long, String)].collect().toSet
    assert(again === out.select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect().toSet)
  }

  test("windowFunnel: anchor maximality, window expiry, strict ordering") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val rows = Seq(
      // u1: early A stalls (B only at 15 > 0+10); later A@12 completes
      // A->B->C — maximal over anchors must report level 3
      (1L, "A", ts(0)), (1L, "A", ts(12)), (1L, "B", ts(15)), (1L, "C", ts(16)),
      // u2: A->B inside window, C outside (A@0, B@3, C@11 > 0+10) — level 2
      (2L, "A", ts(0)), (2L, "B", ts(3)), (2L, "C", ts(11)),
      // u3: B before A never counts; A alone — level 1
      (3L, "B", ts(0)), (3L, "A", ts(5)),
      // u4: same-timestamp B does NOT satisfy strict increase; later B does
      (4L, "A", ts(0)), (4L, "B", ts(0)), (4L, "B", ts(2)), (4L, "C", ts(4)),
      // u5: two complete chains -> n_complete 2
      (5L, "A", ts(0)), (5L, "B", ts(1)), (5L, "C", ts(2)),
      (5L, "A", ts(100)), (5L, "B", ts(101)), (5L, "C", ts(102)),
      // u6: no A at all -> absent from output
      (6L, "B", ts(0)), (6L, "C", ts(1)),
      // u7: only a same-timestamp B exists — strict increase rejects it
      (7L, "A", ts(5)), (7L, "B", ts(5)), (7L, "C", ts(6)))
      .toDF("user_id", "event_type", "ts")
    val got = Ops.windowFunnel(rows, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), windowSeconds = 10.0)
      .select("user_id", "funnel_level", "n_complete")
      .as[(Long, Int, Long)].collect()
      .map { case (u, l, n) => u -> ((l, n)) }.toMap
    assert(got(1L) === ((3, 1)))
    assert(got(2L) === ((2, 0)))
    assert(got(3L) === ((1, 0)))
    assert(got(4L) === ((3, 1)))
    assert(got(5L) === ((3, 2)))
    assert(!got.contains(6L))
    assert(got(7L) === ((1, 0)))
    assert(got.size === 6)
  }

  test("retentionCohorts: exact matrix on a hand-built cohort layout") {
    import java.sql.Timestamp
    val week = 604800L
    def ts(w: Long, s: Long = 0L) = new Timestamp((w * week + s) * 1000L)
    val rows = Seq(
      (1L, ts(0)), (1L, ts(0, 3600)), (1L, ts(1)), (1L, ts(3)), // dup week 0 collapses
      (2L, ts(0)),
      (3L, ts(1)), (3L, ts(2)),
      (4L, ts(0)), (4L, ts(12))) // offset 12 > maxOffset drops
      .toDF("user_id", "ts")
    val got = Ops.retentionCohorts(rows, "user_id", "ts", week, maxOffset = 8)
      .select("cohort", "offset", "n_active", "n_cohort")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 3L, 3L), (0L, 1L, 1L, 3L), (0L, 3L, 1L, 3L),
      (1L, 0L, 1L, 1L), (1L, 1L, 1L, 1L)))
    val rates = Ops.retentionCohorts(rows, "user_id", "ts", week, maxOffset = 8)
      .where($"cohort" === 0L && $"offset" === 1L)
      .select("retention").as[Double].head()
    assert(math.abs(rates - 1.0 / 3.0) < 1e-12)
  }

  test("quantileGate keeps each group's top fraction independently") {
    // group A is uniformly "weak" (0..199), group B uniformly "strong"
    // (1000..1199): a global threshold at q=0.3 would keep all of B and
    // drop most of A; the per-group gate must keep ~70% of EACH
    val df = ((0 until 200).map(i => ("a", i.toDouble)) ++
      (0 until 200).map(i => ("b", 1000.0 + i))).toDF("g", "v")
    val out = Ops.quantileGate(df, "v", Seq("g"), q = 0.3, bins = 64)
    val kept = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("a") - 140L) <= 6, s"kept $kept")
    assert(math.abs(kept("b") - 140L) <= 6, s"kept $kept")
    // every survivor clears its own group's threshold, not the other's
    val minA = out.where($"g" === "a").agg(min("v")).as[Double].head()
    val minB = out.where($"g" === "b").agg(min("v")).as[Double].head()
    assert(minA < 200 && minA > 30 && minB >= 1030)
    // nulls drop
    val withNull = df.unionByName(Seq(("a", null.asInstanceOf[java.lang.Double]))
      .toDF("g", "v"))
    assert(Ops.quantileGate(withNull, "v", Seq("g"), q = 0.3, bins = 64)
      .where($"v".isNull).count() === 0L)
  }

  test("lookup: first match by orderBy, atomically — ties never stitch rows") {
    val left = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "payload")
    val right = Seq(
      (1, 5, 1, 9), // k=1: two rows TIED on orderBy, per-column minimums cross
      (1, 5, 9, 1),
      (2, 2, 7, 7), // k=2: smaller orderBy wins over
      (2, 8, 6, 6))
      .toDF("rk", "o", "a", "b")
    val out = Ops.lookup(left, right, columns = Seq("a", "b"),
      leftOn = "k", rightOn = "rk", orderBy = "o")
    assert(out.columns.toSeq == Seq("k", "payload", "a", "b"))
    val m = out.collect().map(r => r.getInt(0) -> (r.get(2), r.get(3))).toMap
    assert(m(1) == ((1, 9)) || m(1) == ((9, 1))) // one REAL row, never (1, 1)
    assert(m(2) == ((7, 7)))                     // min orderBy wins
    assert(m(3) == ((null, null)))               // unmatched left row kept
  }

  test("splitByHash rejects weights that do not sum to 1") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Ops.splitByHash(df, "id", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("mixByHash: proportions, scarcest label kept whole, deterministic") {
    // skewed supply: a=6000, b=3000, c=1000; target 1:1:2 → c is scarcest
    // (1000/0.5=2000=T), so keep all of c, 500 of a, 500 of b (±hash noise)
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("label",
        when(col("id") < 6000, "a").when(col("id") < 9000, "b").otherwise("c"))
    val out = Ops.mixByHash(df, "label", "id",
      Seq("a" -> 0.25, "b" -> 0.25, "c" -> 0.5))
    val counts = out.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(counts("c") == 1000L) // rate 1.0: kept whole
    assert(math.abs(counts("a") - 500.0) / 500.0 < 0.15)
    assert(math.abs(counts("b") - 500.0) / 500.0 < 0.15)
    // stable across partitionings
    val again = Ops.mixByHash(df.repartition(7), "label", "id",
      Seq("a" -> 0.25, "b" -> 0.25, "c" -> 0.5)).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // labels outside the target mix drop entirely
    val noC = Ops.mixByHash(df, "label", "id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(noC.where(col("label") === "c").count() == 0)
    // the kept subset of a label is a subset of its rows (pure filter)
    assert(out.where(col("label") === "a").count() == counts("a"))
  }

  test("temperatureMix: alpha flattens the head, smallest label kept whole") {
    // counts: a=6400, b=400 → alpha=0.5 shares 80:20; scale binds at b
    // (400/20=20), so b keeps all 400 and a keeps 80·20/6400 = 1/4 of itself
    val df = spark.range(0, 6800).toDF("id")
      .withColumn("label", when(col("id") < 6400, "a").otherwise("b"))
    val out = Ops.temperatureMix(df, "label", "id", alpha = 0.5)
    val counts = out.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(counts("b") == 400L, s"smallest label must survive whole: $counts")
    assert(math.abs(counts("a") - 1600.0) / 1600.0 < 0.1, s"a kept ${counts("a")}, want ~1600")
    // alpha = 1 is pass-through: shares equal the counts, every rate is 1
    assert(Ops.temperatureMix(df, "label", "id", alpha = 1.0).count() == 6800L)
    // deterministic across partitioning
    val again = Ops.temperatureMix(df.repartition(5), "label", "id", alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // lower temperature (smaller alpha) downsamples the head harder
    val flat = Ops.temperatureMix(df, "label", "id", alpha = 0.25)
      .groupBy("label").count().as[(String, Long)].collect().toMap
    assert(flat("a") < counts("a") && flat("b") == 400L)
    // null labels drop; maxLabels guard fails loudly
    assert(Ops.temperatureMix(df.withColumn("label",
      when(col("id") === 0, lit(null)).otherwise(col("label"))),
      "label", "id", alpha = 0.5).where(col("label").isNull).count() == 0)
    intercept[IllegalArgumentException] {
      Ops.temperatureMix(df.withColumn("label", col("id").cast("string")),
        "label", "id", alpha = 0.5, maxLabels = 10)
    }
  }

  test("temperatureMix data pass is a pure filter — no data shuffle") {
    val df = spark.range(0, 100).toDF("id").withColumn("label", lit("a"))
    val plan = Ops.temperatureMix(df, "label", "id", alpha = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"temperatureMix shuffled the data pass:\n$plan")
    assert(!plan.contains("Join"), s"temperatureMix joined the data pass:\n$plan")
  }

  test("mixByHash data pass is a pure filter — no data shuffle") {
    val df = spark.range(0, 100).toDF("id").withColumn("label", lit("a"))
    val out = Ops.mixByHash(df, "label", "id", Seq("a" -> 1.0))
    assert(out.count() == 100) // rate 1.0 keeps everything
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sampleStratified: per-label rates, nesting, shuffle-free") {
    val df = spark.range(0, 10000)
      .select(col("id"), (when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c")).as("label"))
    val s1 = Ops.sampleStratified(df, "label", "id", Seq("a" -> 0.5, "b" -> 0.1))
    val byLabel = s1.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLabel("a") - 3334 * 0.5) / (3334 * 0.5) < 0.1)
    assert(math.abs(byLabel("b") - 3333 * 0.1) / (3333 * 0.1) < 0.2)
    assert(!byLabel.contains("c")) // defaultFraction 0 drops unlisted labels
    // monotone nesting: the 10% sample of a label ⊆ its 50% sample
    val s2 = Ops.sampleStratified(df, "label", "id", Seq("a" -> 0.1))
      .select("id").as[Long].collect().toSet
    val s1a = s1.where(col("label") === "a").select("id").as[Long].collect().toSet
    assert(s2.subsetOf(s1a))
    // determinism + pure filter (no exchange in the plan)
    val again = Ops.sampleStratified(df.repartition(7), "label", "id",
      Seq("a" -> 0.5, "b" -> 0.1)).select("id").as[Long].collect().toSet
    assert(again == s1.select("id").as[Long].collect().toSet)
    assert(!Ops.sampleStratified(df, "label", "id", Seq("a" -> 0.5))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("topKPerGroup: deterministic heads, WindowGroupLimit pushdown in plan") {
    val df = spark.range(0, 9000).select(col("id"),
      (col("id") % 9).as("grp"), (col("id") % 97).as("score"))
    val out = Ops.topKPerGroup(df, Seq("grp"), "score", k = 3, tieCol = "id")
    val rows = out.select("grp", "score", "rank_in_group", "id")
      .as[(Long, Long, Int, Long)].collect()
    assert(rows.length == 27) // 3 per group
    assert(rows.forall(_._2 >= 90)) // scores 0..96, top-3 per group are ≥ 90
    // ties broken by id: rank 1 carries the smallest id of the best score
    val g0 = rows.filter(r => r._1 == 0 && r._3 == 1)
    assert(g0.length == 1)
    // the rank filter must be pushed below the exchange as a group limit
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("shuffleShard: a reproducible permutation — complete, dense, stable") {
    val df = spark.range(0, 5000).select(col("id"))
    val out = Ops.shuffleShard(df, "id", shards = 8)
      .select("id", "shard", "shard_pos")
      .as[(Long, Long, Int)].collect()
    assert(out.length == 5000)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // positions are dense 1..n within every shard (a true permutation)
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // shards are balanced-ish (hash, not round-robin): no shard > 2× fair share
    assert(byShard.values.map(_.length).max < 1250)
    // deterministic across partitionings; seed changes the permutation
    val again = Ops.shuffleShard(df.repartition(13), "id", shards = 8)
      .select("id", "shard", "shard_pos").as[(Long, Long, Int)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    val other = Ops.shuffleShard(df, "id", shards = 8, seed = 7L)
      .select("id", "shard", "shard_pos").as[(Long, Long, Int)].collect()
    assert(other.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
    // shard assignment and within-shard order are decorrelated: the order
    // hash is not a function of the shard hash
    val firstIds = out.filter(_._3 == 1).map(_._1).toSet
    assert(firstIds.size == 8)
  }

  private def asofLeft = Seq(
    ("a", 5L, "L5"), ("a", 10L, "L10"), ("a", 20L, "L20"), ("b", 10L, "Lb")
  ).toDF("k", "t", "lv")

  private def asofRight = Seq(
    ("a", 3L, "R3"), ("a", 10L, "R10"), ("a", 15L, "R15"), ("b", 50L, "R50")
  ).toDF("k", "t", "rv")

  test("asofJoin backward: nearest at-or-before match, left-outer") {
    val out = Ops.asofJoin(asofLeft, asofRight, Seq("k"), "t", "t", Seq("rv", "t"))
      .select("k", "t", "lv", "rv", "t_right")
      .as[(String, Long, String, Option[String], Option[Long])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", 5L, "L5", Some("R3"), Some(3L)),
      ("a", 10L, "L10", Some("R10"), Some(10L)), // exact match eligible
      ("a", 20L, "L20", Some("R15"), Some(15L)),
      ("b", 10L, "Lb", None, None)))             // nothing at-or-before
  }

  test("asofJoin: allowExactMatches=false skips the equal-instant row") {
    val out = Ops.asofJoin(asofLeft, asofRight, Seq("k"), "t", "t", Seq("rv"),
        allowExactMatches = false)
      .select("k", "t", "rv").as[(String, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", 5L, Some("R3")),
      ("a", 10L, Some("R3")),  // R10 excluded, falls back to R3
      ("a", 20L, Some("R15")),
      ("b", 10L, None)))
  }

  test("asofJoin forward: nearest at-or-after match") {
    val out = Ops.asofJoin(asofLeft, asofRight, Seq("k"), "t", "t", Seq("rv"),
        direction = "forward")
      .select("k", "t", "rv").as[(String, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", 5L, Some("R10")),
      ("a", 10L, Some("R10")),
      ("a", 20L, None),        // nothing at-or-after
      ("b", 10L, Some("R50"))))
  }

  test("asofJoin: tolerance nulls far matches but keeps the left row") {
    val out = Ops.asofJoin(asofLeft, asofRight, Seq("k"), "t", "t", Seq("rv"),
        tolerance = Some(4.0))
      .select("k", "t", "rv").as[(String, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", 5L, Some("R3")),   // lag 2 <= 4
      ("a", 10L, Some("R10")), // lag 0
      ("a", 20L, None),        // lag 5 > 4 -> nulled
      ("b", 10L, None)))
  }

  test("asofJoin: rightTieCol breaks equal-instant right ties; stable across partitionings") {
    val right = Seq(("a", 15L, "first", 1L), ("a", 15L, "second", 2L))
      .toDF("k", "t", "rv", "rid")
    val left = Seq(("a", 20L, "L")).toDF("k", "t", "lv")
    def run(r: org.apache.spark.sql.DataFrame) =
      Ops.asofJoin(left, r, Seq("k"), "t", "t", Seq("rv", "rid"),
          rightTieCol = Some("rid"))
        .select("rv", "rid").as[(String, Long)].collect().toSeq
    assert(run(right) == Seq(("second", 2L)))          // max rid wins
    assert(run(right.repartition(7)) == Seq(("second", 2L)))
  }

  test("asofJoin: timeBucket hot-key split is row-identical to the unsplit path") {
    // randomized timeline with a deliberately hot key: 3 keys, one carrying
    // 80% of the rows; bucket width 10 forces many cross-bucket carries
    // (left rows whose nearest right row lives several buckets back)
    val rnd = new scala.util.Random(42)
    def key(i: Int) = if (i % 5 != 0) "hot" else if (i % 2 == 0) "b" else "c"
    val l = (0 until 400).map(i => (key(i), rnd.nextInt(300).toLong, s"L$i"))
      .toDF("k", "t", "lv")
    // sparse right side: long right-free stretches → carry must cross buckets
    val r = (0 until 60).map(i => (key(i), rnd.nextInt(300).toLong, s"R$i", i.toLong))
      .toDF("k", "t", "rv", "rid")
    for (dir <- Seq("backward", "forward"); exact <- Seq(true, false);
         tol <- Seq(None, Some(25.0))) {
      val plain = Ops.asofJoin(l, r, Seq("k"), "t", "t", Seq("rv", "rid", "t"),
          direction = dir, allowExactMatches = exact, tolerance = tol,
          rightTieCol = Some("rid"))
        .select("k", "t", "lv", "rv", "rid", "t_right")
        .as[(String, Long, String, Option[String], Option[Long], Option[Long])]
        .collect().sortBy(x => (x._1, x._2, x._3)).toSeq
      val split = Ops.asofJoin(l, r, Seq("k"), "t", "t", Seq("rv", "rid", "t"),
          direction = dir, allowExactMatches = exact, tolerance = tol,
          rightTieCol = Some("rid"), timeBucket = Some(10.0))
        .select("k", "t", "lv", "rv", "rid", "t_right")
        .as[(String, Long, String, Option[String], Option[Long], Option[Long])]
        .collect().sortBy(x => (x._1, x._2, x._3)).toSeq
      assert(split == plain, s"divergence at dir=$dir exact=$exact tol=$tol")
    }
    // and across partitionings (the split path adds a join — must stay stable)
    val a = Ops.asofJoin(l.repartition(13), r.repartition(7), Seq("k"), "t", "t",
        Seq("rv", "rid"), rightTieCol = Some("rid"), timeBucket = Some(10.0))
      .select("k", "t", "lv", "rv", "rid")
      .as[(String, Long, String, Option[String], Option[Long])]
      .collect().sortBy(x => (x._1, x._2, x._3)).toSeq
    val b = Ops.asofJoin(l, r, Seq("k"), "t", "t",
        Seq("rv", "rid"), rightTieCol = Some("rid"), timeBucket = Some(10.0))
      .select("k", "t", "lv", "rv", "rid")
      .as[(String, Long, String, Option[String], Option[Long])]
      .collect().sortBy(x => (x._1, x._2, x._3)).toSeq
    assert(a == b)
  }

  test("asofJoin: payload is atomic (fields never stitched across right rows)") {
    // two right rows straddle the left instant; every payload field must come
    // from the SAME picked row
    val right = Seq(("a", 8L, "x8", 80L), ("a", 9L, "x9", 90L))
      .toDF("k", "t", "rv", "rx")
    val left = Seq(("a", 10L, "L")).toDF("k", "t", "lv")
    val out = Ops.asofJoin(left, right, Seq("k"), "t", "t", Seq("rv", "rx"))
      .select("rv", "rx").as[(String, Long)].collect().toSeq
    assert(out == Seq(("x9", 90L)))
  }

  test("snapshotDiff classifies added/removed/changed; unchanged opt-in; null-safe") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d")))
      .toDF("id", "body")
    val neu = Seq((1L, Some("a")), (2L, Some("B")), (3L, Some("")), (5L, Some("e")))
      .toDF("id", "body")
    val out = Ops.snapshotDiff(old, neu, "id", Seq("body"))
      .as[(Long, String)].collect().toMap
    // null body vs empty string must read as changed, not equal
    assert(out === Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"))
    val all = Ops.snapshotDiff(old, neu, "id", Seq("body"), includeUnchanged = true)
      .as[(Long, String)].collect().toMap
    assert(all(1L) === "unchanged" && all.size === 5)
    // multi-column: boundary shifts between columns must not collide
    val o2 = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val n2 = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    assert(Ops.snapshotDiff(o2, n2, "id", Seq("x", "y"))
      .as[(Long, String)].collect().toMap === Map(1L -> "changed"))
  }

  test("bottomKSample: deterministic, partition-stable, eviction-only growth") {
    val df = spark.range(1000).toDF("id")
    val s1 = Ops.bottomKSample(df, "id", 50).select("id").as[Long].collect().toSet
    val s2 = Ops.bottomKSample(df.repartition(13), "id", 50)
      .select("id").as[Long].collect().toSet
    assert(s1 === s2 && s1.size === 50)
    // growing the corpus only evicts rows from the sample, never reshuffles:
    // the grown sample's old-id portion is a subset of the old sample
    val grown = Ops.bottomKSample(spark.range(2000).toDF("id"), "id", 50)
      .select("id").as[Long].collect().toSet
    assert((grown.filter(_ < 1000) -- s1).isEmpty)
    // mergeable: bottom-k of per-shard bottom-k equals the global sample
    val shards = (0 until 4).map(i =>
      Ops.bottomKSample(df.where(col("id") % 4 === i), "id", 50))
    val merged = Ops.bottomKSample(shards.reduce(_ unionByName _), "id", 50)
      .select("id").as[Long].collect().toSet
    assert(merged === s1)
  }

  test("weightedSample: inclusion tracks weights; deterministic; zero weights excluded") {
    // two weight classes, 10:1 — heavy rows should dominate the sample
    val df = spark.range(2000).select(col("id"),
      when(col("id") < 1000, 100.0).otherwise(10.0).as("w"))
    val got = Ops.weightedSample(df, "id", "w", 200)
      .select("id").as[Long].collect().toSet
    val heavy = got.count(_ < 1000)
    assert(heavy > 140, s"heavy-weight rows under-sampled: $heavy/200")
    // deterministic across partitionings
    val again = Ops.weightedSample(df.repartition(9), "id", "w", 200)
      .select("id").as[Long].collect().toSet
    assert(again === got)
    // zero/negative/null weights never qualify
    val withBad = df.withColumn("w",
      when(col("id") === 5, 0.0).when(col("id") === 6, -1.0)
        .when(col("id") === 7, lit(null)).otherwise(col("w")))
    val sampled = Ops.weightedSample(withBad, "id", "w", 2000)
      .select("id").as[Long].collect().toSet
    assert(!sampled(5L) && !sampled(6L) && !sampled(7L) && sampled.size === 1997)
  }

  test("bottomKSample: per-stratum k and the O(k)-heap global plan") {
    val df = spark.range(300)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
    val out = Ops.bottomKSample(df, "id", 10, strataCols = Seq("g"))
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet === Set(10L) && sizes.size === 3)
    val plan = Ops.bottomKSample(df, "id", 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sample not heap-planned:\n$plan")
  }

  test("compactHistory collapses runs into validity intervals") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, "a", ts(0), 100L), (1L, "a", ts(1), 101L), (1L, "b", ts(2), 102L),
      (1L, "a", ts(3), 103L), // a -> b -> a again: three runs, not two
      (2L, "x", ts(0), 104L))
    val df = rows.toDF("k", "v", "ts", "id")
    val out = Ops.compactHistory(df, Seq("k"), "ts", Seq("v"), tieCol = "id")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(out.toSeq == Seq(
      (1L, "a", ts(0), Some(ts(2))),
      (1L, "b", ts(2), Some(ts(3))),
      (1L, "a", ts(3), None),
      (2L, "x", ts(0), None)))
    assert(t0 == ts(0))
  }

  test("pivotSum: declared columns, zero-filled cells, one aggregation") {
    val df = Seq(("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 5.0), ("b", "y", 7.0))
      .toDF("g", "p", "v")
    val out = Ops.pivotSum(df, Seq("g"), "p", Seq("x", "y", "z"), "v")
    assert(out.columns.toSeq == Seq("g", "x", "y", "z"))
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("a") == ((3.0, 5.0, 0.0)))
    assert(rows("b") == ((0.0, 7.0, 0.0))) // absent pivot values are 0, not null
    val plan = out.queryExecution.sparkPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("flagOutliers: planted spike flagged, z matches closed form, flat group safe") {
    // group a: nine 10s and one 100 — the spike dominates the variance;
    // group b: constant (zero variance -> z 0, never outliers)
    val rows = (1L to 9L).map(i => (i, "a", 10.0)) ++ Seq((10L, "a", 100.0)) ++
      (11L to 14L).map(i => (i, "b", 7.0))
    val df = rows.toDF("id", "g", "v")
    val out = Ops.flagOutliers(df, "v", Seq("g"), z = 2.0).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("zscore"), r.getAs[Boolean]("is_outlier"))).toMap
    val mean = (9 * 10.0 + 100.0) / 10
    val variance = ((9 * 100.0 + 10000.0) - 10 * mean * mean) / 10
    val zSpike = (100.0 - mean) / math.sqrt(variance)
    assert(math.abs(out(10L)._1 - zSpike) < 1e-12)
    assert(out(10L)._2, "spike not flagged")
    (1L to 9L).foreach(i => assert(!out(i)._2, s"inlier $i flagged"))
    (11L to 14L).foreach(i => assert(out(i)._1 == 0.0 && !out(i)._2))
  }

  test("autocorrelation: alternating series hits ±1, constant hits sentinel") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // key A: hourly alternating 1,3,1,3,... over 12 buckets; key B constant
    val rows = (0 until 12).map(i =>
      ("A", ts(i * 3600L + 5), if (i % 2 == 0) 1.0 else 3.0, i.toLong)) ++
      (0 until 6).map(i => ("B", ts(i * 3600L + 5), 7.0, 100L + i))
    val df = rows.toDF("k", "ts", "v", "id")
    def acf(lagN: Int) = Ops.autocorrelation(df, "k", "ts", "v", 3600L, lagN, "id")
      .select("k", "n_pairs", "acf").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val l2 = acf(2)
    assert(l2("A")._1 == 10L && math.abs(l2("A")._2 - 1.0) < 1e-9) // period 2
    assert(l2("B")._2 == -1.0) // zero variance: sentinel
    val l1 = acf(1)
    assert(math.abs(l1("A")._2 - (-1.0)) < 1e-9) // perfect anti-phase
    // lag beyond the series length: no pairs, key drops
    assert(!acf(20).contains("A") || acf(20)("A")._1 >= 2L)
  }

  test("keyFeatures: one-pass rollup matches hand-computed features") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, ts(100), "click", 2.0), (1L, ts(300), "view", 4.0),
      (1L, ts(200), "click", 6.0), (2L, ts(50), "buy", 10.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Ops.keyFeatures(df, "user_id", "ts", "event_type", "value",
        Seq("click", "view", "buy"))
      .select("user_id", "n_click", "n_view", "n_buy", "n_events",
        "value_sum", "first_us", "last_us", "tenure_us")
      .as[(Long, Long, Long, Long, Long, Double, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 0L, 3L, 12.0, 100000000L, 300000000L, 200000000L)))
    assert(out(2L) == ((2L, 0L, 0L, 1L, 1L, 10.0, 50000000L, 50000000L, 0L)))
    // one aggregation: a partial + final pair, no extra exchange per feature
    val plan = Ops.keyFeatures(df, "user_id", "ts", "event_type", "value", Seq("click"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"feature rollup re-shuffled:\n$plan")
  }

  test("attributionLinear: equal split inside the window, exclusions exact") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val W = 100L
    val rows = Seq(
      // conversion at t=200 (value 12): touches at 150, 120 inside; 90 outside
      (1L, ts(150), "A", "click", 0.0), (2L, ts(120), "A", "view", 0.0),
      (3L, ts(90), "A", "click", 0.0), (4L, ts(200), "A", "purchase", 12.0),
      // conversion at t=300 (value 6): touch 1 (t=150) now outside, 250 inside
      (5L, ts(250), "A", "click", 0.0), (6L, ts(300), "A", "purchase", 6.0),
      // touch exactly AT the conversion instant counts (closed end)
      (7L, ts(400), "B", "click", 0.0), (8L, ts(400), "B", "purchase", 10.0),
      // conversion with no touches: contributes nothing
      (9L, ts(500), "C", "purchase", 99.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Ops.attributionLinear(df, "user_id", "ts", "event_type",
        "purchase", Seq("click", "view"), "value", W, "event_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((1L, 6.0))) // conv 4 splits 12 across touches 1, 2
    assert(out(2L) == ((1L, 6.0)))
    assert(out(5L) == ((1L, 6.0))) // conv 6: only touch 5 inside its window
    assert(out(7L) == ((1L, 10.0))) // same-instant touch gets full credit
    assert(!out.contains(3L), "outside-window touch credited")
    assert(out.values.map(_._2).sum == 28.0) // conv 9 (touchless) drops its 99
  }

  test("basketLift: closed-form lift, dedup within basket, mega-basket guard") {
    // baskets: {x,y} ×3, {x,z}, {y,z}, singleton {x}, and one mega-basket
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // within-basket repeat dedups
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"),
      (4L, "x"), (4L, "z"),
      (5L, "y"), (5L, "z"),
      (6L, "x")) ++ // singleton: no pairs, excluded from N
      (0 until 30).map(i => (99L, s"m$i")) // mega-basket beyond maxBasket
    val df = rows.toDF("b", "i")
    val out = Ops.basketLift(df, "b", "i", minCount = 1L, maxBasket = 10)
      .select("item_a", "item_b", "n_both", "lift")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // eligible baskets: 1..5 (N=5); c(x)=4, c(y)=4, c(z)=2
    assert(out(("x", "y")) == ((3L, 5.0 * 3 / (4 * 4))))
    assert(out(("x", "z")) == ((1L, 5.0 * 1 / (4 * 2))))
    assert(out(("y", "z")) == ((1L, 5.0 * 1 / (4 * 2))))
    assert(out.size == 3, s"mega-basket pairs leaked: ${out.keySet}")
    // minCount prunes the tail
    val pruned = Ops.basketLift(df, "b", "i", minCount = 2L, maxBasket = 10)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(pruned == Set(("x", "y")))
  }

  test("transitionMatrix: pair counts, row-normalized, tie-ordered") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq(
      ("A", ts(1), "a", 1L), ("A", ts(2), "b", 2L),
      ("A", ts(3), "a", 3L), ("A", ts(4), "c", 4L),
      ("B", ts(1), "a", 5L), ("B", ts(2), "b", 6L))
    val out = Ops.transitionMatrix(rows.toDF("k", "ts", "s", "id"), "k", "ts", "s", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", "b")) == ((2L, 2.0 / 3)))
    assert(out(("a", "c")) == ((1L, 1.0 / 3)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 3)
    // simultaneous events order by the tie column, not partition luck
    val tied = Seq(("A", ts(1), "x", 2L), ("A", ts(1), "y", 1L), ("A", ts(2), "z", 3L))
    val t2 = Ops.transitionMatrix(tied.toDF("k", "ts", "s", "id"), "k", "ts", "s", "id")
      .select("from_state", "to_state").as[(String, String)].collect().toSet
    assert(t2 == Set(("y", "x"), ("x", "z"))) // id 1 (y) precedes id 2 (x)
  }

  test("gapFill: dense spine, last-in-bucket wins, gaps carry forward") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // key A: buckets 0 and 2 present (bucket 2 has a within-bucket tie at
    // 7800s broken by id), bucket 1 is a gap; key B: a single bucket
    val rows = Seq(
      ("A", ts(0), 1.0, 1L), ("A", ts(7500), 2.0, 2L),
      ("A", ts(7800), 100.0, 5L), ("A", ts(7800), 3.0, 6L),
      ("B", ts(5 * 3600 + 10), 7.0, 9L))
    val df = rows.toDF("k", "ts", "v", "id")
    val out = Ops.gapFill(df, "k", "ts", "v", 3600L, "id")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("A", 0L, 1.0, false),
      ("A", 1L, 1.0, true), // gap: previous bucket's value, flagged
      ("A", 2L, 3.0, false), // ts tie at 7800s -> larger id wins, not 100.0
      ("B", 5L, 7.0, false)))
    // deterministic under repartitioning
    val again = Ops.gapFill(df.repartition(7), "k", "ts", "v", 3600L, "id")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("gapFillInterp: two-point interpolation, observed pass-through, no nulls") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // key A: observed at buckets 0 (v=0) and 4 (v=8) → gaps 1,2,3 get 2,4,6;
    // key B observed at 5 and 6 (adjacent, no gap); key C a single bucket
    val rows = Seq(
      ("A", ts(10), 0.0, 1L), ("A", ts(4 * 3600 + 10), 8.0, 2L),
      ("B", ts(5 * 3600), 5.0, 3L), ("B", ts(6 * 3600), 6.0, 4L),
      ("C", ts(9 * 3600), 9.5, 5L))
    val df = rows.toDF("k", "ts", "v", "id")
    val out = Ops.gapFillInterp(df, "k", "ts", "v", 3600L, "id")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("A", 0L, 0.0, false),
      ("A", 1L, 2.0, true), ("A", 2L, 4.0, true), ("A", 3L, 6.0, true),
      ("A", 4L, 8.0, false),
      ("B", 5L, 5.0, false), ("B", 6L, 6.0, false),
      ("C", 9L, 9.5, false)))
    // interpolation respects uneven neighbor values (non-integer slope)
    val uneven = Seq(("D", ts(0), 1.0, 1L), ("D", ts(3 * 3600), 2.0, 2L))
      .toDF("k", "ts", "v", "id")
    val d = Ops.gapFillInterp(uneven, "k", "ts", "v", 3600L, "id")
      .orderBy("bucket").select("interp6").as[Double].collect()
    assert(d.toSeq == Seq(1.0, 1.333333, 1.666667, 2.0))
    // deterministic under repartitioning
    val again = Ops.gapFillInterp(df.repartition(7), "k", "ts", "v", 3600L, "id")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("applyChangelog: latest-wins upserts, deletes, inserts, pass-through") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"), (4L, 40.0, "d"))
      .toDF("k", "bal", "seg")
    val changes = Seq(
      (2L, 21.0, "b1", "upsert", ts(10), 1L),
      (2L, 22.0, "b2", "upsert", ts(20), 2L), // latest wins
      (2L, 99.0, "b9", "upsert", ts(20), 1L), // same ord, smaller tie loses
      (3L, 0.0, "x", "delete", ts(5), 3L),
      (5L, 50.0, "e", "upsert", ts(7), 4L), // insert: no base row
      (6L, 0.0, "x", "delete", ts(8), 5L)) // delete of absent key: no-op
      .toDF("k", "bal", "seg", "op", "ts", "id")
    val out = Ops.applyChangelog(base, changes, Seq("k"), "ts", "op", "id")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 10.0, "a"), (2L, 22.0, "b2"), (4L, 40.0, "d"), (5L, 50.0, "e")))
    // replay determinism: applying the same changelog twice is idempotent
    val twice = Ops.applyChangelog(
      Ops.applyChangelog(base, changes, Seq("k"), "ts", "op", "id"),
      changes, Seq("k"), "ts", "op", "id")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.toSeq == twice.toSeq)
  }
}
