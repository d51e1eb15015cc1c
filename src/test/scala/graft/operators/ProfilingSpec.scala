package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProfilingSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("profile: per-column counts, value-order min/max, numeric-only mean") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), Some("y")),
      (Some(2L), None), (None, None))
      .toDF("a", "s")
    val out = Profiling.profile(df, Seq("a", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getDouble(6)))).toMap
    assert(out("a") == ((4L, 1L, 2L, "1", "2", 1.666667)))
    // string column: mean sentinel -1; min/max by VALUE order
    assert(out("s") == ((4L, 2L, 2L, "x", "y", -1.0)))
    // min/max must be value order, not lexicographic string order
    val wide = Seq(9L, 10L).toDF("n")
    val mm = Profiling.profile(wide, Seq("n")).collect()(0)
    assert(mm.getString(4) == "9" && mm.getString(5) == "10")
  }

  test("profile: one scan, one aggregation (no per-column jobs)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "s")
    val plan = Profiling.profile(df, Seq("a", "s")).queryExecution.executedPlan.toString
    // the multi-distinct plans as Expand + aggregate — exactly one Expand,
    // no join/union stitching per column
    assert("Expand".r.findAllIn(plan).size == 1, s"expected one Expand:\n$plan")
    assert(!plan.contains("Union"), s"per-column union in plan:\n$plan")
  }

  test("profile approx: no Expand, estimate inside the HLL band") {
    val df = (1 to 5000).map(i => (i.toLong % 1000, s"s${i % 10}")).toDF("a", "s")
    val plan = Profiling.profile(df, Seq("a", "s"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile still plans Expand:\n$plan")
    val out = Profiling.profile(df, Seq("a", "s"), approx = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // approx_count_distinct default rsd = 5%: 1000 and 10 distincts
    assert(math.abs(out("a") - 1000L) <= 100, s"a distinct est ${out("a")}")
    assert(out("s") == 10L, s"s distinct est ${out("s")}") // tiny set: exact
  }

  test("entropy: one scan of the source (explode, not per-column unions)") {
    val df = Seq((1L, "x", 2.0, "p"), (2L, "y", 3.0, "q")).toDF("a", "s", "d", "t")
    val qe = Profiling.entropy(df, Seq("a", "s", "d", "t")).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Union"), s"per-column union in entropy plan:\n$plan")
    // exactly one source scan feeding one generator
    assert("Scan|LocalTableScan".r.findAllIn(plan).size == 1,
      s"expected one scan:\n$plan")
    assert(plan.contains("Generate"), s"expected explode generator:\n$plan")
  }

  test("corrMatrix: exact pairs, sentinel on zero variance, null pairing") {
    val df = Seq(
      (1.0, 2.0, 5.0, Some(1.0)),
      (2.0, 4.0, 5.0, Some(0.0)),
      (3.0, 6.0, 5.0, None),
      (4.0, 8.0, 5.0, Some(-2.0)))
      .toDF("x", "y2", "const", "z")
    val out = Profiling.corrMatrix(df, Seq("x", "y2", "const", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("x", "y2")) == ((4L, 1.0))) // y2 = 2x: perfect correlation
    assert(out(("x", "const"))._2 == -1.0) // zero variance -> sentinel
    assert(out(("y2", "const"))._2 == -1.0)
    // z pairs only over its non-null rows (n_both = 3)
    assert(out(("x", "z"))._1 == 3L)
    // x = 1,2,4 vs z = 1,0,-2: exactly anticorrelated
    assert(math.abs(out(("x", "z"))._2 - (-1.0)) < 1e-9)
    assert(out.size == 6)
  }

  test("psi: zero on identical samples, positive under shift, bins total") {
    val ref = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Profiling.psi(ref, ref, "v", bins = 10, lo = 0.0, hi = 100.0)
      .select("psi").as[Double].head()
    assert(math.abs(same) < 1e-12)
    // shift the mass up by 30: a real drift must register
    val cur = (1 to 1000).map(i => (i % 100 + 30).toDouble).toDF("v")
    val rows = Profiling.psi(ref, cur, "v", bins = 10, lo = 0.0, hi = 100.0)
      .select("bin", "n_ref", "n_cur", "psi")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.length == 10) // every bin present, even empty ones
    assert(rows.head._4 > 0.25, s"psi ${rows.head._4} too low for a 30% shift")
    // out-of-range values clamp into the edge bin (the index stays total)
    assert(rows.map(_._3).sum == 1000L)
    // ref bins 0-2 are empty on the cur side and vice versa: epsilon path
    val curByBin = rows.map(r => r._1 -> r._3).toMap
    assert(curByBin(0) == 0L && curByBin(9) > 0L)
  }

  test("kAnonymityViolations: only classes under k, sizes exact") {
    val df = Seq(
      ("NY", "A"), ("NY", "A"), ("NY", "A"), // class of 3: safe at k=3
      ("SF", "B"), ("SF", "B"), // class of 2: violates
      ("LA", "C")) // class of 1: violates
      .toDF("city", "seg")
    val out = Profiling.kAnonymityViolations(df, Seq("city", "seg"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("SF", "B") -> 2L, ("LA", "C") -> 1L))
  }

  test("giniConcentration: closed-form extremes and a hand case") {
    // perfectly equal groups -> G = 0
    val eq = (1 to 40).map(i => s"g${i % 4}").toDF("g")
    val g0 = Profiling.giniConcentration(eq, "g").collect()(0)
    assert(g0.getLong(0) == 4L && g0.getLong(1) == 40L)
    assert(math.abs(g0.getDouble(2)) < 1e-12)
    // counts 1,2,3,4: G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 60/40 - 1.25 = 0.25
    val hand = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(4)("d")).toDF("g")
    val gh = Profiling.giniConcentration(hand, "g").collect()(0).getDouble(2)
    assert(math.abs(gh - 0.25) < 1e-12)
    // one dominant group drives G toward 1
    val skew = (Seq.fill(97)("big") ++ Seq("x", "y", "z")).toDF("g")
    assert(Profiling.giniConcentration(skew, "g").collect()(0).getDouble(2) > 0.7)
  }

  test("entropy: closed-form values, nulls are a value, constant is zero") {
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 1L), (Some("b"), 1L), (Some("b"), 1L),
      (None, 1L), (None, 1L), (None, 1L), (None, 1L))
      .toDF("s", "k")
    val out = Profiling.entropy(df, Seq("s", "k")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // s: counts (2, 2, 4)/8 -> H = ln8 - (2ln2 + 2ln2 + 4ln4)/8
    val hS = math.log(8) - (2 * math.log(2) * 2 + 4 * math.log(4)) / 8.0
    assert(out("s")._1 == 8L)
    assert(math.abs(out("s")._2 - hS) < 1e-6)
    assert(out("k") == ((8L, 0.0))) // constant column: zero entropy
    // uniform column: H = ln(n)
    val u = (1 to 32).map(_.toLong).toDF("v")
    val hU = Profiling.entropy(u, Seq("v")).collect()(0).getDouble(2)
    assert(math.abs(hU - math.log(32)) < 1e-6)
  }
}
