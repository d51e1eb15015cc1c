package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GeoFunctions._

class GeoOpsSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  private lazy val mixed = Seq(
    (1, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
    (2, "LINESTRING (0 0, 3 4)"),
    (3, "POINT (5 5)"))
    .toDF("id", "wkt")
    .select(col("id"), st_geomfromtext(col("wkt")).as("geometry"))

  test("areaM: skipTransform treats coords as planar units") {
    val out = GeoOps.areaM(mixed, skipTransform = true).where(col("id") === 1).head()
    assert(out.getAs[Double]("area") == 1.0) // unit square, planar
  }

  test("areaM: nullifyIrrelevant nulls lines and points (erde nullify_irrelevant)") {
    val out = GeoOps.areaM(mixed, nullifyIrrelevant = true)
      .select("id", "area").collect().map(r => r.getInt(0) -> r.get(1)).toMap
    assert(out(1) != null && out(1).asInstanceOf[Double] > 0)
    assert(out(2) == null && out(3) == null)
  }

  test("lengthM: skipTransform planar length; nullify for points") {
    val out = GeoOps.lengthM(mixed, skipTransform = true, nullifyIrrelevant = true)
      .select("id", "length").collect().map(r => r.getInt(0) -> r.get(1)).toMap
    assert(out(2).asInstanceOf[Double] == 5.0) // 3-4-5 triangle hypotenuse
    assert(out(1).asInstanceOf[Double] == 4.0) // square perimeter
    assert(out(3) == null)
  }

  test("convert round-trips through 3857") {
    val back = GeoOps.toLonLat(GeoOps.toMercator(mixed))
    val x = back.where(col("id") === 3).select(st_x(col("geometry"))).head().getDouble(0)
    assert(math.abs(x - 5.0) < 1e-9)
  }

  test("lonlatToPoints: recognized combos and the error message") {
    val ok = Seq((1, 10.0, 20.0)).toDF("id", "lng", "lat")
    val pt = GeoOps.lonlatToPoints(ok).select(st_y(col("geometry"))).head().getDouble(0)
    assert(pt == 20.0)
    val bad = Seq((1, 10.0)).toDF("id", "z")
    val err = intercept[IllegalArgumentException](GeoOps.lonlatToPoints(bad))
    assert(err.getMessage.contains("Possible combinations"))
  }

  test("bufferM dissolve merges overlapping buffers into one geometry") {
    val close = Seq((1, 0.0, 0.0), (2, 0.001, 0.0)).toDF("id", "lon", "lat")
      .select(st_point(col("lon"), col("lat")).as("geometry"))
    val dissolved = GeoOps.bufferM(close, radiusMetres = 1000, dissolve = true)
    assert(dissolved.count() == 1)
    val area = dissolved.select(st_aream(col("geometry"))).head().getDouble(0)
    val one = 0.5 * 40 * 1000 * 1000 * math.sin(2 * math.Pi / 40) // resolution 10 → n=40
    assert(area > one && area < 2 * one) // overlapping: less than two disjoint discs
  }

  test("arealInterpolate: area-weighted value transfer, closed form") {
    val targets = Seq((1, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      (2, "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))")) // overlaps nothing
      .toDF("tid", "wkt")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    val sources = Seq(
      ("a", "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", 10.0), // half inside: 10/2
      ("b", "POLYGON ((0.5 0, 1.5 0, 1.5 1, 0.5 1, 0.5 0))", 4.0), // half: 2
      ("c", "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", 99.0)) // disjoint
      .toDF("sid", "wkt", "pop")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    val out = GeoOps.arealInterpolate(targets, sources, "tid", "pop")
      .as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) - 7.0) < 1e-9) // 10·(1/2) + 4·(0.5/1)
    assert(!out.contains(2)) // no intersecting source: inner semantics
  }

  test("arealInterpolate: zero-area source contributes zero, not NaN") {
    val targets = Seq((1, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("tid", "wkt")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    val sources = Seq(
      ("a", "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", 10.0), // half inside: 5
      // degenerate (zero-area) polygon crossing the target: must add 0,
      // not a NaN that poisons the whole zone's sum
      ("z", "POLYGON ((0 0, 1 1, 0 0, 0 0))", 77.0))
      .toDF("sid", "wkt", "pop")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    val out = GeoOps.arealInterpolate(targets, sources, "tid", "pop")
      .as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) - 5.0) < 1e-9, s"got ${out(1)}")
  }

  test("hexbin assigns every point to its nearest hex center") {
    val size = 2.0
    // deterministic scatter, including points near cell boundaries
    val pts = (0 until 400).map { i =>
      (i.toLong, (i % 20) * 0.93 - 9.0, (i / 20) * 0.87 - 8.0)
    }
    val df = pts.toDF("id", "lon", "lat")
    val out = GeoOps.hexbin(df, "lon", "lat", size)
      .select($"id", $"lon", $"lat", $"hex_q", $"hex_r")
      .as[(Long, Double, Double, Long, Long)].collect()
    def center(q: Long, r: Long): (Double, Double) =
      (size * 1.5 * q, size * math.sqrt(3.0) * (r + q / 2.0))
    def dist(x: Double, y: Double, c: (Double, Double)): Double =
      math.hypot(x - c._1, y - c._2)
    out.foreach { case (id, x, y, q, r) =>
      val own = dist(x, y, center(q, r))
      // nearest among the assigned cell's neighborhood — cube rounding is
      // exactly the nearest-center rule
      for (dq <- -2L to 2L; dr <- -2L to 2L) {
        val other = dist(x, y, center(q + dq, r + dr))
        assert(own <= other + 1e-9,
          s"point $id ($x,$y): cell ($q,$r) d=$own beaten by (${q + dq},${r + dr}) d=$other")
      }
      assert(own <= size + 1e-9, s"point $id farther than the circumradius")
    }
    // binning is a pure projection: no exchange in the plan
    val plan = GeoOps.hexbin(df, "lon", "lat", size)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hexbin shuffled:\n$plan")
  }
}
