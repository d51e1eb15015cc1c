package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.geom.{Mercator, WKB, LineString}

class RoutingSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("GreatCircleRouter column path matches its scalar path") {
    val df = Seq((0, 10.0, 20.0, 11.0, 21.0)).toDF("id", "lon1", "lat1", "lon2", "lat2")
    val out = Routing.route(df, col("lon1"), col("lat1"), col("lon2"), col("lat2")).head()
    val scalar = new GreatCircleRouter().route(10, 20, 11, 21)
    assert(math.abs(out.getAs[Double]("distance") - scalar.distanceM) < 1e-6)
    assert(math.abs(out.getAs[Double]("duration") - scalar.durationS) < 1e-8)
    val g = WKB.read(out.getAs[Array[Byte]]("route_geometry")).asInstanceOf[LineString]
    assert(g.coords.toSeq == Seq(10.0, 20.0, 11.0, 21.0))
  }

  test("custom Router via UDF fallback produces the same schema") {
    object FixedRouter extends Router {
      override def route(lon1: Double, lat1: Double, lon2: Double, lat2: Double): RouteLeg =
        RouteLeg(42.0, 1000.0, WKB.write(LineString(Array(lon1, lat1, lon2, lat2))))
    }
    val df = Seq((0, 1.0, 2.0, 3.0, 4.0)).toDF("id", "a", "b", "c", "d")
    val out = Routing.route(df, col("a"), col("b"), col("c"), col("d"), FixedRouter).head()
    assert(out.getAs[Double]("duration") == 42.0 && out.getAs[Double]("distance") == 1000.0)
  }

  test("routeAlternatives: deterministic router yields one, custom router several") {
    val df = Seq((0, 0.0, 0.0, 1.0, 1.0)).toDF("id", "a", "b", "c", "d")
    val one = Routing.routeAlternatives(df, col("a"), col("b"), col("c"), col("d"))
    assert(one.count() == 1 && one.head().getAs[Int]("alt_index") == 0)

    object TwoWays extends Router {
      override def route(lon1: Double, lat1: Double, lon2: Double, lat2: Double): RouteLeg =
        RouteLeg(10.0, 100.0, WKB.write(LineString(Array(lon1, lat1, lon2, lat2))))
      override def alternatives(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
          max: Int): Seq[RouteLeg] =
        Seq(route(lon1, lat1, lon2, lat2),
          RouteLeg(14.0, 120.0, WKB.write(LineString(Array(lon1, lat1, 0.5, 0.5, lon2, lat2)))))
    }
    val two = Routing.routeAlternatives(df, col("a"), col("b"), col("c"), col("d"), router = TwoWays)
    assert(two.count() == 2)
    val best = two.where(col("alt_index") === 0).head()
    assert(best.getAs[Double]("duration") == 10.0)
  }

  test("tableRoute yields the full N×M matrix with broadcast dests") {
    val src = Seq((1, 0.0, 0.0), (2, 1.0, 1.0), (3, 2.0, 2.0)).toDF("sid", "slon", "slat")
    val dst = Seq((10, 5.0, 5.0), (20, 6.0, 6.0)).toDF("did", "dlon", "dlat")
    val out = Routing.tableRoute(src, dst, "slon", "slat", "dlon", "dlat")
    assert(out.count() == 6)
    val d = out.where(col("sid") === 1 && col("did") === 10).head().getAs[Double]("distance")
    assert(math.abs(d - Mercator.haversine(0, 0, 5, 5)) < 1e-6)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")) // dims broadcast, big side never shuffles
  }

  test("isochrone contours approximate the reachable disc and nest by level") {
    val src = Seq((1, 10.0, 10.0)).toDF("rid", "lon", "lat")
    val out = Routing.isochroneContours(src, "lon", "lat", Seq(600.0, 1200.0),
      stepDeg = 0.05, halfCells = 8, keyCols = Seq("rid"))
    val rows = out.orderBy("level_s").collect()
    assert(rows.length == 2)
    val a600 = graft.geom.Algos.area(WKB.read(rows(0).getAs[Array[Byte]]("geometry")))
    val a1200 = graft.geom.Algos.area(WKB.read(rows(1).getAs[Array[Byte]]("geometry")))
    assert(a1200 > a600 && a600 > 0)
    // 600 s at 25 m/s = 15 km radius ≈ 0.135° at lat 10 → disc area in deg²
    // (lon radius inflated by 1/cos(lat)); raster interpolation (refine = 4,
    // the reference's LinearTriInterpolator stage) tightens the marching-
    // squares approximation well under the direct-sample contour's error
    val rDeg = 15000.0 / 111195.0 // haversine deg ≈ 111.2 km
    val expect = math.Pi * rDeg * (rDeg / math.cos(math.toRadians(10)))
    val errRefined = math.abs(a600 - expect) / expect
    assert(errRefined < 0.05, s"disc area $a600 vs $expect (err $errRefined)")
    val direct = Routing.isochroneContours(src, "lon", "lat", Seq(600.0),
      stepDeg = 0.05, halfCells = 8, keyCols = Seq("rid"), rasterRefine = 1)
      .collect().head.getAs[Array[Byte]]("geometry")
    val errDirect = math.abs(graft.geom.Algos.area(WKB.read(direct)) - expect) / expect
    assert(errRefined <= errDirect + 1e-9,
      s"interpolated contour (err $errRefined) should beat direct sampling (err $errDirect)")
  }

  test("raster interpolation reproduces a linear field's contour exactly") {
    // duration linear in the grid coordinates → every triangle interpolates
    // exactly, so the ≤ t region of the PL field is the true half-plane
    // clipped to the grid; its area must be exact to fp rounding
    import graft.geom.Contour
    val h = 4
    val n = 2 * h + 1
    val samples = Array.tabulate(n, n)((i, j) => 2.0 * i + 3.0 * j)
    val fine = Contour.interpolate(samples, 4)
    assert(fine.length == (n - 1) * 4 + 1)
    // lattice nodes keep exact sample values
    for (i <- 0 until n; j <- 0 until n) assert(fine(i * 4)(j * 4) == samples(i)(j))
    // linear field: interpolant is the field itself at every raster node
    for (k <- 0 until fine.length; l <- 0 until fine.length)
      assert(math.abs(fine(k)(l) - (2.0 * k / 4 + 3.0 * l / 4)) < 1e-12)
    // contoured area of {2x+3y ≤ t} over [0,8]² — a triangle for small t
    val t = 6.0
    val area = graft.geom.Algos.area(Contour.filled(fine, 0, 0, 0.25, t))
    val exact = t * t / (2 * 2.0 * 3.0) // right triangle legs t/2, t/3
    assert(math.abs(area - exact) < 1e-9, s"$area vs $exact")
  }

  test("gridHalfCells sizes the grid from speed and duration") {
    // 25 m/s for 600 s = 15 km ≈ 0.135°; at 0.05° steps → 3 cells + 1 pad
    assert(Routing.gridHalfCells(Seq(600.0), 25.0, 0.05) == 4)
    val h = Routing.gridHalfCells(Seq(600.0, 1200.0), 25.0, 0.05)
    val src = Seq((1, 10.0, 10.0)).toDF("rid", "lon", "lat")
    val out = Routing.isochrone(src, "lon", "lat", Seq(1200.0),
      stepDeg = 0.05, halfCells = h, keyCols = Seq("rid"), withGeometry = false)
    // the auto-sized grid fully contains the reachable disc: widening it
    // further must not add cells
    val wider = Routing.isochrone(src, "lon", "lat", Seq(1200.0),
      stepDeg = 0.05, halfCells = h + 3, keyCols = Seq("rid"), withGeometry = false)
    assert(out.head().getAs[Long]("n_cells") == wider.head().getAs[Long]("n_cells"))
  }

  test("hex grid isochrone: denser rows raise the in-disc cell count ~2/√3") {
    val src = Seq((1, 0.0, 0.0)).toDF("rid", "lon", "lat")
    def cells(shape: String): Long =
      Routing.isochrone(src, "lon", "lat", Seq(1200.0), stepDeg = 0.02, halfCells = 16,
          keyCols = Seq("rid"), withGeometry = false, gridShape = shape)
        .head().getAs[Long]("n_cells")
    val sq = cells("square"); val hx = cells("hex")
    val ratio = hx.toDouble / sq
    assert(ratio > 1.0 && ratio < 1.35, s"square=$sq hex=$hx ratio=$ratio")
    intercept[IllegalArgumentException] {
      Routing.isochrone(src, "lon", "lat", Seq(600.0), gridShape = "triangular")
    }
  }

  test("gridHalfCells widens the grid away from the equator") {
    val eq = Routing.gridHalfCells(Seq(600.0), 25.0, 0.05)
    val at60 = Routing.gridHalfCells(Seq(600.0), 25.0, 0.05, latDeg = 60.0)
    // cos(60°)=0.5 → east-west degree reach doubles
    assert(at60 > eq, s"eq=$eq at60=$at60")
    assert(at60 >= math.ceil((eq - 1) * 2).toInt, s"eq=$eq at60=$at60")
  }

  test("isochrone cell counts grow with duration level and geometry unions cells") {
    val src = Seq((1, 10.0, 10.0)).toDF("rid", "lon", "lat")
    val out = Routing.isochrone(src, "lon", "lat", Seq(300.0, 900.0),
      stepDeg = 0.05, halfCells = 6, keyCols = Seq("rid"))
    val rows = out.orderBy("level_s").collect()
    assert(rows.length == 2)
    val n300 = rows(0).getAs[Long]("n_cells")
    val n900 = rows(1).getAs[Long]("n_cells")
    assert(n300 > 0 && n900 > n300)
    // dissolved geometry area ≈ n_cells × cell area (squares union disjointly or adjacently)
    val area = graft.geom.Algos.area(WKB.read(rows(1).getAs[Array[Byte]]("geometry")))
    assert(math.abs(area - n900 * 0.05 * 0.05) < 1e-6)
  }
}
