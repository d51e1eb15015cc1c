package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/** Routing leg: seconds, metres, WKB geometry, plus snap distances (metres
  * from the requested endpoints to the network, 0 for math routers) —
  * reference: erde/op/table.py source/destination snap columns and
  * erde/op/isochrone.py's full_duration = duration + snap penalty.
  */
final case class RouteLeg(durationS: Double, distanceM: Double, wkb: Array[Byte],
    snapSourceM: Double = 0.0, snapDestM: Double = 0.0,
    nodes: Seq[Long] = Nil) // OSM node ids when the engine annotates them

/** Pluggable routing backend (reference: erde/op/route.py — OSRM HTTP).
  *
  * The reference calls an external OSRM server per chunk; an HTTP hop per row
  * is the opposite of cluster-friendly, so graft makes the router a trait:
  * implementations that wrap a real engine lift `route` into a UDF (default
  * `routeExpr`), while pure-math routers override `routeExpr` with built-in
  * column expressions and stay inside WholeStageCodegen.
  */
trait Router extends Serializable {

  def route(lon1: Double, lat1: Double, lon2: Double, lat2: Double): RouteLeg

  /** Alternative routes, best first (reference: erde/op/route.py
    * `alternatives` — OSRM may return several); deterministic math routers
    * have exactly one.
    */
  def alternatives(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
      max: Int): Seq[RouteLeg] = Seq(route(lon1, lat1, lon2, lat2))

  /** Batch interface: a struct column
    * {duration, distance, geometry, snap_source, snap_dest}.
    */
  def routeExpr(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val u = udf { (a: Double, b: Double, c: Double, d: Double) =>
      val leg = route(a, b, c, d)
      (leg.durationS, leg.distanceM, leg.wkb, leg.snapSourceM, leg.snapDestM)
    }
    u(lon1, lat1, lon2, lat2)
      .cast("struct<duration:double,distance:double,geometry:binary,snap_source:double,snap_dest:double>")
  }
}

/** Deterministic great-circle router: distance = haversine metres, duration =
  * distance / speed, geometry = straight segment. Pure column math — no UDF,
  * no network, embarrassingly parallel at any scale. The cluster-safe default
  * standing in for the reference's OSRM backend.
  */
class GreatCircleRouter(val speedMps: Double = 25.0) extends Router {

  override def route(lon1: Double, lat1: Double, lon2: Double, lat2: Double): RouteLeg = {
    val d = graft.geom.Mercator.haversine(lon1, lat1, lon2, lat2)
    RouteLeg(d / speedMps, d, graft.geom.WKB.write(
      graft.geom.LineString(Array(lon1, lat1, lon2, lat2))))
  }

  override def routeExpr(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val d = haversineM(lon1, lat1, lon2, lat2)
    struct(
      (d / lit(speedMps)).as("duration"),
      d.as("distance"),
      st_makeline(st_point(lon1, lat1), st_point(lon2, lat2)).as("geometry"),
      lit(0.0).as("snap_source"),
      lit(0.0).as("snap_dest"))
  }
}

/** erde routing-op equivalents: route / table / isochrone
  * (reference: erde/op/route.py, erde/op/table.py:126, erde/op/isochrone.py).
  */
object Routing {

  /** Per-row routing (reference: erde/op/route.py): adds `duration` (s),
    * `distance` (m) and a `route_geometry` WKB column.
    */
  def route(
      df: DataFrame,
      fromLon: Column, fromLat: Column, toLon: Column, toLat: Column,
      router: Router = new GreatCircleRouter()): DataFrame =
    df.withColumn("__r", router.routeExpr(fromLon, fromLat, toLon, toLat))
      .withColumn("duration", col("__r.duration"))
      .withColumn("distance", col("__r.distance"))
      .withColumn("route_geometry", col("__r.geometry"))
      .drop("__r")

  /** Per-row routing with alternatives (reference: erde/op/route.py
    * `alternatives=N`): one output row per (input row, alternative), with
    * `alt_index` 0 = best. Deterministic routers yield one row per input.
    */
  def routeAlternatives(
      df: DataFrame,
      fromLon: Column, fromLat: Column, toLon: Column, toLat: Column,
      maxAlternatives: Int = 3,
      router: Router = new GreatCircleRouter()): DataFrame = {
    val u = udf { (a: Double, b: Double, c: Double, d: Double) =>
      router.alternatives(a, b, c, d, maxAlternatives)
        .map(l => (l.durationS, l.distanceM, l.wkb))
    }
    df.withColumn("__alts", u(fromLon, fromLat, toLon, toLat))
      .select(col("*"), posexplode(col("__alts")).as(Seq("alt_index", "__r")))
      .withColumn("duration", col("__r._1"))
      .withColumn("distance", col("__r._2"))
      .withColumn("route_geometry", col("__r._3"))
      .drop("__alts", "__r")
  }

  /** Routes along a multi-waypoint LineString (reference: erde/op/route.py —
    * erde posts a geometry's waypoints to OSRM; the deterministic equivalent
    * is the great-circle path length over consecutive waypoints, computed by
    * one codegen'd expression, no per-segment explode).
    */
  def routeLine(
      df: DataFrame,
      geomCol: String = "geometry",
      speedMps: Double = 25.0): DataFrame =
    df.withColumn("distance", st_haversine_length(col(geomCol)))
      .withColumn("duration", col("distance") / lit(speedMps))

  /** N×M duration/distance matrix (reference: erde/op/table.py:126).
    *
    * erde chunks the pair space client-side (`max_table_size`); on Spark the
    * cross join *is* that chunking — each task routes one partition-pair.
    * Pass a broadcast-sized `dests` (dims, hubs) and Spark never shuffles the
    * big side at all.
    */
  def tableRoute(
      sources: DataFrame,
      dests: DataFrame,
      srcLon: String, srcLat: String, dstLon: String, dstLat: String,
      router: Router = new GreatCircleRouter(),
      destSuffix: String = "_dest",
      withGeometry: Boolean = false): DataFrame = {
    val clash = sources.columns.toSet
    val renamed = dests.columns.foldLeft(dests) { (df, c0) =>
      if (clash(c0)) df.withColumnRenamed(c0, c0 + destSuffix) else df
    }
    val dLon = if (clash(dstLon)) dstLon + destSuffix else dstLon
    val dLat = if (clash(dstLat)) dstLat + destSuffix else dstLat
    val joined = sources.crossJoin(broadcast(renamed))
      .withColumn("__r", router.routeExpr(col(srcLon), col(srcLat), col(dLon), col(dLat)))
      .withColumn("duration", col("__r.duration"))
      .withColumn("distance", col("__r.distance"))
      .withColumn("snap_source", col("__r.snap_source"))
      .withColumn("snap_dest", col("__r.snap_dest"))
    (if (withGeometry) joined.withColumn("route_geometry", col("__r.geometry")) else joined)
      .drop("__r")
  }

  /** Grid half-extent covering `speedMps`·max(durations) metres at `stepDeg`
    * resolution (reference: erde/op/isochrone.py sizes its grid from
    * speed·duration) — ~111.32 km per degree at the equator, padded one cell.
    */
  def gridHalfCells(durationsS: Seq[Double], speedMps: Double, stepDeg: Double,
      latDeg: Double = 0.0): Int = {
    // longitude degrees shrink by cos(lat) — size the half-extent so the
    // east-west reach is still covered away from the equator (the grid is
    // square in degrees, so this over-covers north-south; contours clip
    // correctly either way, under-coverage would clip them at the edge).
    val cos = math.max(math.cos(math.toRadians(latDeg)), 0.01)
    val reachDeg = speedMps * durationsS.max / (111320.0 * cos)
    math.max(1, math.ceil(reachDeg / stepDeg).toInt + 1)
  }

  /** Isochrone contour polygons (reference: erde/op/isochrone.py — the full
    * pipeline: duration field on a routed grid, raster interpolation
    * (isochrone.py:196-208, Triangulation + LinearTriInterpolator onto a
    * linspace raster), contour per level). The grid is routed distributed;
    * each source's (2h+1)² duration samples collect into one row (small,
    * bounded state), the contour expression interpolates them onto a
    * `rasterRefine`×-finer raster through the lattice triangulation and
    * marches squares at raster resolution — sources stay embarrassingly
    * parallel. rasterRefine = 1 skips interpolation (contours the samples
    * directly).
    */
  def isochroneContours(
      sources: DataFrame,
      srcLon: String, srcLat: String,
      durationsS: Seq[Double],
      router: Router = new GreatCircleRouter(),
      stepDeg: Double = 0.05,
      halfCells: Int = 8,
      keyCols: Seq[String] = Nil,
      walkSpeedMps: Double = 1.0,
      rasterRefine: Int = 4): DataFrame = {
    import graft.functions.ContourFunctions.iso_contour
    val keys = if (keyCols.nonEmpty) keyCols else sources.columns.toSeq
    val grid = sources
      .withColumn("__i", explode(sequence(lit(-halfCells), lit(halfCells))))
      .withColumn("__j", explode(sequence(lit(-halfCells), lit(halfCells))))
      .withColumn("__plon", col(srcLon) + col("__i") * lit(stepDeg))
      .withColumn("__plat", col(srcLat) + col("__j") * lit(stepDeg))
      .withColumn("__leg", router.routeExpr(col(srcLon), col(srcLat), col("__plon"), col("__plat")))
      .withColumn("__dur", col("__leg.duration") +
        (col("__leg.snap_source") + col("__leg.snap_dest")) / lit(walkSpeedMps))
    val collected = grid
      .groupBy(keys.map(col): _*)
      .agg(
        collect_list(struct(col("__i"), col("__j"), col("__dur"))).as("__grid"),
        first(col(srcLon)).as("__lon"), first(col(srcLat)).as("__lat"))
    collected
      .withColumn("level_s", explode(lit(durationsS.toArray)))
      .withColumn("geometry", iso_contour(col("__grid"), lit(halfCells),
        col("__lon"), col("__lat"), lit(stepDeg), col("level_s"), lit(rasterRefine)))
      .drop("__grid", "__lon", "__lat")
  }

  /** Isochrone cells (reference: erde/op/isochrone.py — hex grid sized by
    * speed·duration, route source→grid, keep cells within each duration
    * level). The grid is generated *distributed* (`sequence` + `explode`
    * per source — no driver loop), routed with the router's column
    * expression, and aggregated per (source, level).
    *
    * Returns one row per source row × duration level with `n_cells` and a
    * dissolved MultiPolygon of the reachable cells.
    */
  def isochrone(
      sources: DataFrame,
      srcLon: String, srcLat: String,
      durationsS: Seq[Double],
      router: Router = new GreatCircleRouter(),
      stepDeg: Double = 0.05,
      halfCells: Int = 8,
      keyCols: Seq[String] = Nil,
      withGeometry: Boolean = true,
      walkSpeedMps: Double = 1.0,
      gridShape: String = "square"): DataFrame = {
    require(Set("square", "hex")(gridShape), s"gridShape '$gridShape' (square|hex)")
    val keys = if (keyCols.nonEmpty) keyCols else sources.columns.toSeq
    // hex = offset rows (reference erde/op/isochrone.py routes a hex point
    // grid): odd rows shift half a step in lon, row spacing √3/2·step — same
    // point density shape as the reference's hexagonal sampling
    val hex = gridShape == "hex"
    val lonOff =
      if (hex) col("__i") + (abs(col("__j")) % 2) * lit(0.5) else col("__i")
    val latStepDeg = if (hex) stepDeg * math.sqrt(3) / 2 else stepDeg
    val grid = sources
      .withColumn("__i", explode(sequence(lit(-halfCells), lit(halfCells))))
      .withColumn("__j", explode(sequence(lit(-halfCells), lit(halfCells))))
      .withColumn("__plon", col(srcLon) + lonOff * lit(stepDeg))
      .withColumn("__plat", col(srcLat) + col("__j") * lit(latStepDeg))
      // full_duration = duration + snap penalty (reference: erde/op/isochrone.py)
      .withColumn("__leg", router.routeExpr(col(srcLon), col(srcLat), col("__plon"), col("__plat")))
      .withColumn("__dur", col("__leg.duration") + (col("__leg.snap_source") + col("__leg.snap_dest")) / lit(walkSpeedMps))
      .withColumn("level_s", explode(lit(durationsS.toArray)))
      .where(col("__dur") <= col("level_s"))
    val half = lit(stepDeg / 2)
    val cellPoly = st_envelope(st_makeline(
      st_point(col("__plon") - half, col("__plat") - half),
      st_point(col("__plon") + half, col("__plat") + half)))
    val aggs =
      if (withGeometry) Seq(count(lit(1)).as("n_cells"), UnionAgg.unionAgg(cellPoly).as("geometry"))
      else Seq(count(lit(1)).as("n_cells"))
    grid.groupBy((keys.map(col) :+ col("level_s")): _*).agg(aggs.head, aggs.tail: _*)
  }
}
