package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/** Dataframe-level geometry operators, the erde CLI-op equivalents
  * (reference: erde/op/area.py, erde/op/length.py, erde/op/buffer.py,
  * erde/op/convert.py, erde/utils.py:88 `lonlat2gdf`).
  *
  * All are narrow (per-row) transformations: no shuffle, fully parallel at
  * any scale; geometry stays WKB end to end.
  */
object GeoOps {

  /** Column of per-geometry area in m² (reference: erde/op/area.py — mercator
    * planar area × cos²(centroid lat)). `skipTransform` treats coordinates as
    * already-planar CRS units; `nullifyIrrelevant` yields null for geometries
    * with no areal component (points/lines) instead of 0.
    */
  def areaM(
      df: DataFrame,
      geom: String = "geometry",
      into: String = "area",
      skipTransform: Boolean = false,
      nullifyIrrelevant: Boolean = false): DataFrame = {
    val base = if (skipTransform) st_area(col(geom)) else st_aream(col(geom))
    val value =
      if (nullifyIrrelevant)
        when(st_geomtype(col(geom)).isin("Polygon", "MultiPolygon", "GeometryCollection"), base)
      else base
    df.withColumn(into, value)
  }

  /** Column of per-geometry length in m (reference: erde/op/length.py). */
  def lengthM(
      df: DataFrame,
      geom: String = "geometry",
      into: String = "length",
      skipTransform: Boolean = false,
      nullifyIrrelevant: Boolean = false): DataFrame = {
    val base = if (skipTransform) st_length(col(geom)) else st_lengthm(col(geom))
    val relevant = Seq("LineString", "MultiLineString", "Polygon", "MultiPolygon", "GeometryCollection")
    val value =
      if (nullifyIrrelevant) when(st_geomtype(col(geom)).isin(relevant: _*), base)
      else base
    df.withColumn(into, value)
  }

  /** Buffers every geometry by `radiusMetres` (reference: erde/op/buffer.py —
    * default resolution 10 arcs/90°). `dissolve` unions all buffers into a
    * single geometry: implemented as a two-level aggregation (partial unions
    * per partition, then one merge) so the driver never sees raw rows.
    */
  def bufferM(
      df: DataFrame,
      radiusMetres: Double,
      geom: String = "geometry",
      resolution: Int = 10,
      dissolve: Boolean = false,
      capStyle: String = "round",
      joinStyle: String = "round",
      mitreLimit: Double = 5.0): DataFrame = {
    val buffered =
      if (capStyle == "round" && joinStyle == "round")
        df.withColumn(geom, st_bufferm(col(geom), lit(radiusMetres), lit(resolution)))
      else
        df.withColumn(geom, st_bufferm(col(geom), lit(radiusMetres), lit(resolution),
          lit(s"$capStyle/$joinStyle/$mitreLimit")))
    if (!dissolve) buffered
    else buffered.agg(UnionAgg.unionAgg(col(geom)).as(geom))
  }

  /** CRS conversion (reference: erde/op/convert.py); 4326⇄3857. */
  def convert(df: DataFrame, fromCrs: String, toCrs: String, geom: String = "geometry"): DataFrame =
    df.withColumn(geom, st_transform(col(geom), fromCrs, toCrs))

  def toMercator(df: DataFrame, geom: String = "geometry"): DataFrame =
    convert(df, "EPSG:4326", "EPSG:3857", geom)

  def toLonLat(df: DataFrame, geom: String = "geometry"): DataFrame =
    convert(df, "EPSG:3857", "EPSG:4326", geom)

  /** Adds a WKB point column from lon/lat columns, auto-detecting the same
    * column-name combos as the reference (erde/utils.py:88 `lonlat2gdf`).
    */
  def lonlatToPoints(df: DataFrame, into: String = "geometry"): DataFrame = {
    val (lon, lat) = Ops.lonlatColumns(df)
    df.withColumn(into, st_point(lon.cast("double"), lat.cast("double")))
  }

  // ---- Z-order storage layout ---------------------------------------------

  /** Writes `df` as parquet clustered along the Morton curve of
    * (`lonCol`, `latCol`): range-partitioned then sorted within partitions on
    * the `__z` key, so each file and row group covers a compact z interval
    * and carries tight `__z` min/max stats. The 100 TB layout story: a bbox
    * read ([[readZOrdered]]) prunes files/row groups through ordinary
    * column-statistics pushdown — no spatial index, no library-side planner.
    * `partitions <= 0` keeps the session's shuffle parallelism.
    */
  def writeZOrdered(df: DataFrame, lonCol: String, latCol: String, path: String,
      bits: Int = 16, partitions: Int = 0, curve: String = "morton"): Unit = {
    val key = curveKey(curve, col(lonCol), col(latCol), bits)
    val z = df.withColumn("__z", key)
    val parted =
      if (partitions > 0) z.repartitionByRange(partitions, col("__z"))
      else z.repartitionByRange(col("__z"))
    parted.sortWithinPartitions("__z").write.mode("overwrite").parquet(path)
  }

  private def curveKey(curve: String, lon: Column, lat: Column, bits: Int): Column =
    curve match {
      case "morton" => st_zorder(lon, lat, bits)
      case "hilbert" => st_hilbert(lon, lat, bits)
      case other => throw new IllegalArgumentException(
        s"curve must be morton or hilbert, got $other")
    }

  private def curveCover(curve: String, minLon: Double, minLat: Double,
      maxLon: Double, maxLat: Double, bits: Int, maxRanges: Int): Seq[(Long, Long)] =
    curve match {
      case "morton" =>
        graft.geom.ZOrder.cover(minLon, minLat, maxLon, maxLat, bits, maxRanges = maxRanges)
      case "hilbert" =>
        graft.geom.Hilbert.cover(minLon, minLat, maxLon, maxLat, bits, maxRanges = maxRanges)
      case other => throw new IllegalArgumentException(
        s"curve must be morton or hilbert, got $other")
    }

  /** Reads a [[writeZOrdered]] layout restricted to a bbox: the bbox becomes
    * at most `maxRanges` contiguous z intervals (quadtree cover, driver-side
    * arithmetic only) OR-ed into one pushable `__z` predicate, plus the exact
    * lon/lat residual filter — so correctness never depends on the cover and
    * the scan skips every row group whose z stats miss the bbox.
    */
  def readZOrdered(spark: org.apache.spark.sql.SparkSession, path: String,
      lonCol: String, latCol: String,
      minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
      bits: Int = 16, maxRanges: Int = 32, curve: String = "morton"): DataFrame = {
    val ranges = curveCover(curve, minLon, minLat, maxLon, maxLat, bits, maxRanges)
    val zPred = ranges.map { case (lo, hi) => col("__z").between(lo, hi) }
      .reduce(_ || _)
    spark.read.parquet(path)
      .where(zPred)
      .where(col(lonCol) >= minLon && col(lonCol) <= maxLon &&
        col(latCol) >= minLat && col(latCol) <= maxLat)
      .drop("__z")
  }

  /** Areal interpolation — the polygon-to-polygon value transfer of
    * dasymetric GIS (census tracts → service zones): each target zone
    * receives Σ over intersecting source zones of
    * `value · area(source ∩ target) / area(source)` — the area-weighted
    * share under the uniform-density assumption. Boundary-touching pairs
    * contribute zero area and therefore zero value (kept, not special-
    * cased, so the pair predicate stays the plain `intersects`). Zero-area
    * sources (a point/line feature in the source layer, a degenerate
    * polygon) contribute zero rather than a NaN weight that would poison
    * the whole target zone's sum.
    *
    * Scale shape: candidate pairs come from [[SJoin.sjfull]]'s grid join
    * (cell-keyed equi-join, no cartesian); the clip + two areas are
    * codegen'd kernel calls per surviving pair, and the rollup is one
    * map-side-combined sum keyed on the target id.
    */
  def arealInterpolate(
      target: DataFrame,
      source: DataFrame,
      targetId: String,
      valueCol: String,
      into: String = "interpolated"): DataFrame = {
    import graft.functions.GeoFunctions._
    val pairs = SJoin.sjfull(target, source, predicate = "intersects", how = "inner")
    // the source geometry column as it survived sjfull's clash rename:
    // read it off the JOINED schema, not a re-guess of the rename rule
    val srcGeom =
      if (pairs.columns.contains("geometry_right")) "geometry_right" else "geometry"
    val srcArea = st_area(col(srcGeom))
    val w = when(srcArea > lit(0.0),
      st_area(st_intersection(col("geometry"), col(srcGeom))) / srcArea)
      .otherwise(lit(0.0))
    pairs.groupBy(col(targetId))
      .agg(sum(col(valueCol).cast("double") * w).as(into))
  }

  /** Flat-top hexagonal binning: appends axial cell coordinates
    * (`hex_q`, `hex_r`) for each (lon, lat) at cell `size` (the hexagon's
    * outer radius, in the input's units). The classic point-density /
    * choropleth aggregation — hexagons tile without the rectangle's
    * corner-distance bias. Pure codegen'd column arithmetic (fractional
    * axial transform + cube rounding); rounding is `floor(x + 0.5)`, never
    * a HALF_UP/HALF_EVEN library call, so any engine mirrors it literally.
    * Cell ids are data-independent — binning is a projection (no shuffle),
    * and the downstream per-cell aggregate is an ordinary map-side-combined
    * groupBy on two small longs.
    */
  def hexbin(df: DataFrame, lonCol: String, latCol: String,
      size: Double): DataFrame = {
    require(size > 0, "hex size must be positive")
    val x = col(lonCol).cast("double"); val y = col(latCol).cast("double")
    val qf = x * lit(2.0 / 3.0) / size
    val rf = (x * lit(-1.0 / 3.0) + y * lit(math.sqrt(3.0) / 3.0)) / size
    val zf = -qf - rf
    def rnd(c: Column): Column = floor(c + lit(0.5)) // -> long, ties toward +inf
    val (rq, rr, rz) = (rnd(qf), rnd(rf), rnd(zf))
    val (dq, dr, dz) = (abs(rq - qf), abs(rr - rf), abs(rz - zf))
    // cube-round: re-derive the axis with the largest rounding error from
    // the other two so q + r + z stays 0 (the hex-grid invariant)
    val qOut = when(dq > dr && dq > dz, -rr - rz).otherwise(rq)
    val rOut = when(!(dq > dr && dq > dz) && dr > dz, -rq - rz).otherwise(rr)
    df.withColumn("hex_q", qOut.cast("long"))
      .withColumn("hex_r", rOut.cast("long"))
  }
}
