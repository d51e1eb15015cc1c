package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

/** graft's SQL surface: geometry functions as `Column`s (native Catalyst
  * expressions over WKB) plus numeric geo math composed purely from Spark
  * built-ins (haversine, mercator projection of lon/lat columns) so the
  * numeric paths never leave WholeStageCodegen and never touch a geometry
  * object.
  *
  * `registerAll(spark)` exposes everything to `spark.sql(...)` too.
  */
object GeoFunctions {

  private def e(c: Column): Expression = ColumnBridge.expression(c)
  private def c(x: Expression): Column = ColumnBridge.column(x)
  /** Numeric args are cast explicitly (the expressions skip Catalyst's
    * implicit-cast machinery, whose types are `private[sql]`).
    */
  private def ed(c: Column): Expression = Cast(e(c), DoubleType)
  private def ei(c: Column): Expression = Cast(e(c), IntegerType)

  // ---- constructors / accessors -------------------------------------------
  def st_point(x: Column, y: Column): Column = c(StPoint(ed(x), ed(y)))
  def st_geomfromtext(wkt: Column): Column = c(StGeomFromText(e(wkt)))
  /** Null on malformed WKT — the ingest-safe parse for dirty data. */
  def st_try_geomfromtext(wkt: Column): Column = c(StTryGeomFromText(e(wkt)))
  def st_astext(g: Column): Column = c(StAsText(e(g)))
  /** WKB is graft's native representation: these are identity casts, present
    * for API parity with reference IO (parquet/WKB boundary).
    */
  def st_geomfromwkb(b: Column): Column = b.cast("binary")
  def st_aswkb(g: Column): Column = g.cast("binary")
  def st_x(g: Column): Column = c(StX(e(g)))
  def st_y(g: Column): Column = c(StY(e(g)))
  def st_geomtype(g: Column): Column = c(StGeomType(e(g)))
  def st_npoints(g: Column): Column = c(StNumPoints(e(g)))
  def st_isempty(g: Column): Column = c(StIsEmpty(e(g)))
  def st_centroid(g: Column): Column = c(StCentroid(e(g)))
  def st_envelope(g: Column): Column = c(StEnvelope(e(g)))
  def st_bbox(g: Column): Column = c(StBBox(e(g)))
  def st_makeline(a: Column, b: Column): Column = c(StMakeLine(e(a), e(b)))

  // ---- measures -----------------------------------------------------------
  def st_area(g: Column): Column = c(StAreaPlanar(e(g)))
  /** erde m² semantics (reference: erde/op/area.py). */
  def st_aream(g: Column): Column = c(StAreaM(e(g)))
  def st_length(g: Column): Column = c(StLengthPlanar(e(g)))
  /** erde m semantics (reference: erde/op/length.py). */
  def st_lengthm(g: Column): Column = c(StLengthM(e(g)))
  def st_coslat(g: Column): Column = c(StCosLat(e(g)))
  def st_distance(a: Column, b: Column): Column = c(StDistance(e(a), e(b)))
  /** Morton (Z-order) key of a lon/lat pair — see [[graft.geom.ZOrder]]. */
  def st_zorder(lon: Column, lat: Column, bits: Int = 16): Column =
    c(StZOrder(ed(lon), ed(lat), bits))
  /** Hilbert key of a lon/lat pair — see [[graft.geom.Hilbert]]. */
  def st_hilbert(lon: Column, lat: Column, bits: Int = 16): Column =
    c(StHilbert(ed(lon), ed(lat), bits))
  /** Base32 geohash of a lon/lat pair (standard Niemeyer cells). */
  def st_geohash(lon: Column, lat: Column, chars: Int = 9): Column =
    c(StGeohash(ed(lon), ed(lat), chars))
  /** Geohash cell-center point (WKB). */
  def st_geohash_decode(h: Column): Column = c(StGeohashDecode(e(h)))

  // ---- CRS ----------------------------------------------------------------
  private def epsgOf(crs: String): Int = {
    val code = crs.toUpperCase(java.util.Locale.ROOT).stripPrefix("EPSG:")
    try code.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"CRS '$crs' is not an EPSG code")
    }
  }

  /** Supported: 4326 ⇄ 3857 (Web Mercator), 4326 ⇄ UTM zones (EPSG:
    * 32601–32660 north, 32701–32760 south), and the parameterized-projection
    * registry (EPSG:27700 British National Grid incl. the OSGB36 Helmert
    * datum shift, 2154 Lambert-93, 3035 LAEA Europe, 25828–25838 ETRS89/UTM);
    * any pair of supported codes composes through 4326. Reference:
    * erde/op/convert.py:5 (pyproj pass-through).
    */
  def st_transform(g: Column, fromCrs: String, toCrs: String): Column =
    if (epsgOf(fromCrs) == epsgOf(toCrs)) g
    else c(transformExpr(e(g), epsgOf(fromCrs), epsgOf(toCrs)))

  /** Expression-level dispatch (shared with the SQL registration). */
  private[graft] def transformExpr(g: Expression, from: Int, to: Int): Expression = {
    import graft.geom.Projections.{supported => proj}
    import graft.geom.TransverseMercator.utmZoneOf
    def to4326(code: Int, g0: Expression): Option[Expression] = code match {
      case 4326 => Some(g0)
      case 3857 => Some(StToLonLat(g0))
      case t if utmZoneOf(t).isDefined =>
        val (z, s) = utmZoneOf(t).get; Some(StUtm(g0, z, s, invert = true))
      case t if proj(t) => Some(StCrsProj(g0, t, invert = true))
      case _ => None
    }
    def from4326(code: Int, g0: Expression): Option[Expression] = code match {
      case 4326 => Some(g0)
      case 3857 => Some(StToMercator(g0))
      case t if utmZoneOf(t).isDefined =>
        val (z, s) = utmZoneOf(t).get; Some(StUtm(g0, z, s, invert = false))
      case t if proj(t) => Some(StCrsProj(g0, t, invert = false))
      case _ => None
    }
    if (from == to) g
    else (for { mid <- to4326(from, g); out <- from4326(to, mid) } yield out).getOrElse(
      throw new IllegalArgumentException(
        s"unsupported CRS pair EPSG:$from -> EPSG:$to " +
          "(4326, 3857, UTM 326xx/327xx, 27700, 2154, 3035, 5070, 3577, 258xx)"))
  }

  // ---- predicates ---------------------------------------------------------
  def st_intersects(a: Column, b: Column): Column = c(StIntersects(e(a), e(b)))
  def st_within(a: Column, b: Column): Column = c(StWithin(e(a), e(b)))
  def st_contains(a: Column, b: Column): Column = c(StContains(e(a), e(b)))

  // ---- boolean ops (areal, slab-exact) -------------------------------------
  def st_intersection(a: Column, b: Column): Column = c(StIntersection(e(a), e(b)))
  def st_difference(a: Column, b: Column): Column = c(StDifference(e(a), e(b)))
  def st_union(a: Column, b: Column): Column = c(StUnionPair(e(a), e(b)))

  // ---- buffer -------------------------------------------------------------
  def st_buffer(g: Column, radius: Column, resolution: Column): Column =
    c(StBuffer(e(g), ed(radius), ei(resolution)))
  /** erde metre semantics (reference: erde/op/buffer.py:44). */
  def st_bufferm(g: Column, radiusMetres: Column, resolution: Column): Column =
    c(StBufferM(e(g), ed(radiusMetres), ei(resolution)))
  def st_bufferm(g: Column, radiusMetres: Column, resolution: Column, capStyle: Column): Column =
    c(StBufferMStyled(e(g), ed(radiusMetres), ei(resolution), e(capStyle)))

  /** Douglas–Peucker simplification (tolerance in coordinate units). */
  def st_simplify(g: Column, tolerance: Column): Column = c(StSimplify(e(g), ed(tolerance)))

  /** Great-circle metres along a LineString's waypoints. */
  def st_haversine_length(g: Column): Column = c(StHaversineLength(e(g)))

  /** Google encoded-polyline codec (reference: erde/utils.py). */
  def st_polyline_encode(g: Column): Column = c(StPolylineEncode(e(g)))
  def st_polyline_decode(s: Column): Column = c(StPolylineDecode(e(s)))

  /** Geometry constructors from flat [x0,y0,x1,y1,…] coordinate arrays —
    * the OSM way-assembly path (reference pipeline's ogr2ogr stage).
    * The polygon ring closes automatically.
    */
  def st_line_from_coords(a: Column): Column =
    c(StLineFromCoords(e(a.cast("array<double>"))))
  def st_polygon_from_coords(a: Column): Column =
    c(StPolygonFromCoords(e(a.cast("array<double>"))))

  /** Relation-layer constructors (OSM multipolygon / route relations):
    * member roles × member coord paths → MultiPolygon; member coord paths →
    * MultiLineString. Null (dropped feature) on incomplete members.
    */
  def st_relation_multipolygon(roles: Column, lines: Column): Column =
    c(StRelationMultipolygon(e(roles.cast("array<string>")), e(lines.cast("array<array<double>>"))))
  def st_multiline_from_lines(lines: Column): Column =
    c(StMultilineFromLines(e(lines.cast("array<array<double>>"))))

  // ---- grid (spatial-join partitioning) -----------------------------------
  def st_cellcover(g: Column, cellDeg: Column): Column = c(StCellCover(e(g), ed(cellDeg)))
  def st_snaptogrid(g: Column, size: Column): Column = c(StSnapToGrid(e(g), ed(size)))
  def st_subdivide(g: Column, maxVertices: Column): Column =
    c(StSubdivide(e(g), Cast(e(maxVertices), IntegerType)))
  def st_cellof(lon: Column, lat: Column, cellDeg: Column): Column =
    c(StCellOf(ed(lon), ed(lat), ed(cellDeg)))

  // ---- numeric geo math: pure built-in compositions (full codegen) --------

  /** Great-circle metres between lon/lat columns — composed from built-ins so
    * it inlines into WholeStageCodegen and pushes down like any arithmetic.
    */
  def haversineM(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = lit(6371008.8)
    val p1 = radians(lat1); val p2 = radians(lat2)
    val a = pow(sin((p2 - p1) / 2), 2) +
      cos(p1) * cos(p2) * pow(sin((radians(lon2) - radians(lon1)) / 2), 2)
    lit(2) * r * asin(least(lit(1.0), sqrt(a)))
  }

  /** Web-Mercator x/y of lon/lat columns (numeric, codegen'd). */
  def mercX(lon: Column): Column = lit(graft.geom.Mercator.R) * radians(lon)
  def mercY(lat: Column): Column = {
    val clamped = least(lit(85.06), greatest(lit(-85.06), lat))
    lit(graft.geom.Mercator.R) * log(tan(lit(math.Pi / 4) + radians(clamped) / 2))
  }

  /** Registers every function for `spark.sql` use (temp functions, session
    * scope) — the zero-config path; cluster deployments can instead install
    * [[graft.GraftExtensions]] via `spark.sql.extensions`.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def r1(name: String, b: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => b(args.head) }, "scala_udf")
    def r2(name: String, b: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => b(args(0), args(1)) }, "scala_udf")
    def r3(name: String, b: (Expression, Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => b(args(0), args(1), args(2)) }, "scala_udf")

    r2("st_point", (x, y) => StPoint(Cast(x, DoubleType), Cast(y, DoubleType)))
    r1("st_geomfromtext", StGeomFromText.apply)
    r1("st_try_geomfromtext", StTryGeomFromText.apply)
    r1("st_astext", StAsText.apply)
    r1("st_x", StX.apply)
    r1("st_y", StY.apply)
    r1("st_geomtype", StGeomType.apply)
    r1("st_npoints", StNumPoints.apply)
    r1("st_isempty", StIsEmpty.apply)
    r1("st_geomfromgeojson", StGeomFromGeoJson.apply)
    r1("st_try_geomfromgeojson", StTryGeomFromGeoJson.apply)
    r1("st_asgeojson", StAsGeoJson.apply)
    r1("st_centroid", StCentroid.apply)
    r1("st_envelope", StEnvelope.apply)
    r1("st_bbox", StBBox.apply)
    r1("st_area", StAreaPlanar.apply)
    r1("st_aream", StAreaM.apply)
    r1("st_length", StLengthPlanar.apply)
    r1("st_lengthm", StLengthM.apply)
    r1("st_coslat", StCosLat.apply)
    r1("st_tomercator", StToMercator.apply)
    r1("st_tolonlat", StToLonLat.apply)
    r1("st_haversine_length", StHaversineLength.apply)
    r2("st_simplify", (g, t) => StSimplify(g, Cast(t, DoubleType)))
    r1("st_polyline_encode", StPolylineEncode.apply)
    r1("st_polyline_decode", StPolylineDecode.apply)
    r1("st_line_from_coords", a => StLineFromCoords(Cast(a, ArrayType(DoubleType))))
    r1("st_polygon_from_coords", a => StPolygonFromCoords(Cast(a, ArrayType(DoubleType))))
    r2("st_relation_multipolygon", (r, l) => StRelationMultipolygon(
      Cast(r, ArrayType(StringType)), Cast(l, ArrayType(ArrayType(DoubleType)))))
    r1("st_multiline_from_lines", l => StMultilineFromLines(Cast(l, ArrayType(ArrayType(DoubleType)))))
    r2("st_distance", StDistance.apply)
    r2("st_makeline", StMakeLine.apply)
    r2("st_intersects", StIntersects.apply)
    r2("st_within", StWithin.apply)
    r2("st_contains", StContains.apply)
    r2("st_intersection", StIntersection.apply)
    r2("st_difference", StDifference.apply)
    r2("st_union", StUnionPair.apply)
    r3("st_buffer", (g, r, n) => StBuffer(g, Cast(r, DoubleType), Cast(n, IntegerType)))
    r3("st_bufferm", (g, r, n) => StBufferM(g, Cast(r, DoubleType), Cast(n, IntegerType)))
    r2("st_cellcover", (g, cd) => StCellCover(g, Cast(cd, DoubleType)))
    r2("st_subdivide", (g, mv) => StSubdivide(g, Cast(mv, IntegerType)))
    r2("st_snaptogrid", (g, sz) => StSnapToGrid(g, Cast(sz, DoubleType)))
    r3("st_cellof", (x, y, cd) => StCellOf(Cast(x, DoubleType), Cast(y, DoubleType), Cast(cd, DoubleType)))
    r2("st_to_utm", (g, epsg) => GeoFunctions.utmExpr(g, epsg, invert = false))
    r2("st_from_utm", (g, epsg) => GeoFunctions.utmExpr(g, epsg, invert = true))
    r3("st_transform", GeoFunctions.transformFromLiterals)
    r3("st_zorder", GeoFunctions.curveFromLiterals(StZOrder.apply))
    r3("st_hilbert", GeoFunctions.curveFromLiterals(StHilbert.apply))
    r3("st_geohash", GeoFunctions.curveFromLiterals(StGeohash.apply))
    r1("st_geohash_decode", StGeohashDecode.apply)
  }

  /** SQL builder for the curve keys: bits must be a literal (baked into
    * codegen).
    */
  private[graft] def curveFromLiterals(make: (Expression, Expression, Int) => Expression)(
      lon: Expression, lat: Expression, bits: Expression): Expression = {
    require(bits.foldable, "curve key: bits must be a literal")
    val b = bits.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"curve key: bad bits argument $other")
    }
    make(Cast(lon, DoubleType), Cast(lat, DoubleType), b)
  }

  /** SQL builder for st_transform: CRS codes must be literal ints or
    * 'EPSG:nnnn' strings (the dispatch is baked in at plan time).
    */
  private[graft] def transformFromLiterals(g: Expression, from: Expression,
      to: Expression): Expression = {
    require(from.foldable && to.foldable, "st_transform: CRS codes must be literals")
    def code(x: Expression): Int = x.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: org.apache.spark.unsafe.types.UTF8String =>
        s.toString.toUpperCase(java.util.Locale.ROOT).stripPrefix("EPSG:").toInt
      case other => throw new IllegalArgumentException(s"st_transform: bad CRS argument $other")
    }
    transformExpr(g, code(from), code(to))
  }

  /** SQL builder for the UTM expressions: the EPSG code must be a literal
    * (the zone is baked into the generated code).
    */
  private[graft] def utmExpr(g: Expression, epsg: Expression, invert: Boolean): Expression = {
    require(epsg.foldable, "st_to_utm/st_from_utm: the EPSG code must be a literal")
    val code = epsg.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: org.apache.spark.unsafe.types.UTF8String =>
        s.toString.toUpperCase(java.util.Locale.ROOT).stripPrefix("EPSG:").toInt
      case other => throw new IllegalArgumentException(s"st_*_utm: bad EPSG argument $other")
    }
    val (zone, south) = graft.geom.TransverseMercator.utmZoneOf(code).getOrElse(
      throw new IllegalArgumentException(s"EPSG:$code is not a UTM zone (32601-60 / 32701-60)"))
    StUtm(g, zone, south, invert)
  }
}
