package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.SJoin

/** Streaming geospatial operators: stream-static spatial joins. The static
  * side (zones, admin polygons — the dim table) is broadcast; the grid-cell
  * candidate join plus exact predicate is stateless, so it runs per
  * micro-batch with no streaming state at all. The streaming face of the
  * reference's "filter a stream of rows by geometry" pattern
  * (erde io geometry_filter + sjoin over chunked reads).
  */
object GeoStream {

  /** Stream rows joined to the static zones they match (inner). */
  def sjoinStream(
      stream: DataFrame,
      zones: DataFrame,
      predicate: String = "within",
      streamGeom: String = "geometry",
      zoneGeom: String = "geometry",
      cellDeg: Double = SJoin.DefaultCellDeg): DataFrame =
    SJoin.pairs(stream, zones, predicate, streamGeom, zoneGeom, cellDeg,
      tuning = SJoin.Tuning(broadcastRight = true))

  /** Stream rows that fall inside any zone (spatial filter; stream columns
    * only). Point streams map to exactly one grid cell, so no dedup state is
    * needed; wider stream geometries may match several zones and emit one row
    * per matching zone — follow with `dropDuplicates` under a watermark when
    * exact set semantics matter.
    */
  def sfilterStream(
      stream: DataFrame,
      zones: DataFrame,
      predicate: String = "within",
      streamGeom: String = "geometry",
      zoneGeom: String = "geometry",
      cellDeg: Double = SJoin.DefaultCellDeg): DataFrame = {
    val streamCols = stream.columns
    sjoinStream(stream, zones, predicate, streamGeom, zoneGeom, cellDeg)
      .select(streamCols.head, streamCols.tail.toIndexedSeq: _*)
  }
}
