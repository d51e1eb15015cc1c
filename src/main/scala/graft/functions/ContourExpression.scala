package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.geom.{Contour, WKB}

/** Marching-squares contour of a collected duration grid: one evaluation per
  * (source, level) group — cold path, CodegenFallback is fine here.
  *
  * children: (grid array<struct<i:int, j:int, v:double>>, halfCells int,
  * lon double, lat double, stepDeg double, level double, refine int); grid
  * indices run [-halfCells, halfCells]. Missing nodes are treated as
  * unreachable (+∞). refine > 1 first interpolates the samples onto an
  * refine×-finer raster through the lattice triangulation
  * ([[Contour.interpolate]] — the reference's LinearTriInterpolator stage)
  * and marches squares at raster resolution.
  */
case class IsoContour(children: Seq[Expression]) extends Expression with CodegenFallback {
  require(children.length == 7, "iso_contour(grid, halfCells, lon, lat, step, level, refine)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val evals = children.map(_.eval(input))
    if (evals.exists(_ == null)) return null
    val grid = evals(0).asInstanceOf[ArrayData]
    val h = evals(1).asInstanceOf[Int]
    val lon = evals(2).asInstanceOf[Double]
    val lat = evals(3).asInstanceOf[Double]
    val step = evals(4).asInstanceOf[Double]
    val level = evals(5).asInstanceOf[Double]
    val refine = evals(6).asInstanceOf[Int]

    val n = 2 * h + 1
    val samples = Array.fill(n, n)(Double.PositiveInfinity)
    var r = 0
    while (r < grid.numElements()) {
      val row = grid.getStruct(r, 3)
      samples(row.getInt(0) + h)(row.getInt(1) + h) = row.getDouble(2)
      r += 1
    }
    val (vals, cellStep) =
      if (refine > 1) (Contour.interpolate(samples, refine), step / refine)
      else (samples, step)
    WKB.write(Contour.filled(vals, lon - h * step, lat - h * step, cellStep, level))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IsoContour = copy(children = newChildren)
}

object ContourFunctions {
  def iso_contour(grid: Column, halfCells: Column, lon: Column, lat: Column,
      step: Column, level: Column, refine: Column): Column =
    ColumnBridge.column(IsoContour(
      Seq(grid, halfCells.cast("int"), lon.cast("double"), lat.cast("double"),
        step.cast("double"), level.cast("double"), refine.cast("int")).map(ColumnBridge.expression)))
}
