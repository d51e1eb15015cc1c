package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.{GeoJson, WKB}

/** Static bridge for the GeoJSON IO expressions (reference: erde/io geojson /
  * geojsonseq drivers — graft reads features with Spark's splittable text
  * sources and parses them with these codegen'd expressions).
  */
object GeoJsonKernel {

  def fromGeoJson(s: UTF8String): Array[Byte] = WKB.write(GeoJson.readGeometry(s.toString))

  /** Null on malformed input (ingest-safe variant). */
  def tryFromGeoJson(s: UTF8String): Array[Byte] =
    try fromGeoJson(s) catch { case _: Exception => null }

  def asGeoJson(b: Array[Byte]): UTF8String =
    UTF8String.fromString(GeoJson.writeGeometry(WKB.read(b)))

  private def featureObj(s: UTF8String): GeoJson.JObj =
    GeoJson.parse(s.toString).asInstanceOf[GeoJson.JObj]

  /** Geometry of a Feature (or a bare geometry object) → WKB. */
  def featureGeometry(s: UTF8String): Array[Byte] = {
    val o = featureObj(s)
    val g = o.fields.get("geometry") match {
      case Some(geom: GeoJson.JObj) => GeoJson.geomOf(geom)
      case _ => GeoJson.geomOf(o)
    }
    WKB.write(g)
  }

  /** Properties of a Feature → map<string,string> (scalars verbatim, nested
    * values re-serialized as JSON).
    */
  def featureProps(s: UTF8String): MapData = {
    val props = featureObj(s).fields.get("properties") match {
      case Some(GeoJson.JObj(fields)) => fields.toSeq
      case _ => Seq.empty
    }
    new ArrayBasedMapData(
      new GenericArrayData(props.map(p => UTF8String.fromString(p._1)).toArray[Any]),
      new GenericArrayData(props.map(p => UTF8String.fromString(GeoJson.stringify(p._2))).toArray[Any]))
  }

  /** FeatureCollection text → array of per-feature JSON strings. */
  def features(s: UTF8String): ArrayData = {
    val o = featureObj(s)
    val feats = o.fields.get("features") match {
      case Some(GeoJson.JArr(items)) => items.map(f => UTF8String.fromString(GeoJson.writeJson(f)))
      case _ => Seq.empty
    }
    new GenericArrayData(feats.toArray[Any])
  }

  /** (WKB geometry, map properties) → one Feature JSON line. */
  def toFeature(b: Array[Byte], props: MapData): UTF8String = {
    val sb = new StringBuilder("""{"type":"Feature","properties":{""")
    val keys = props.keyArray(); val vals = props.valueArray()
    var i = 0
    while (i < props.numElements()) {
      if (i > 0) sb += ','
      sb ++= GeoJson.quote(keys.getUTF8String(i).toString)
      sb += ':'
      val v = vals.getUTF8String(i)
      if (v == null) sb ++= "null" else sb ++= GeoJson.quote(v.toString)
      i += 1
    }
    sb ++= "},\"geometry\":"
    sb ++= GeoJson.writeGeometry(WKB.read(b))
    sb += '}'
    UTF8String.fromString(sb.toString)
  }
}

case class StGeomFromGeoJson(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(s: Any): Any =
    GeoJsonKernel.fromGeoJson(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoJsonKernel.fromGeoJson($c)")
  override def prettyName: String = "st_geomfromgeojson"
  override protected def withNewChildInternal(c: Expression): StGeomFromGeoJson = copy(child = c)
}

case class StTryGeomFromGeoJson(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    GeoJsonKernel.tryFromGeoJson(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoJsonKernel.tryFromGeoJson($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override def prettyName: String = "st_try_geomfromgeojson"
  override protected def withNewChildInternal(c: Expression): StTryGeomFromGeoJson = copy(child = c)
}

case class StAsGeoJson(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(b: Any): Any =
    GeoJsonKernel.asGeoJson(b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoJsonKernel.asGeoJson($c)")
  override def prettyName: String = "st_asgeojson"
  override protected def withNewChildInternal(c: Expression): StAsGeoJson = copy(child = c)
}

case class FeatureGeometry(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(s: Any): Any =
    GeoJsonKernel.featureGeometry(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoJsonKernel.featureGeometry($c)")
  override def prettyName: String = "feature_geometry"
  override protected def withNewChildInternal(c: Expression): FeatureGeometry = copy(child = c)
}

case class FeatureProps(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = MapType(StringType, StringType)
  override protected def nullSafeEval(s: Any): Any =
    GeoJsonKernel.featureProps(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoJsonKernel.featureProps($c)")
  override def prettyName: String = "feature_props"
  override protected def withNewChildInternal(c: Expression): FeatureProps = copy(child = c)
}

case class GeoJsonFeatures(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(s: Any): Any =
    GeoJsonKernel.features(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoJsonKernel.features($c)")
  override def prettyName: String = "geojson_features"
  override protected def withNewChildInternal(c: Expression): GeoJsonFeatures = copy(child = c)
}

case class ToGeoJsonFeature(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(b: Any, m: Any): Any =
    GeoJsonKernel.toFeature(b.asInstanceOf[Array[Byte]], m.asInstanceOf[MapData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, m) => s"graft.functions.GeoJsonKernel.toFeature($b, $m)")
  override def prettyName: String = "to_geojson_feature"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ToGeoJsonFeature =
    copy(l, r)
}

/** Column API for the GeoJSON expressions. */
object GeoJsonFunctions {
  private def e(c: Column) = ColumnBridge.expression(c)
  private def c(x: Expression) = ColumnBridge.column(x)

  def st_geomfromgeojson(s: Column): Column = c(StGeomFromGeoJson(e(s)))
  def st_try_geomfromgeojson(s: Column): Column = c(StTryGeomFromGeoJson(e(s)))
  def st_asgeojson(g: Column): Column = c(StAsGeoJson(e(g)))
  def feature_geometry(s: Column): Column = c(FeatureGeometry(e(s)))
  def feature_props(s: Column): Column = c(FeatureProps(e(s)))
  def geojson_features(s: Column): Column = c(GeoJsonFeatures(e(s)))
  def to_geojson_feature(g: Column, props: Column): Column = c(ToGeoJsonFeature(e(g), e(props)))
}
