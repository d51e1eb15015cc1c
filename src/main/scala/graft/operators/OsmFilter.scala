package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OSM tag filtering over tabular OSM elements (reference: erde/op/osm.py —
  * there a wrapper around external `osmium tags-filter`; graft re-expresses
  * the filter language as a Catalyst predicate over an elements table with
  * `type` (n/w/r) and `tags map<string,string>` columns, so it runs
  * distributed on parquet-ified OSM extracts with predicate pushdown).
  *
  * Spec syntax (osmium-compatible subset): `TYPES/KEY[=V1[,V2…]]` where TYPES
  * ⊆ {n,w,r} (empty = all), e.g. `"wr/highway=primary,secondary"`,
  * `"n/amenity"`. Multiple specs OR together.
  */
object OsmFilter {

  private[operators] final case class Spec(types: Set[String], key: String, values: Seq[String])

  private[operators] def parse(spec: String): Spec = {
    val (typesPart, tagPart) = spec.split("/", 2) match {
      case Array(t, rest) => (t, rest)
      case Array(rest) => ("", rest)
    }
    val types = typesPart.toLowerCase.filter("nwr".contains(_)).map(_.toString).toSet
    tagPart.split("=", 2) match {
      case Array(k, vs) => Spec(types, k, vs.split(",").toSeq.filter(_.nonEmpty))
      case Array(k) => Spec(types, k, Nil)
    }
  }

  private def predicate(s: Spec, typeCol: Column, tagsCol: Column): Column = {
    val tagOk =
      if (s.values.isEmpty) tagsCol.getItem(s.key).isNotNull
      else tagsCol.getItem(s.key).isin(s.values: _*)
    if (s.types.isEmpty) tagOk
    else typeCol.isin(s.types.toSeq: _*) && tagOk
  }

  /** Keeps elements matching any spec. */
  def tagFilter(
      df: DataFrame,
      specs: Seq[String],
      typeCol: String = "type",
      tagsCol: String = "tags"): DataFrame = {
    require(specs.nonEmpty, "at least one tag-filter spec required")
    val preds = specs.map(s => predicate(parse(s), col(typeCol), col(tagsCol)))
    df.where(preds.reduce(_ || _))
  }

  /** Projects selected tag keys into top-level columns (the usual step after
    * filtering, before joins/aggregations).
    */
  def tagsToColumns(df: DataFrame, keys: Seq[String], tagsCol: String = "tags"): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(tagsCol).getItem(k)))
}
