package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.functions.GeoFunctions.{st_astext, st_geomfromtext}

/** Plain JSONL (one JSON object per line) — the LLM-corpus interchange
  * format (HuggingFace datasets, WebDataset manifests, crawl exports).
  * Thin over Spark's native json source on purpose: splittable reads,
  * sharded parallel writes, schema-on-read or explicit schema — the
  * distributed-format story is the engine's, this driver adds the graft
  * geometry convention (BinaryType WKB `geometry` travels as WKT text, the
  * same convention as the spreadsheet/CSV drivers).
  */
object Jsonl {

  /** Reads JSONL; pass `schema` to skip the inference pass (required at
    * 100 TB — inference scans the data once; a declared schema reads once).
    * A string `geometry` column parses from WKT back to WKB.
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val df = schema.fold(spark.read)(spark.read.schema(_)).json(path)
    if (df.columns.contains("geometry"))
      df.withColumn("geometry", st_geomfromtext(col("geometry")))
    else df
  }

  /** Writes JSONL part files (one object per line). `shards > 0` fixes the
    * output file count; 0 keeps the upstream partitioning (no extra
    * shuffle). WKB geometry is emitted as WKT text.
    */
  def write(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val hasWkb = df.schema.fields.exists(f =>
      f.name == "geometry" && f.dataType == BinaryType)
    val out0 = if (hasWkb) df.withColumn("geometry", st_astext(col("geometry"))) else df
    val out = if (shards > 0) out0.repartition(shards) else out0
    out.write.mode("overwrite").json(path)
  }
}
