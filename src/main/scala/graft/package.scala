import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

package object graft {
  /** Path of a driver-generated test table under an sf dir. */
  def tablePath(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Reads a test table; normalizes nanosecond timestamps (stored as long
    * when `spark.sql.legacy.parquet.nanosAsLong=true`) back to TimestampType
    * so downstream window/date functions see real timestamps.
    */
  def readTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(tablePath(dir, name))
    if (name == "events" && df.schema("ts").dataType == LongType)
      // `div`, not `/`: Spark's `/` is double division, and a 2024-epoch
      // nanosecond count (~1.7e18) exceeds double's 2^53 integer range, so
      // the quotient wobbles ±1 µs vs DuckDB's exact epoch_us truncation.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Session configs every graft entrypoint needs. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
  )
}
