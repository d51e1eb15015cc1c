import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

package object graft {
  /** Path of a driver-generated test table under an sf dir. */
  def tablePath(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Normalizes an event-table `ts` column to TimestampType regardless of
    * how the generator stamped it: nanosecond longs (parquet TIMESTAMP(NANOS)
    * under `spark.sql.legacy.parquet.nanosAsLong=true`), microsecond
    * TIMESTAMP_NTZ (isAdjustedToUTC=false), or already TIMESTAMP. The NTZ
    * cast reinterprets wall-clock fields in the session zone — UTC here
    * (sessionConfigs), matching DuckDB's naive-timestamp read of the same
    * file.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      // `div`, not `/`: Spark's `/` is double division, and a 2024-epoch
      // nanosecond count (~1.7e18) exceeds double's 2^53 integer range, so
      // the quotient wobbles ±1 µs vs DuckDB's exact epoch_us truncation.
      // Backticks: the column name lands in SQL text, so reserved words /
      // spaced names must parse as one identifier.
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType => df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }

  /** Reads a test table; normalizes the events `ts` column back to
    * TimestampType so downstream window/date functions see real timestamps.
    */
  def readTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(tablePath(dir, name))
    if (name == "events") normalizeTs(df) else df
  }

  /** Session configs every graft entrypoint needs. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
  )
}
