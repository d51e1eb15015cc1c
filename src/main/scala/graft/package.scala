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
    *
    * The driver's test tables are single-file, SINGLE-ROW-GROUP parquet, so
    * every scan is one task and per-row-heavy map stages above it (tokenize
    * + explode, geometry kernels, image decode) serialize on one core —
    * the "one huge unsplittable file" input-skew case of the optimization
    * guide (§2.5: repartition immediately after the read). One round-robin
    * exchange of the sub-10-MB input spreads that work across the session's
    * cores. Parameterised: SPARK_GRAFT_READ_SPREAD sets the partition
    * count (0 disables — a production table already arrives in many
    * splits; this exchange exists for unsplittable single-file inputs,
    * never for data that is born partitioned).
    */
  def readTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val raw = s.read.parquet(tablePath(dir, name))
    val df = if (name == "events") normalizeTs(raw) else raw
    // tolerant parse: a malformed env value degrades to the disabled
    // default instead of killing every entrypoint with NumberFormatException
    val spread = sys.env.get("SPARK_GRAFT_READ_SPREAD")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).filter(_ > 0).getOrElse(0)
    if (spread > 0) df.repartition(spread) else df
  }

  /** One round-robin exchange spreading an unsplittable single-file scan
    * across the session's cores — the guide §2.5 input-skew fix, applied
    * ONLY where a per-row-heavy map stage (image decode, chunk+tokenize)
    * sits directly on the one-task scan; a blanket spread measured as a net
    * loss (writers pay fan-out, shuffle-light paths pay the exchange).
    */
  def spreadScan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Session configs every graft entrypoint needs. Engine semantics and
    * planner policy only — NO machine-placement defaults: shuffle-scratch
    * location is an environment fact that must not follow the library onto
    * a cluster (see [[localScratchConfigs]]).
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" ->
      sys.env.getOrElse("SPARK_GRAFT_AQE", "true"),
    // Let the planner pick shuffled-hash over sort-merge when the per-
    // partition build side fits (guide §3.1) — skips two sorts per join.
    // Env-gated: a deployment on skewed / size-misestimated data can revert
    // to sort-merge's graceful spill without a code change.
    "spark.sql.join.preferSortMergeJoin" ->
      sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"),
  ) ++
    // explicit scratch override stays honored everywhere (a deliberate env
    // var is not an autodetect)
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").map("spark.local.dir" -> _).toMap

  /** Shuffle/spill scratch for LOCAL-MASTER harness sessions only (Bench,
    * Verify, the tools, the test harness): this sandbox's overlay /tmp
    * costs measured seconds of shuffle-write wait for MB-scale blocks, so
    * local runs put scratch on tmpfs when one is mounted (the "fast local
    * disks for shuffle" rule, guide §1.3/§2.1). Deliberately NOT part of
    * [[sessionConfigs]]: /dev/shm is mounted on essentially every Linux
    * node, and a silent RAM-backed spill default at 100 TB means OOM, not
    * speed — a cluster deployment provisions real scratch disks and never
    * applies this map. SPARK_GRAFT_LOCAL_DIR (via [[sessionConfigs]])
    * overrides it when set.
    */
  def localScratchConfigs: Map[String, String] =
    if (sys.env.contains("SPARK_GRAFT_LOCAL_DIR")) Map.empty
    else {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        Map("spark.local.dir" -> "/dev/shm/graft_spark_local")
      else Map.empty
    }
}
