package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7 (plan).
  *
  * Every implemented operator gets a `queries` entry (Spark plan over the
  * driver's parquet tables) and, when SQL-expressible, a matching `oracleSql`
  * entry (plain SQL run by DuckDB on the same tables). Column names are
  * aligned on both sides because the driver compares by sorted column name.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    readTable(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("dedup_exact")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- erde op/subset (erde/op/subset.py) -------------------------------
    "subset_cols" -> ((s, dir) =>
      Subset(t(s, dir, "customer"), "c_custkey: id, c_acctbal: bal, c_mktsegment")),

    // --- erde utils.crossjoin (erde/utils.py:73) --------------------------
    "crossjoin_count" -> ((s, dir) =>
      Ops.crossjoin(t(s, dir, "region"), t(s, dir, "nation"))
        .groupBy("r_name").agg(count(lit(1)).as("n"))),

    // --- erde utils.lookup (erde/utils.py:130) ----------------------------
    "lookup_first" -> ((s, dir) =>
      Ops.lookup(t(s, dir, "customer"), t(s, dir, "nation"),
          Seq("n_name"), "c_nationkey", "n_nationkey", "n_nationkey")
        .select("c_custkey", "n_name")),

    // --- dedup: exact (SURVEY §2 LLM-data-pipeline) -----------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), Seq("text"), "doc_id")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))),

    // --- windowed event aggregation (batch face of streaming module) ------
    "events_window" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("hour_ts"),
          col("event_type"), col("n_events"), col("sum_value"))
    }),
  )

  /** DuckDB-runnable SQL twin for each `queries` key (same column names). */
  def oracleSql: Map[String, String] = Map(
    "subset_cols" ->
      "SELECT c_custkey AS id, c_acctbal AS bal, c_mktsegment FROM customer",
    "crossjoin_count" ->
      "SELECT r_name, count(*) AS n FROM region CROSS JOIN nation GROUP BY r_name",
    "lookup_first" ->
      "SELECT c_custkey, n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey",
    "dedup_exact" ->
      """SELECT d.lang AS lang, count(*) AS n_docs
        |FROM documents d
        |JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
        |  ON d.doc_id = k.doc_id
        |GROUP BY d.lang""".stripMargin,
    "events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
