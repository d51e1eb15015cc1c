package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for named queries to files in one session:
  * `runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]`
  * producing `<outDir>/<query>_<suffix>.txt` — the round's plan artifacts
  * (plans/rNN/<query>_before|after.txt) without one JVM per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    graft.localScratchConfigs.foreach { case (k, v) => builder.config(k, v) } // local-master harness: tmpfs scratch
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"dumped $name")
      } catch { case e: Exception => println(s"FAILED $name: ${e.getMessage}") }
      // plan-only consumer: release operator-internal caches the query
      // registered for its (never-run) action (Caches contract)
      graft.operators.Caches.releaseAll()
    }
    spark.stop()
  }
}
