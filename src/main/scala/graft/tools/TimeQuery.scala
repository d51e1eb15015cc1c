package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one SparkEntry query: `runMain graft.tools.TimeQuery <name> [sfDir] [runs]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    graft.localScratchConfigs.foreach { case (k, v) => builder.config(k, v) } // local-master harness: tmpfs scratch
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)
    for (i <- 0 until runs) {
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
