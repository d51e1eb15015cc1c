package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspector: `runMain graft.tools.Profile <query> <sfDir>`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    graft.localScratchConfigs.foreach { case (k, v) => builder.config(k, v) } // local-master harness: tmpfs scratch
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run $i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    spark.stop()
  }
}
