package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Throwaway timing experiments (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val docs = graft.readTable(s, sfDir, "documents")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val n = Dedup.clusters(docs, "text", "doc_id", threshold = 0.7).count()
      println(f"clusters run $i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
    }
    s.stop()
  }
}
