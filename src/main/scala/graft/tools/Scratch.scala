package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Throwaway debugging experiments (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    graft.localScratchConfigs.foreach { case (k, v) => builder.config(k, v) } // local-master harness: tmpfs scratch
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      (10L, base + "family one"),
      (11L, base + "family one plus a much longer distinctive tail of words"),
      (12L, base + "family one b"),
      (50L, "a completely unrelated singleton document about catalyst rules"))
      .toDF("doc_id", "text")
    Dedup.clusters(docs, "text", "doc_id", threshold = 0.5)
      .select("doc_id", "cluster").orderBy("doc_id").show()
    Dedup.minhashLsh(docs, "text", "doc_id", threshold = 0.5).show()
    s.stop()
  }
}
