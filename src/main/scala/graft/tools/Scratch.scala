package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

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
    s.sparkContext.setLogLevel("ERROR")

    val docs = graft.readTable(s, sfDir, "documents")
    // how many CC rounds does the clusters edge set need?
    import graft.functions.TextFunctions._
    val base = docs.select(col("doc_id").as("__id"), col("text").as("__t"))
    val sk = base.select(col("__id"), minhash_sig(col("__t"), 128, 5).as("__sketch"))
    val buckets = sk
      .withColumn("__band", explode(sequence(lit(0), lit(15))))
      .withColumn("__bucket", xxhash64(col("__band"), slice(col("__sketch"), col("__band") * 8 + 1, lit(8))))
    val edges = buckets.as("a").join(buckets.as("b"), col("a.__bucket") === col("b.__bucket"))
      .where(col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("src"), col("b.__id").as("dst")).distinct()
      .localCheckpoint(true)
    println(s"edges: ${edges.count()}")
    (1 to 5).foreach { k =>
      try {
        val t0 = System.nanoTime()
        val n = Graph.connectedComponents(edges, "src", "dst", maxIter = k).count()
        println(f"maxIter=$k: CONVERGED in ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      } catch {
        case e: Exception => println(s"maxIter=$k: not converged")
      }
    }
    s.stop()
  }
}
