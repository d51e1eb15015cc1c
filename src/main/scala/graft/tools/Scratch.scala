package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Throwaway timing experiments (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = 10
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val emb = graft.readTable(s, sfDir, "embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val embN = (0 until factor).map { i =>
      val shift = (i * 7) % math.max(dim, 1)
      emb.select((col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
        concat(slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift)).as("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"corpus rows: ${embN.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    // stage 1+2: fit + assignment only (count of assigned)
    time("fit+assign nlist=160") {
      val m = Similarity.getClass.getDeclaredMethods.find(_.getName == "fitAssign").get
      m.setAccessible(true)
      val (assigned, _) = m.invoke(Similarity, embN, "embedding", "vec_id",
        Int.box(160), Long.box(42L), Long.box(64L << 20))
        .asInstanceOf[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
      assigned.count()
    }
    // full operator twice (warm)
    time("semanticDedup run 1") {
      Dedup.semanticDedup(embN, "embedding", "vec_id", nlist = 160).count()
    }
    time("semanticDedup run 2") {
      Dedup.semanticDedup(embN, "embedding", "vec_id", nlist = 160).count()
    }
    s.stop()
  }
}
