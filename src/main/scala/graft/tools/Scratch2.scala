package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase breakdown of text_bm25_refresh. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    graft.localScratchConfigs.foreach { case (k, v) => builder.config(k, v) } // local-master harness: tmpfs scratch
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysis
    import graft.sources.ManifestTable
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val docs = graft.readTable(s, dir, "documents")
      val root = tm("freshRoot") {
        val p = java.nio.file.Paths.get(s"/tmp/graft_bm25_rf_probe_${new java.io.File(dir).getName}")
        def wipe(q: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(q)) {
            val st = java.nio.file.Files.list(q)
            try st.iterator().forEachRemaining(wipe) finally st.close()
          }
          java.nio.file.Files.deleteIfExists(q)
        }
        wipe(p); p.toString
      }
      tm("append1") { ManifestTable.append(docs.where(col("doc_id") % 3 =!= 2), root) }
      val out = s"/tmp/graft_bm25rf_probe_${new java.io.File(dir).getName}"
      tm("build") { TextAnalysis.buildBM25Index(ManifestTable.read(s, root), out) }
      tm("append2") { ManifestTable.append(docs.where(col("doc_id") % 3 === 2), root) }
      tm("refresh") { TextAnalysis.refreshBM25Index(s, out,
        ManifestTable.readSince(s, root, sinceExclusive = 1L)) }
      val qs = docs.where(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(trim(lower(col("text"))), " +"),
            x => x =!= ""), 1, 4), " ").as("query"))
      tm("search") { TextAnalysis.searchBM25Index(s, out, qs, topK = 10).count() }
    }
    s.stop()
  }
}
