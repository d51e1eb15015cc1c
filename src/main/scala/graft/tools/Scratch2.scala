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
      // refresh sub-phases (replicated from refreshBM25Index internals)
      locally {
        val newDocs = ManifestTable.readSince(s, root, sinceExclusive = 1L)
        def toks(c: org.apache.spark.sql.Column) =
          filter(split(trim(lower(c)), " +"), x => x =!= "")
        val newPost = newDocs
          .select(col("doc_id").as("__doc"), toks(col("text")).as("__toks"))
          .where(size(col("__toks")) > 0)
          .select(col("__doc"), size(col("__toks")).cast("long").as("__dl"),
            explode(col("__toks")).as("__term"))
          .groupBy("__doc", "__dl", "__term").agg(count(lit(1)).as("__tf"))
          .withColumn("__bucket", pmod(
            graft.functions.TextFunctions.string_hash64(col("__term"), 7L), lit(64L)))
          .persist()
        val agg = tm("  rf: newPost agg") {
          newPost.agg(countDistinct(col("__doc")), sum(col("__tf")),
            collect_set(col("__bucket"))).head() }
        tm("  rf: clash semi") {
          newPost.select("__doc").distinct()
            .join(s.read.parquet(s"$out/docs"), Seq("__doc"), "left_semi")
            .limit(1).count() }
        val buckets = agg.getSeq[Long](2)
        val old = s.read.parquet(s"$out/postings")
          .where(col("__bucket").isin(buckets: _*))
          .select("__bucket", "__doc", "__term", "__tf", "__dl")
        val unioned = old.unionByName(
          newPost.select("__bucket", "__doc", "__term", "__tf", "__dl"))
        val dfNew = unioned.groupBy("__term").agg(count(lit(1)).as("__df"))
        val rewritten = unioned.join(dfNew, "__term")
          .select("__term", "__doc", "__tf", "__dl", "__df", "__bucket")
        tm("  rf: rewrite write") {
          rewritten.write.mode("overwrite").partitionBy("__bucket")
            .parquet(s"$out/.rfprobe-tmp") }
        tm("  rf: stats rw") {
          val oldStats = s.read.parquet(s"$out/stats").head()
          import s.implicits._
          Seq((oldStats.getLong(0) + agg.getLong(0), oldStats.getLong(1) + agg.getLong(1)))
            .toDF("__n", "__tt").coalesce(1)
            .write.mode("overwrite").parquet(s"$out/.rfprobe-stats") }
        tm("  rf: docs append probe") {
          newPost.select("__doc").distinct()
            .write.mode("overwrite").parquet(s"$out/.rfprobe-docs") }
        newPost.unpersist()
      }
      tm("refresh") { TextAnalysis.refreshBM25Index(s, out,
        ManifestTable.readSince(s, root, sinceExclusive = 1L)) }
      val qs = docs.where(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(trim(lower(col("text"))), " +"),
            x => x =!= ""), 1, 4), " ").as("query"))
      tm("search") { TextAnalysis.searchBM25Index(s, out, qs, topK = 10).count() }
      // search sub-phases
      tm("  postings raw count") { s.read.parquet(s"$out/postings").count() }
      tm("  qterms cache+collect") {
        val toks = filter(split(trim(lower(col("query"))), " +"), x => x =!= "")
        val qt = qs.select(col("query_id").as("__qid"),
            explode(array_distinct(toks)).as("__term"))
          .persist()
        val n = qt.select(countDistinct(col("__term"))).head().getLong(0)
        qt.unpersist(); n
      }
      tm("  search again") { TextAnalysis.searchBM25Index(s, out, qs, topK = 10).count() }
      tm("  search 3rd") { TextAnalysis.searchBM25Index(s, out, qs, topK = 10).count() }
    }
    s.stop()
  }
}
