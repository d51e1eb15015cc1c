package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §2 "LLM-data-pipeline operators").
  *
  * Scale design: scoring is pure built-in array math (codegen'd, no UDF in
  * the pair loop); top-k never global-sorts — a typed Aggregator keeps an
  * O(k) buffer per partition and merges partials, so the shuffle moves
  * k rows per (query, partition), not the scored pair space.
  */
object Similarity {

  /** Cosine similarity of two array columns (float or double), computed in
    * double precision with a left-to-right fold — pure built-ins.
    */
  def cosineSim(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>"); val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Bounded top-k buffer: (id, score) pairs, kept sorted by (-score, id) —
    * deterministic under ties. Map-side partials merge in O(k).
    */
  class TopKAggregator(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    private def order(x: (Long, Double)): (Double, Long) = (-x._2, x._1)
    private val ord = implicitly[Ordering[(Double, Long)]]
    override def zero: Seq[(Long, Double)] = Nil
    override def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
      if (buf.size >= k && ord.gteq(order(x), order(buf.last))) buf
      else ((x +: buf).sortBy(order)).take(k)
    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (a ++ b).sortBy(order).take(k)
    override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  }

  private def topkColumns(scored: DataFrame, k: Int): DataFrame = {
    val fn = udaf(new TopKAggregator(k), ExpressionEncoder[(Long, Double)]())
    scored
      .groupBy("query_id")
      .agg(fn(col("neighbor_id"), col("cosine")).as("__top"))
      .select(col("query_id"), explode(col("__top")).as("__n"))
      .select(col("query_id"), col("__n._1").as("neighbor_id"), col("__n._2").as("cosine"))
  }

  /** Exact cosine top-k: every query scores every corpus row. The query side
    * is broadcast — the corpus (the 100 TB side) never shuffles; each task
    * folds its partition into k-row partials.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", cosineSim(col("__qv"), col("__cv")))
    topkColumns(scored, k)
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer (cosine distance,
    * MLlib — trains distributed) partitions the corpus into `nlist` cells;
    * each query probes its `nprobe` nearest centroids and scores exactly only
    * within those cells. The centroid table is tiny and broadcast; the
    * corpus-side join is hash-partitioned on the cell id. The third
    * similarity tier: brute force (exact) → IVF (high recall, ~nprobe/nlist
    * of the work) → hyperplane LSH (cheapest).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val featured = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__feat", array_to_vector(col("__cv").cast("array<double>")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coarse quantizer: few iterations suffice, and a bounded training set
    // keeps the fit constant-time at any corpus scale. limit() reads only as
    // many partitions as needed — no sizing count() pass over the corpus —
    // and the persist above means fit + transform share one corpus scan.
    val trainSet = featured.select("__feat").limit(100000)
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setDistanceMeasure("cosine").setMaxIter(8)
      .setFeaturesCol("__feat").setPredictionCol("__cell")
      .fit(trainSet)
    val assigned = model.transform(featured).select(col("neighbor_id"), col("__cv"), col("__cell"))

    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("__cell", "__centroid")

    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("__qv"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosineSim(col("__qv"), col("__centroid")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__csim").desc, col("__cell"))
    val probes = probed.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= nprobe)
      .select("query_id", "__qv", "__cell")

    val scored = assigned.join(probes, Seq("__cell"))
      .withColumn("cosine", cosineSim(col("__qv"), col("__cv")))
    topkColumns(scored, k)
  }

  /** LSH-bucketed ANN (the scale path): `tables` independent random-hyperplane
    * sketch tables; a corpus row is scored only when it shares a bucket with
    * the query in some table. Join is hash-partitioned on the bucket key —
    * no cross join, no broadcast requirement on either side. Recall is tuned
    * by (tables, planes); verify pass is exact cosine.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      tables: Int = 8,
      planes: Int = 12): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) = df
      .select(col(idCol).cast("long").as(id), col(vecCol).as(vec))
      .withColumn("__table", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("__bucket", xxhash64(col("__table"), vec_simhash(col(vec), planes, col("__table"))))
    val c = bucketed(corpus, "neighbor_id", "__cv")
    val q = bucketed(queries, "query_id", "__qv")
    val cands = c.join(q, Seq("__table", "__bucket"))
      .select("query_id", "neighbor_id", "__qv", "__cv")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("cosine", cosineSim(col("__qv"), col("__cv")))
    topkColumns(scored, k)
  }
}
