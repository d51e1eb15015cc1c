package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for large-scale corpus curation (beyond the
  * reference's surface; see SURVEY.md §2 "LLM-data-pipeline operators").
  *
  * All variants are shuffle-lean: they hash/sketch first so the exchange moves
  * fixed-size keys, not document bodies, and they pick a deterministic
  * representative row (min of `tieBreak`) instead of relying on row order.
  * Near-dup variants share one shape: sketch → bucket (LSH band) → self-join
  * within bucket → cheap verify on the sketch → drop the larger id of every
  * verified pair. The candidate join is hash-partitioned on the bucket key, so
  * shuffle is O(rows × bands), never O(N²).
  */
object Dedup {

  /** Exact dedup on `keys`: keeps, per distinct key combination, the row with
    * the smallest `tieBreak` value. groupBy gets a map-side partial min_by, so
    * at 100 TB the shuffle carries one candidate row per key per input
    * partition, not every duplicate.
    */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val others = df.columns.toIndexedSeq.filterNot(keys.contains)
    val aggs = others.map(c => min_by(col(c), col(tieBreak)).as(c))
    df.groupBy(keys.map(col).toSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Ids (as `__id`) that lose a verified near-dup pair — the generic LSH
    * skeleton: `buckets` has columns (__id, __sketch, __bucket); `verify`
    * decides pair similarity from the two sketches.
    */
  private def losers(buckets: DataFrame, verify: (Column, Column) => Column): DataFrame =
    // alias-based self-join: both sides share one canonical plan, so the
    // shuffle on __bucket is written once and read twice (ReusedExchange) —
    // sketches are computed once, not per side
    buckets.as("a").join(buckets.as("b"), col("a.__bucket") === col("b.__bucket"))
      .where(col("a.__id") < col("b.__id") && verify(col("a.__sketch"), col("b.__sketch")))
      .select(col("b.__id").as("__id"))
      .distinct()

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components (pure built-ins — stays in codegen).
    */
  def minhashSimilarity(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => (x === y).cast("int")), v => v === 1))
      .cast("double") / size(a)

  /** MinHash + banded LSH near-dedup: keeps one representative (smallest
    * `idCol`) of every near-duplicate cluster detected at estimated Jaccard ≥
    * `threshold` (reference point: Broder's shingling/minhash resemblance and
    * the standard LSH banding construction).
    *
    * numBands must divide numHashes; a pair collides when any band of
    * numHashes/numBands signature components matches exactly.
    */
  def minhashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 128,
      numBands: Int = 16,
      shingle: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val rowsPerBand = numHashes / numBands
    val sketched = df.select(col(idCol).as("__id"),
      minhash_sig(col(textCol), numHashes, shingle).as("__sketch"))
    val buckets = sketched
      .withColumn("__band", explode(sequence(lit(0), lit(numBands - 1))))
      .withColumn("__bucket",
        xxhash64(col("__band"), slice(col("__sketch"), col("__band") * rowsPerBand + 1, lit(rowsPerBand))))
      .drop("__band")
    val drop = losers(buckets, (a, b) => minhashSimilarity(a, b) >= threshold)
    df.join(drop.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** SimHash near-dedup: 64-bit token sketch; candidates collide on any of
    * four 16-bit chunks (pigeonhole guarantees recall for hamming ≤ 3);
    * verified when hamming distance ≤ `maxHamming`.
    */
  def simhash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sketched = df.select(col(idCol).as("__id"), simhash64(col(textCol)).as("__sketch"))
    val buckets = sketched
      .withColumn("__chunk", explode(sequence(lit(0), lit(3))))
      .withColumn("__bucket",
        xxhash64(col("__chunk"), expr("shiftrightunsigned(__sketch, __chunk * 16)").bitwiseAND(lit(0xffffL))))
      .drop("__chunk")
    val drop = losers(buckets, (a, b) => bit_count(a.bitwiseXOR(b)) <= maxHamming)
    df.join(drop.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** Exact word n-gram Jaccard between two text columns (the verify pass run
    * after MinHash candidate generation, or standalone on candidate pairs).
    */
  def ngramJaccard(pairs: DataFrame, textA: String, textB: String, n: Int = 3,
      into: String = "jaccard"): DataFrame = {
    val ga = ngrams_hashed(col(textA), n)
    val gb = ngrams_hashed(col(textB), n)
    pairs.withColumn(into,
      size(array_intersect(ga, gb)).cast("double") /
        greatest(size(array_union(ga, gb)), lit(1)).cast("double"))
  }

  /** MinHash-candidates + exact n-gram Jaccard verification dedup: the
    * two-stage pipeline (cheap sketch filter, exact verify on the survivors
    * only). Join back to the text is by id, hash-partitioned.
    */
  def minhashVerified(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 128,
      numBands: Int = 16,
      shingle: Int = 5,
      candidateThreshold: Double = 0.5,
      jaccardThreshold: Double = 0.8,
      ngram: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sketched = df.select(col(idCol).as("__id"),
      minhash_sig(col(textCol), numHashes, shingle).as("__sketch"))
    val buckets = sketched
      .withColumn("__band", explode(sequence(lit(0), lit(numBands - 1))))
      .withColumn("__bucket",
        xxhash64(col("__band"), slice(col("__sketch"), col("__band") * rowsPerBand + 1, lit(rowsPerBand))))
    val cands = buckets.as("a").join(buckets.as("b"), col("a.__bucket") === col("b.__bucket"))
      .where(col("a.__id") < col("b.__id") &&
        minhashSimilarity(col("a.__sketch"), col("b.__sketch")) >= candidateThreshold)
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb")).distinct()
    val texts = df.select(col(idCol), col(textCol))
    val withTexts = cands
      .join(texts.withColumnRenamed(idCol, "__ida").withColumnRenamed(textCol, "__ta"), Seq("__ida"))
      .join(texts.withColumnRenamed(idCol, "__idb").withColumnRenamed(textCol, "__tb"), Seq("__idb"))
    val verified = ngramJaccard(withTexts, "__ta", "__tb", ngram)
      .where(col("jaccard") >= jaccardThreshold)
      .select(col("__idb").as(idCol)).distinct()
    df.join(verified, Seq(idCol), "left_anti")
  }

  /** Incremental near-dedup: drops rows of `batch` whose text near-duplicates
    * ANY document of the existing `corpus` — the daily-ingest pattern (dedup
    * a new crawl against the already-kept set without re-deduping the
    * corpus). Ids must be disjoint across the two frames.
    *
    * Scale shape: both sides sketch once; candidates are MinHash band-bucket
    * collisions BETWEEN the sides only (never corpus×corpus or batch×batch),
    * hash-partitioned on the bucket key; texts join back by id for the exact
    * n-gram Jaccard verify on collided candidates only.
    */
  def nearDupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 128,
      numBands: Int = 16,
      shingle: Int = 5,
      candidateThreshold: Double = 0.5,
      jaccardThreshold: Double = 0.8,
      ngram: Int = 3): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val rowsPerBand = numHashes / numBands
    def bucketed(df: DataFrame) = df.select(col(idCol).as("__id"),
        minhash_sig(col(textCol), numHashes, shingle).as("__sketch"))
      .withColumn("__band", explode(sequence(lit(0), lit(numBands - 1))))
      .withColumn("__bucket",
        xxhash64(col("__band"), slice(col("__sketch"), col("__band") * rowsPerBand + 1, lit(rowsPerBand))))
    val cands = bucketed(corpus).as("a").join(bucketed(batch).as("b"),
        col("a.__bucket") === col("b.__bucket"))
      .where(minhashSimilarity(col("a.__sketch"), col("b.__sketch")) >= candidateThreshold)
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb")).distinct()
    val ct = corpus.select(col(idCol).as("__ida"), col(textCol).as("__ta"))
    val bt = batch.select(col(idCol).as("__idb"), col(textCol).as("__tb"))
    val verified = ngramJaccard(cands.join(ct, Seq("__ida")).join(bt, Seq("__idb")),
        "__ta", "__tb", ngram)
      .where(col("jaccard") >= jaccardThreshold)
      .select(col("__idb").as(idCol)).distinct()
    batch.join(verified, Seq(idCol), "left_anti")
  }

  /** Embedding near-dedup: `tables` independent random-hyperplane sketch
    * tables (a pair is a candidate when all `planes` sign bits agree in any
    * table), exact cosine verify within buckets, drop larger ids at cosine ≥
    * `threshold`.
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      tables: Int = 4,
      planes: Int = 16): DataFrame = {
    val buckets = df
      .select(col(idCol).as("__id"), col(vecCol).as("__sketch"))
      .withColumn("__table", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("__bucket",
        xxhash64(col("__table"), vec_simhash(col("__sketch"), planes, col("__table"))))
      .drop("__table")
    val drop = losers(buckets, (a, b) => Similarity.cosineSim(a, b) >= threshold)
    df.join(drop.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }
}
