package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DedupSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home tonight"),
    (2L, "a completely different document about spark catalyst expressions and codegen"),
    (3L, "yet another unrelated text discussing minhash signatures and jaccard similarity"),
    // near-dup of 1 (one word changed)
    (4L, "the quick brown fox jumps over the lazy cat and runs far away home tonight"),
    // exact dup of 2
    (5L, "a completely different document about spark catalyst expressions and codegen"),
    // near-dup of 3 (suffix added)
    (6L, "yet another unrelated text discussing minhash signatures and jaccard similarity indeed"))

  private lazy val docs = base.toDF("id", "text")

  test("minhashLsh drops planted near-dups, keeps distinct docs") {
    val kept = Dedup.minhashLsh(docs, "text", "id", numHashes = 128, numBands = 32,
      shingle = 5, threshold = 0.6).select("id").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept)) // smallest ids survive
    assert(!kept.contains(4L) && !kept.contains(5L) && !kept.contains(6L))
  }

  test("simhash drops near-dups within hamming budget") {
    val kept = Dedup.simhash(docs, "text", "id", maxHamming = 6).select("id").as[Long].collect().toSet
    assert(!kept.contains(5L)) // exact dup always hamming 0
    assert(kept.contains(1L) && kept.contains(2L) && kept.contains(3L))
  }

  test("ngramJaccard: identical pair = 1.0, near pair high, distinct pair low") {
    val pairs = Seq(
      (base(1)._2, base(4)._2, "same"),
      (base(0)._2, base(3)._2, "near"),
      (base(0)._2, base(1)._2, "far")).toDF("ta", "tb", "kind")
    val j = Dedup.ngramJaccard(pairs, "ta", "tb", n = 3)
      .select("kind", "jaccard").as[(String, Double)].collect().toMap
    assert(j("same") == 1.0)
    assert(j("near") > 0.5 && j("near") < 1.0)
    assert(j("far") < 0.1)
  }

  test("minhashVerified applies the exact-jaccard verify pass") {
    val kept = Dedup.minhashVerified(docs, "text", "id",
      numBands = 32, candidateThreshold = 0.3, jaccardThreshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept))
    assert(!kept.contains(4L) && !kept.contains(5L))
  }

  test("nearDupAgainst drops only batch rows that near-dup the corpus") {
    // corpus: 1..3; batch: 4..6 (4 near-dups 1, 5 exact-dups 2, 6 near-dups 3)
    // plus a fresh batch doc 7 that matches nothing
    val corpus = docs.where(col("id") <= 3)
    val batch = docs.where(col("id") > 3)
      .union(Seq((7L, "entirely novel content about transverse mercator karney series")).toDF("id", "text"))
    val kept = Dedup.nearDupAgainst(batch, corpus, "text", "id",
      numBands = 32, candidateThreshold = 0.3, jaccardThreshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(7L))
    // batch×batch dups are NOT touched: two copies in the batch both survive
    // when neither matches the corpus
    val twin = Seq(
      (8L, "duplicated inside the batch only duplicated inside the batch only"),
      (9L, "duplicated inside the batch only duplicated inside the batch only"))
      .toDF("id", "text")
    val kept2 = Dedup.nearDupAgainst(twin, corpus, "text", "id",
      numBands = 32, candidateThreshold = 0.3, jaccardThreshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept2 == Set(8L, 9L))
  }

  test("embeddingNearDup drops near-identical vectors only") {
    val v1 = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val v1b = v1.clone(); v1b(0) = v1(0) + 1e-4f
    val v2 = Array.tabulate(16)(i => math.cos(2 * i + 1).toFloat)
    val vecs = Seq((10L, v1), (11L, v1b), (20L, v2)).toDF("vid", "vec")
    val kept = Dedup.embeddingNearDup(vecs, "vec", "vid", threshold = 0.999)
      .select("vid").as[Long].collect().toSet
    assert(kept == Set(10L, 20L))
  }

  test("near-dup recall on the documents table's planted ' dup' copies") {
    val docsTable = graft.readTable(spark, sfDir, "documents")
    val n = docsTable.count()
    val planted = docsTable.where(col("text").endsWith(" dup")).count()
    assert(planted > 0) // generator plants marked near-copies
    val dropped = n - Dedup.minhashLsh(docsTable, "text", "doc_id", threshold = 0.7).count()
    // each planted pair loses exactly one member; recall ≥ 80 %
    assert(dropped >= planted * 8 / 10, s"dropped $dropped of $planted planted dups")
    assert(dropped <= planted * 2) // and no mass false-positive collapse
  }
}
