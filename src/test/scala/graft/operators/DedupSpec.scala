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

  test("exact: tieBreak ties keep ONE real row, never a stitched hybrid") {
    // two rows share key AND tieBreak but differ in payload: independent
    // per-column min_bys could emit text from one and lang from the other
    val df = Seq(
      (1L, "k", "textA", "en"), (1L, "k", "textB", "fr"), (2L, "k2", "only", "de"))
      .toDF("ts", "key", "text", "lang")
    val out = Dedup.exact(df, Seq("key"), "ts").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out.size == 2)
    val kRow = out.find(_._1 == "k").get
    assert(Set(("k", "textA", "en"), ("k", "textB", "fr"))(kRow),
      s"fabricated row: $kRow")
    // keys covering every column degrades to distinct, not a crash
    assert(Dedup.exact(df, df.columns.toSeq, "ts").count() == 3)
  }

  test("minhashLsh drops planted near-dups, keeps distinct docs") {
    val kept = Dedup.minhashLsh(docs, "text", "id", numHashes = 128, numBands = 32,
      shingle = 5, threshold = 0.6).select("id").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept)) // smallest ids survive
    assert(!kept.contains(4L) && !kept.contains(5L) && !kept.contains(6L))
  }

  test("minhashLsh and clusters keep pairwise semantics for NULL texts") {
    // pairwise, a NULL sketch verifies against nothing: every NULL-text row
    // survives dedup and forms its own singleton cluster
    val withNulls = docs.unionByName(
      Seq((7L, null.asInstanceOf[String]), (8L, null.asInstanceOf[String]))
        .toDF("id", "text"))
    val kept = Dedup.minhashLsh(withNulls, "text", "id", numHashes = 128, numBands = 32,
      shingle = 5, threshold = 0.6).select("id").as[Long].collect().toSet
    assert(kept.contains(7L) && kept.contains(8L))
    assert(!kept.contains(5L)) // exact dup still drops

    val cl = Dedup.clusters(withNulls, "text", "id", numHashes = 128, numBands = 32,
      shingle = 5, threshold = 0.6)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(cl(7L) == 7L && cl(8L) == 8L) // singletons, not merged
    assert(cl(5L) == 2L) // exact dup still clusters to its rep
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

  test("degenerate bucket: 10k byte-identical docs collapse, stay linear") {
    // pre-collapse: without it the within-bucket self-join would emit
    // 16 bands × 10k²/2 ≈ 800M candidate pairs and this test would not return
    val flood = spark.range(10000)
      .select((col("id") + 100L).as("id"),
        lit("boilerplate cookie banner accept all cookies to continue reading this site").as("text"))
    val corpus = docs.unionByName(flood)
    val kept = Dedup.minhashLsh(corpus, "text", "id", threshold = 0.7)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(100L)) // flood representative (min id of the clones)
    assert(kept.intersect((101L until 10100L).toSet).isEmpty) // all clones drop
    assert(Set(1L, 2L, 3L).subsetOf(kept)) // base corpus unaffected
    // same flood through the text-verified and simhash variants
    val keptV = Dedup.minhashVerified(corpus, "text", "id", numBands = 32,
      candidateThreshold = 0.3, jaccardThreshold = 0.8)
      .select("id").as[Long].collect().toSet
    assert(keptV.contains(100L) && keptV.intersect((101L until 10100L).toSet).isEmpty)
    val keptS = Dedup.simhash(corpus, "text", "id").select("id").as[Long].collect().toSet
    assert(keptS.contains(100L) && keptS.intersect((101L until 10100L).toSet).isEmpty)
  }

  test("incremental dedup stays linear when the batch repeats one page") {
    val corpus = docs
    val flood = spark.range(5000)
      .select((col("id") + 1000L).as("id"),
        lit("the quick brown fox jumps over the lazy dog and runs far away home tonight").as("text"))
    val kept = Dedup.nearDupAgainst(flood, corpus, "text", "id",
      numBands = 32, candidateThreshold = 0.3, jaccardThreshold = 0.8)
      .select("id").as[Long].collect().toSet
    assert(kept.isEmpty) // every clone matches corpus doc 1 exactly
  }

  test("maxBucket caps probes without losing star-shaped clusters") {
    // one hub text + orbiting near-dups: every verified pair involves the
    // hub (the bucket's min id), which a probe cap of 1 always keeps
    val hub = "shared header shared header shared header shared header shared header unique tail"
    val cluster = (0 until 20).map(i => (100L + i, hub + s" variant$i"))
    val corpus = (Seq((50L, hub)) ++ cluster).toDF("id", "text")
    val uncapped = Dedup.minhashLsh(corpus, "text", "id", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    val capped = Dedup.minhashLsh(corpus, "text", "id", threshold = 0.5, maxBucket = 1)
      .select("id").as[Long].collect().toSet
    assert(uncapped.contains(50L) && capped.contains(50L))
    // capping can only REDUCE the examined pairs: survivors are a superset
    assert(uncapped.subsetOf(capped))
  }

  test("embeddingNearDup: identical zero vectors all survive (NaN cosine)") {
    // pairwise semantics: cosine(0⃗, 0⃗) is NaN, NaN ≥ t is false, nothing
    // drops — the exact-collapse gate must preserve that
    val z = Array.fill(8)(0f)
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val vecs = Seq((1L, z), (2L, z), (3L, v), (4L, v)).toDF("vid", "vec")
    val kept = Dedup.embeddingNearDup(vecs, "vec", "vid", threshold = 0.9)
      .select("vid").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L)) // zero vectors survive; identical real vector dedups
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

  // ---- semanticDedup ----------------------------------------------------

  /** Brute-force greedy keep-smallest-id oracle over exact cosine. */
  private def semBrute(rows: Seq[(Long, Array[Float])], t: Double): Set[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na * nb > 0) dot / (na * nb) else 0.0
    }
    rows.collect { case (id, v)
      if !rows.exists { case (j, w) => j < id && cos(v, w) >= t } => id
    }.toSet
  }

  private val semRows: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(12)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    // planted scaled copies of 0, 1, 2 — cosine ≈ 1 with the originals
    val copies = (0 until 3).map(i =>
      (100L + i, base(i)._2.map(x => x * 0.25f)))
    base ++ copies
  }

  test("semanticDedup nlist=1 matches the exact greedy keep set") {
    val df = semRows.toDF("vid", "vec")
    for (t <- Seq(0.8, 0.95, 0.999)) {
      val kept = Dedup.semanticDedup(df, "vec", "vid", threshold = t, nlist = 1)
        .select("vid").as[Long].collect().toSet
      assert(kept == semBrute(semRows, t), s"threshold $t")
    }
  }

  test("semanticDedup nlist>1: sound (kept ⊇ exact) and scaled copies still drop") {
    val df = semRows.toDF("vid", "vec")
    val kept = Dedup.semanticDedup(df, "vec", "vid", threshold = 0.999, nlist = 4)
      .select("vid").as[Long].collect().toSet
    // cells only REMOVE comparisons: anything dropped has a genuine partner
    assert(semBrute(semRows, 0.999).subsetOf(kept))
    // a scaled copy shares its original's argmax-dot cell, so it still drops
    assert(Set(100L, 101L, 102L).forall(id => !kept.contains(id)))
    assert((0L until 12L).forall(kept.contains))
  }

  test("semanticDedup: zero vectors never count as similar") {
    val z = Array.fill(8)(0f)
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq((1L, z), (2L, z), (3L, v)).toDF("vid", "vec")
    val kept = Dedup.semanticDedup(df, "vec", "vid", threshold = 0.9, nlist = 1)
      .select("vid").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("keepBest: highest-quality family member survives, not the min id") {
    // non-repeating base: distinct-shingle mass dominates the tails, so the
    // family stays above threshold even with one member's longer tail
    val base = (1 to 80).map(i => s"tok$i").mkString(" ") + " "
    val docs = Seq(
      (10L, base + "family one"), // near-dup family: 10, 11, 12
      (11L, base + "family one plus a much longer distinctive tail of words"),
      (12L, base + "family one b"),
      (50L, "a completely unrelated singleton document about catalyst rules"))
      .toDF("doc_id", "text")
    val out = Dedup.keepBest(docs, "text", "doc_id",
        org.apache.spark.sql.functions.length($"text"), threshold = 0.7)
      .select("doc_id", "n_members").as[(Long, Long)].collect().toMap
    // the LONGEST member (11) wins, even though min-id dedup would keep 10
    assert(out.keySet == Set(11L, 50L), s"kept ${out.keySet}")
    assert(out(11L) == 3L && out(50L) == 1L)
    // equal quality ties to the smallest id
    val tied = Seq((7L, base), (3L, base), (9L, base)).toDF("doc_id", "text")
    val t = Dedup.keepBest(tied, "text", "doc_id",
        org.apache.spark.sql.functions.length($"text"), threshold = 0.7)
      .select("doc_id").as[Long].collect().toSeq
    assert(t == Seq(3L))
  }
}
