package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RetrievalSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._

  test("rrfFuse: hand-computed fusion, missing-list zeros, deterministic cut") {
    // query 1: doc 10 ranks 1st lexically and 2nd semantically; doc 20 only
    // lexical; doc 30 only semantic (1st); doc 40 only lexical (3rd)
    val lex = Seq((1L, 10L, 9.0), (1L, 20L, 5.0), (1L, 40L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val sem = Seq((1L, 30L, 0.99), (1L, 10L, 0.95))
      .toDF("query_id", "doc_id", "cosine")
    val out = Retrieval.rrfFuse(lex, sem, "query_id", "doc_id", "score", "cosine", k = 3)
      .select($"doc_id", $"rank_a", $"rank_b", $"rrf")
      .as[(Long, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    assert(out(10L) == ((1, 2, rr(1) + rr(2)))) // in both lists
    assert(out(30L) == ((0, 1, rr(1)))) // semantic only: rank_a sentinel 0
    assert(out(20L) == ((2, 0, rr(2))))
    assert(!out.contains(40L)) // k = 3 cut: lowest rrf drops
    // fused order: 10 (two lists) beats every single-list doc; 30 and 20
    // share rr(1) vs rr(2)
    assert(out(10L)._3 > out(30L)._3 && out(30L)._3 > out(20L)._3)
  }

  test("rrfFuse: equal-scored docs rank by id, stable under repartition") {
    val lex = Seq((1L, 5L, 7.0), (1L, 3L, 7.0), (1L, 9L, 7.0))
      .toDF("query_id", "doc_id", "score")
    val sem = Seq((1L, 9L, 0.5), (1L, 5L, 0.5)).toDF("query_id", "doc_id", "cosine")
    def run(l: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuse(l, sem, "query_id", "doc_id", "score", "cosine", k = 10)
        .select($"doc_id", $"rank_a", $"rank_b")
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val once = run(lex)
    // score ties break by doc id ascending in both lists
    assert(once == Seq((3L, 1, 0), (5L, 2, 1), (9L, 3, 2)))
    assert(once == run(lex.repartition(5)))
  }
}
