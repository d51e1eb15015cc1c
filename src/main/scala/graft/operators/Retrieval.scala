package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval — combining independent retrievers (BM25 lexical,
  * embedding cosine, any other scored list) into one ranking without score
  * calibration.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al. 2009): each input list
    * contributes `1 / (rrfK + rank)` for the documents it retrieved, ranks
    * are per-query positions under a TOTAL order (score desc, id asc — so
    * equal-scored docs rank identically on any engine), documents missing
    * from a list contribute nothing, and the fused top-`k` is cut under the
    * (rrf desc, id asc) total order. The classic hybrid-search combiner:
    * scores from different retrievers are incomparable, ranks are not.
    *
    * Scale shape: inputs are per-query top-K lists — each is bounded by
    * |queries| · K rows, model-sized however big the corpus that produced
    * them was. Two rank windows, one (query, id) full-outer join, one cut
    * window; everything shuffles on query_id once. The heavy lifting
    * stays in the upstream retrievers where the corpus-scale machinery
    * (inverted index, IVF cells, int8 scan) already lives.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      queryCol: String,
      idCol: String,
      scoreColA: String,
      scoreColB: String,
      k: Int,
      rrfK: Int = 60): DataFrame = {
    require(k >= 1 && rrfK >= 0, "k must be positive, rrfK non-negative")
    def ranked(df: DataFrame, scoreCol: String, into: String): DataFrame = {
      val w = Window.partitionBy(queryCol).orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(queryCol), col(idCol), row_number().over(w).as(into))
    }
    val ra = ranked(a, scoreColA, "__ra")
    val rb = ranked(b, scoreColB, "__rb")
    val fused = ra.join(rb, Seq(queryCol, idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("__rb")), lit(0.0)))
    val wCut = Window.partitionBy(queryCol).orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("__rn", row_number().over(wCut))
      .where(col("__rn") <= k)
      .select(col(queryCol), col(idCol),
        coalesce(col("__ra"), lit(0)).as("rank_a"),
        coalesce(col("__rb"), lit(0)).as("rank_b"),
        col("rrf"))
  }
}
