package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation (beyond the
  * reference's surface; see SURVEY.md §2 "LLM-data-pipeline operators").
  *
  * All variants are shuffle-lean: they hash/sketch first so the exchange moves
  * fixed-size keys, not document bodies, and they pick a deterministic
  * representative row (min of `tieBreak`) instead of relying on row order.
  */
object Dedup {

  /** Exact dedup on `keys`: keeps, per distinct key combination, the row with
    * the smallest `tieBreak` value. groupBy gets a map-side partial min_by, so
    * at 100 TB the shuffle carries one candidate row per key per input
    * partition, not every duplicate.
    */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    val aggs = others.map(c => min_by(col(c), col(tieBreak)).as(c))
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*)
  }
}
