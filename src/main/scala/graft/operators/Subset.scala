package graft.operators

import org.apache.spark.sql.DataFrame

/** Column subset/rename DSL, equivalent of erde's `subset` operator
  * (reference: erde/op/subset.py:24 `main`, erde/op/subset.py:3 `parse_str`).
  *
  * Expression format (comma-separated):
  *   - `old:new`  rename `old` to `new` (and keep only listed columns)
  *   - `name`     assert presence and keep
  *   - `-name`    drop column (ignored when missing)
  *   - `*`        keep all remaining columns
  * If the expression only drops columns, `*` is implied.
  *
  * Purely a projection — Catalyst prunes the unused columns all the way to the
  * scan, so a subset over a wide parquet table reads only the kept columns.
  */
object Subset {

  private[graft] final case class Spec(
      kept: Seq[String], renamed: Map[String, String], removed: Seq[String], others: Boolean)

  /** Parses the DSL string. Mirrors erde/op/subset.py:3. */
  private[graft] def parse(columns: String): Spec = {
    val pairs: Seq[(String, Option[String])] = columns.split(",").toSeq.map { raw =>
      val parts = raw.trim.split(":").map(_.trim).toSeq
      parts.foreach { p =>
        if (p.isEmpty || p == "-")
          throw new IllegalArgumentException(s"""Bad column name: "$raw": zero name length.""")
      }
      if (parts.length > 2)
        throw new IllegalArgumentException(s"column name must have 0 or 1 colons (:) in '$raw'")
      if (parts.length == 2 && parts.head.startsWith("-"))
        throw new IllegalArgumentException(s"name $raw is removed, but is also renamed: '$raw'")
      if (parts.length == 1) (parts.head, None) else (parts.head, Some(parts(1)))
    }
    val kept = pairs.collect { case (k, _) if !k.startsWith("-") && k != "*" => k }
    val renamed = pairs.collect { case (k, Some(v)) if k != "*" => k -> v }.toMap
    val removed = pairs.collect { case (k, _) if k.startsWith("-") => k.drop(1) }
    val others = pairs.exists(_._1 == "*") || (kept.isEmpty && removed.nonEmpty)
    Spec(kept, renamed, removed, others)
  }

  def apply(df: DataFrame, columns: String): DataFrame = {
    val spec = parse(columns)
    val present = df.columns.toSet
    spec.kept.foreach { k =>
      if (!present.contains(k))
        throw new IllegalArgumentException(
          s"column $k not in df (columns present: ${df.columns.mkString(", ")})")
    }
    // keep order: listed columns first, then the remaining ones if `*`
    val base =
      if (spec.others) df.select((spec.kept ++ df.columns.filterNot(spec.kept.contains)).map(df.col): _*)
      else df.select(spec.kept.map(df.col): _*)
    val renamedDf = spec.renamed.foldLeft(base) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
    spec.removed.foldLeft(renamedDf)((d, c) => if (d.columns.contains(c)) d.drop(c) else d)
  }
}
