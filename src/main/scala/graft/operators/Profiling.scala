package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling — the "describe at scale" pass a pipeline runs before
  * trusting a new 100 TB drop: per-column completeness/cardinality/range
  * stats and a pairwise correlation matrix, each in ONE scan.
  */
object Profiling {

  /** Per-column profile in long format: one output row per requested column
    * with row count, null count, exact distinct count, min/max (rendered as
    * strings so heterogeneous column types share one schema) and the mean of
    * the values that parse as numbers (`try_cast` — non-numeric columns get
    * the -1 sentinel rather than a null double, which a NaN-blind tuple
    * compare could never match).
    *
    * Scale shape: ONE aggregation over one scan. The multiple exact
    * `count(distinct)`s plan as a single Expand + two-phase aggregate — one
    * shuffle, rows multiplied by #columns, the classic exact-profile cost.
    * At 100 TB pass `approx = true`: `approx_count_distinct` (HLL++, ~2%
    * default error) replaces the exact distinct, the Expand disappears, and
    * the whole profile collapses to one map-side-combined reduce of sketch
    * registers. Exact is the default because the oracle compares values.
    */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(v).as(s"__n_$c"),
        count(lit(1)).as(s"__rows_$c"),
        (if (approx) approx_count_distinct(v) else countDistinct(v)).as(s"__d_$c"),
        min(v).cast("string").as(s"__min_$c"),
        max(v).cast("string").as(s"__max_$c"),
        avg(expr(s"try_cast(`$c` AS double)")).as(s"__mean_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        (col(s"__rows_$c") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        coalesce(col(s"__min_$c"), lit("")).as("min_s"),
        coalesce(col(s"__max_$c"), lit("")).as("max_s"),
        coalesce(round(col(s"__mean_$c"), 6), lit(-1.0)).as("mean6"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Pairwise Pearson correlation over `cols` in one pass: every pair's
    * correlation derives from the five sufficient statistics (Σx, Σy, Σxy,
    * Σx², Σy², n over rows where both sides are non-null) in a FIXED
    * expression tree — `(nΣxy − ΣxΣy)/√((nΣx²−Σx²ᵗ)(nΣy²−Σy²ᵗ))` — so the
    * oracle mirrors the arithmetic literally instead of trusting two
    * engines' `corr()` update orders to agree. Zero-variance pairs yield
    * the -1 sentinel (correlation undefined).
    *
    * Scale shape: ONE map-side-combined aggregation, k(k−1)/2 pairs × 6
    * sums of doubles — a single reduce of a few hundred numbers regardless
    * of corpus size. Output is pair-count-sized: a model table.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), ix) =>
      val x = col(a).cast("double"); val y = col(b).cast("double")
      val both = x.isNotNull && y.isNotNull
      val xv = when(both, x).otherwise(lit(null)); val yv = when(both, y).otherwise(lit(null))
      Seq(count(xv).as(s"__n_$ix"),
        sum(xv).as(s"__sx_$ix"), sum(yv).as(s"__sy_$ix"),
        sum(xv * yv).as(s"__sxy_$ix"),
        sum(xv * xv).as(s"__sxx_$ix"), sum(yv * yv).as(s"__syy_$ix"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.zipWithIndex.map { case ((a, b), ix) =>
      val n = col(s"__n_$ix"); val sx = col(s"__sx_$ix"); val sy = col(s"__sy_$ix")
      val num = n * col(s"__sxy_$ix") - sx * sy
      val dx = n * col(s"__sxx_$ix") - sx * sx
      val dy = n * col(s"__syy_$ix") - sy * sy
      struct(lit(a).as("col_a"), lit(b).as("col_b"), n.as("n_both"),
        when(dx > 0 && dy > 0, round(num / sqrt(dx * dy), 4))
          .otherwise(lit(-1.0)).as("corr4"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Population stability index — the drift monitor between a reference and
    * a current sample of the same metric (training-serving skew, week-over-
    * week corpus drift): values bin into `bins` fixed-width buckets over
    * [lo, hi) (out-of-range values clamp into the edge bins, so the index
    * is total), shares get the standard 1e-6 floor (an empty bin must not
    * blow up the log), and each bin contributes `(p−q)·ln(p/q)`; `psi` is
    * the summed index repeated on every row (< 0.1 stable, > 0.25 shifted,
    * by the usual reading). Every bin appears even when empty — the output
    * is a `bins`-row model table.
    *
    * Scale shape: TWO map-side-combined bin counts (one scan each side);
    * everything after runs on the ≤ bins-row table (the histQuantiles
    * model-table window policy).
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2 && hi > lo, "need >= 2 bins and hi > lo")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, n: String) = df
      .where(col(valueCol).isNotNull)
      .select(least(greatest(floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
        lit(bins - 1L)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val spine = ref.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // bins-row model table: the unpartitioned windows never see the corpus
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val p = greatest(col("n_ref").cast("double") / sum("n_ref").over(all), lit(1e-6))
    val q = greatest(col("n_cur").cast("double") / sum("n_cur").over(all), lit(1e-6))
    joined
      .withColumn("contrib", (p - q) * log(p / q))
      .withColumn("psi", sum(col("contrib")).over(all))
  }

  /** [[psi]] finalize over PRE-BINNED counts keyed by an arbitrary grouping
    * column (a streaming window, a day partition): every (key, bin) cell is
    * densified from the key spine so empty bins participate, shares take
    * the same 1e-6 floor, and each key gets its summed index. All windows
    * run per-key over ≤ bins rows — model-sized.
    */
  def psiFromCounts(cur: DataFrame, keyCol: String, ref: DataFrame,
      bins: Int): DataFrame = {
    val spine = cur.select(col(keyCol)).distinct()
      .crossJoin(cur.sparkSession.range(bins).select(col("id").cast("int").as("bin")))
    val perKey = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
    val joined = spine
      .join(cur.select(col(keyCol), col("bin"), col("n").as("n_cur")),
        Seq(keyCol, "bin"), "left")
      .join(ref.select(col("bin"), col("n").as("n_ref")), Seq("bin"), "left")
      // the ref total rides a broadcast 1-row frame so bins ABSENT from the
      // reference still see the right denominator
      .crossJoin(broadcast(ref.agg(sum(col("n")).as("__rt"))))
      .select(col(keyCol), col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        col("__rt"))
    val p = greatest(col("n_ref").cast("double") / col("__rt"), lit(1e-6))
    val q = greatest(col("n_cur").cast("double") / sum("n_cur").over(perKey), lit(1e-6))
    joined
      .withColumn("contrib", (p - q) * log(p / q))
      .withColumn("psi", sum(col("contrib")).over(perKey))
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy gate
    * that runs next to PII redaction before a corpus ships: every
    * equivalence class (distinct quasi-identifier combination) smaller than
    * `k` re-identifies its members. Returns one row per violating class
    * with its size, plus the caller-facing summary columns repeated on each
    * row (violating classes, exposed rows) so the gate is a one-scan
    * decision. Nulls are a quasi-identifier value of their own.
    *
    * Scale shape: ONE map-side-combined groupBy on the quasi-identifier
    * tuple; the violation table is at most (k−1)·classes rows — the
    * suppression worklist a pipeline then anti-joins against the corpus.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi-identifier columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
  }

  /** Gini concentration coefficient over group sizes — the domain-balance
    * diagnostic for corpus mixing (0 = every domain contributes equally,
    * →1 = one domain is the corpus): computed from the group-count table
    * with the rank formula `G = (2·Σ(rank·c) / (n·Σc)) − (n+1)/n` over
    * counts ranked ascending (ties by group id, so the rank — and G — is
    * engine-reproducible).
    *
    * Scale shape: the corpus collapses to one count per group (map-side
    * combined); the rank window runs over the GROUP table only — model-
    * sized, the same policy as histQuantiles' bin window. Output: one row.
    */
  def giniConcentration(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c"), col("__g")) // group-table-only window (see above)
    counts.withColumn("__r", row_number().over(w))
      .agg(count(lit(1)).as("n_groups"), sum("__c").as("n_rows"),
        sum(col("__r") * col("__c")).as("__rc"))
      .select(col("n_groups"), col("n_rows"),
        (lit(2.0) * col("__rc").cast("double") /
          (col("n_groups").cast("double") * col("n_rows").cast("double")) -
          (col("n_groups") + 1).cast("double") / col("n_groups").cast("double"))
          .as("gini"))
  }

  /** Per-column Shannon entropy (nats) over the value distribution — the
    * skew/diversity diagnostic next to [[profile]]'s cardinality: near-0
    * entropy flags a degenerate column (one dominant value — a broken
    * extractor, a constant partition key), entropy ≈ ln(distinct) flags a
    * near-uniform one. Nulls count as a value of their own (a 99%-null
    * column IS degenerate). `H = ln(N) − (Σ c·ln c)/N` over value counts c
    * — one aggregate in that FIXED tree, so engines mirror it literally
    * without agreeing on per-value p·ln p summation order beyond the
    * commutative sum of c·ln c.
    *
    * Scale shape: ONE scan — each row explodes to k (column, value) pairs
    * (the generator runs inside the scan stage, so no extra exchange before
    * the count), one map-side-combined groupBy on (column, value) — the
    * same k·N-row shuffle volume k separate distinct counts would pay, but
    * the corpus is READ once instead of k times — then a value-count-sized
    * reduce per column. Output is k rows.
    */
  def entropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "entropy needs at least one column")
    val pairs = df.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"), col(c).cast("string").as("__v"))
    }: _*)).as("p")).select("p.*")
    pairs.groupBy(col("column"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("column"))
      .agg(sum("__c").as("__n"), sum(col("__c") * log(col("__c"))).as("__s"))
      .select(col("column"),
        col("__n").as("n_rows"),
        round(log(col("__n")) - col("__s") / col("__n"), 6).as("entropy6"))
  }
}
