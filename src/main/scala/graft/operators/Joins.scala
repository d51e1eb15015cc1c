package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-equi join operators re-expressed as bounded equi-joins — the only
  * shapes that survive 100 TB. Both operators here turn an inequality /
  * similarity predicate into a candidate equi-join on derived keys plus a
  * cheap codegen'd verify, so Spark plans a plain hash join (broadcast or
  * shuffled) instead of BroadcastNestedLoopJoin / cartesian.
  */
object Joins {

  /** Edit-distance threshold join: all (left, right) pairs with
    * `levenshtein(left[leftCol], right[rightCol]) <= maxDist`, each pair
    * emitted once with an `edit_dist` column.
    *
    * Spark-first via positional segment filtering (the PassJoin family,
    * Li/Deng/Feng 2011 — public literature, no reference counterpart):
    * every string on the right is split into `maxDist + 1` contiguous
    * segments. If ed(s, t) <= d then at most d of those d+1 segments are
    * touched by an edit, so at least one survives VERBATIM in t, shifted by
    * at most d positions (each edit shifts later characters by <= 1). The
    * right side therefore indexes (slot, |s|, segment); the left side
    * probes every substring that could equal slot i of a length-l string
    * for l within +-d of its own length and start within +-d of that
    * segment's home position. Both key sets come from codegen'd
    * [[graft.functions.TextKernel]] calls ("slot:len:segment" strings);
    * candidates meet in a plain equi-join on that key and
    * `functions.levenshtein(_, _, threshold)` (codegen'd, band-limited with
    * early exit) verifies survivors.
    *
    * Cost: the whole join runs at DISTINCT-VALUE granularity — both sides
    * collapse to their distinct strings first (the exact-dup collapse, same
    * policy as the minhash family), candidates are generated per distinct
    * value, and verified value pairs re-expand to rows through two plain
    * equi-joins on the string. Repeated values (fixed vocab, boilerplate
    * fields) therefore cost ONE candidate row each, not one per occurrence.
    * The probe fan-out is a compile-time constant — (d+1) slots x (2d+1)
    * lengths x (2d+1) starts, 18 keys at d=1, 75 at d=2 — and the index
    * side emits d+1 rows per value, so both sides stay O(distinct) and the
    * join is an ordinary shuffled/broadcast hash join; there is no O(n*m)
    * comparison stage anywhere. Two residual scale hazards at 100 TB:
    * (1) DISTINCT values sharing a long common run (fixed-format ids like
    * "Customer#00001729") collide on the shared segment's key, and
    * candidates within such a family are inherently quadratic for any
    * single-segment pigeonhole scheme — the banded verify sits as a
    * streaming codegen'd filter right behind the hash join (bounded memory,
    * O(d*len) per candidate; dedup-then-verify OOMed on exactly this shape
    * at 10x), so the cost is CPU-linear in candidates, never a buffered
    * shuffle; (2) the re-expansion joins key on the string value, so a
    * value occurring k times on both sides legitimately emits k^2 pairs —
    * aggregate at value granularity upstream if row-level pairs aren't
    * needed. Keep d <= 3.
    *
    * A value pair can collide on several slots, so verified pairs are
    * deduped on the value pair before re-expansion. Self-join: pass the
    * same frame twice and filter on an id afterwards.
    */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int,
      suffix: String = "_right"): DataFrame = {
    require(maxDist >= 1 && maxDist <= 5, "maxDist must be in [1, 5]")
    import graft.functions.TextFunctions.{passjoin_index, passjoin_probe}

    // candidate keys come from one codegen'd kernel call per distinct value
    // (a column-expression expansion of the (d+1)(2d+1)(2d+1) probe grid
    // blew past janino's method-size limit and dropped the stage to
    // interpreted)
    val rKeyed = right
      .where(col(rightCol).isNotNull)
      .select(col(rightCol).as("__rstr")).distinct()
      .select(col("__rstr"), explode(passjoin_index(col("__rstr"), maxDist)).as("__seg"))
    val lKeyed = left
      .where(col(leftCol).isNotNull)
      .select(col(leftCol).as("__lstr")).distinct()
      .select(col("__lstr"), explode(passjoin_probe(col("__lstr"), maxDist)).as("__seg"))

    val valuePairs = lKeyed
      .join(rKeyed, Seq("__seg"))
      .withColumn("__dist", levenshtein(col("__lstr"), col("__rstr"), maxDist))
      .where(col("__dist") >= 0) // threshold form returns -1 when above d
      .select("__lstr", "__rstr", "__dist")
      .dropDuplicates("__lstr", "__rstr")

    // re-expand value pairs to row pairs; alias qualifiers keep the
    // self-join case (left eq right) unambiguous
    val lAl = left.alias("__fj_l")
    val rAl = right.alias("__fj_r")
    val leftNames = left.columns.toSet
    valuePairs
      .join(lAl, col("__lstr") === col(s"__fj_l.$leftCol"))
      .join(rAl, col("__rstr") === col(s"__fj_r.$rightCol"))
      .select(left.columns.toSeq.map(c => col(s"__fj_l.$c").as(c)) ++
        right.columns.toSeq.map { c =>
          col(s"__fj_r.$c").as(if (leftNames(c)) c + suffix else c)
        } ++ Seq(col("__dist").as("edit_dist")): _*)
  }

  /** Interval overlap join: all (left, right) pairs sharing `on` keys whose
    * closed intervals [leftStart, leftEnd] and [rightStart, rightEnd]
    * overlap (`ls <= re AND rs <= le`). Start/end are numeric columns (cast
    * dates/timestamps to days/seconds first).
    *
    * Spark-first via interval binning: each interval is replicated to the
    * fixed-width buckets it spans (`floor(start/w) .. floor(end/w)`), the
    * sides meet in an equi-join on (`on`, bucket), and each qualifying pair
    * is emitted EXACTLY once by keeping only the first bucket both
    * intervals share — `bucket == greatest(floor(ls/w), floor(rs/w))` — so
    * no distinct pass is needed. This replaces the planner's only native
    * option for pure inequality predicates (BroadcastNestedLoopJoin, O(n*m))
    * with a shuffled hash join whose cost is O(n * len/w) replicated rows.
    * Pick `bucketWidth` near the typical interval length: replication
    * factor is len/w + 1, while a too-wide bucket degrades toward
    * per-key all-pairs within one bucket. Long-tail intervals (one row
    * spanning thousands of buckets) are the skew risk at 100 TB — cap or
    * split them upstream if the domain allows.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Double,
      suffix: String = "_right"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    def bucket(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")
    def buckets(s: String, e: String): Column =
      sequence(bucket(col(s)), bucket(col(e)))

    // prefix-rename both sides up front: kills self-join attribute
    // ambiguity (left and right may be the SAME frame) and makes the
    // equi-join keys plain columns Catalyst can hash-partition on
    val lb = left
      .where(col(leftStart).isNotNull && col(leftEnd).isNotNull &&
        col(leftStart) <= col(leftEnd))
      .select(left.columns.map(c => col(c).as(s"__l_$c")) :+
        explode(buckets(leftStart, leftEnd)).as("__bucket"): _*)
    val rb = right
      .where(col(rightStart).isNotNull && col(rightEnd).isNotNull &&
        col(rightStart) <= col(rightEnd))
      .select(right.columns.map(c => col(c).as(s"__r_$c")) :+
        explode(buckets(rightStart, rightEnd)).as("__bucket"): _*)

    val keyCond = on.map(c => col(s"__l_$c") === col(s"__r_$c"))
    val overlap = col(s"__l_$leftStart") <= col(s"__r_$rightEnd") &&
      col(s"__r_$rightStart") <= col(s"__l_$leftEnd")
    val firstShared = lb("__bucket") ===
      greatest(bucket(col(s"__l_$leftStart")), bucket(col(s"__r_$rightStart")))

    // shuffle-hash, not broadcast: the planner's size estimate predates the
    // bucket explode, so it happily broadcasts a million-row build side
    // (single-threaded hashmap build, driver collect — 6.5 s vs 1.5 s at
    // sf0.1, and a guaranteed OOM for a genuinely large left). A hash join
    // partitioned on (key, bucket) is the shape that survives fact-to-fact
    // interval joins at 100 TB; sort-merge adds nothing since bucket groups
    // are small by construction.
    val joined = lb.hint("shuffle_hash").join(rb,
      (Seq(overlap, firstShared) ++ keyCond).reduce(_ && _) &&
        lb("__bucket") === rb("__bucket"))

    val leftNames = left.columns.toSet
    joined.select(
      left.columns.toSeq.map(c => col(s"__l_$c").as(c)) ++
        right.columns.toSeq.map { c =>
          col(s"__r_$c").as(if (leftNames(c)) c + suffix else c)
        }: _*)
  }
}
