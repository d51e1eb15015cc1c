package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{mix64_hash, string_hash64}

/** Sketching for corpus profiling: a fully relational HyperLogLog
  * (Flajolet, Fusy, Gandouet, Meunier 2007) for cardinality and a
  * count-min sketch (Cormode & Muthukrishnan 2005) for point frequencies /
  * heavy hitters, both built from graft's own mirrored hash kernels, so —
  * unlike Spark's built-in `approx_count_distinct` — every register and
  * final estimate is bit-reproducible in plain SQL (the DuckDB oracle
  * recomputes them value-for-value).
  *
  * Scale shape: one codegen'd projection (hash → bucket/rho) and one
  * map-side-combined groupBy to at most 2^p register rows, whatever the
  * input size; registers are mergeable (max per bucket), so per-partition /
  * per-day register tables union into corpus-wide estimates without
  * rescanning — the sketch property that matters at 100 TB.
  *
  * Determinism note: the register sum is computed in exact integer space
  * (Σ 2^(53−M) as DECIMAL(38,0)) — summing 2^−M doubles directly would make
  * the estimate depend on partial-aggregation order.
  */
object Sketch {

  /** Max rho: after the bucket bits are shifted out, 64−p bits remain; the
    * all-zero remainder gets rank (64−p)+1 by convention.
    */
  private def rhoMax(p: Int): Int = 64 - p + 1

  /** Seed-mixed 64-bit row hash for a column, by type: longs/ints go through
    * splitmix64, strings through the polynomial fold — both mirrored in SQL.
    */
  private[operators] def hash64(dt: DataType, c: Column, seed: Long): Column = dt match {
    case StringType => string_hash64(c, seed)
    case ByteType | ShortType | IntegerType | LongType => mix64_hash(c.cast("long"), seed)
    case other =>
      throw new IllegalArgumentException(s"sketches support string/integral columns, got $other")
  }

  /** HLL registers of one column: at most 2^p rows `(bucket, m)` where `m`
    * is the register's max leading-zero rank. The reusable/mergeable
    * intermediate — persist per shard and [[hllMerge]] across shards.
    */
  def hllRegisters(df: DataFrame, valueCol: String, p: Int = 12, seed: Long = 42L): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val h = hash64(df.schema(valueCol).dataType, col(valueCol), seed)
    val hashed = df.where(col(valueCol).isNotNull).select(h.as("__h"))
    // bucket = top p bits; rho = 1-based position of the first 1-bit in the
    // remaining 64-p bits (bin() renders the long as exactly the two's
    // complement bit string on both engines)
    val w = shiftleft(col("__h"), p)
    val rho = when(w === 0L, lit(rhoMax(p)))
      .otherwise(instr(lpad(bin(w), 64, "0"), "1"))
    hashed
      .select(shiftrightunsigned(col("__h"), 64 - p).as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("m"))
  }

  /** Merges register tables of the SAME (p, seed): per-bucket max. */
  def hllMerge(regs: DataFrame*): DataFrame =
    regs.reduce(_ unionByName _).groupBy("bucket").agg(max("m").as("m"))

  /** The estimate expression over a register aggregation's `(__nb, __s)`
    * columns: exact-integer register sum + the paper's small-range linear
    * counting correction (the large-range correction is unnecessary with
    * 64-bit hashes at any feasible cardinality).
    */
  private def estimateCol(p: Int): Column = {
    val m = 1 << p
    val alphaMM = alpha(m) * m.toDouble * m.toDouble
    val two53 = 9007199254740992.0 // 2^53
    when(col("__nb") === 0, lit(0.0)).otherwise {
      val total = coalesce(col("__s"), lit(0).cast(DecimalType(38, 0))) +
        (lit(m.toLong) - col("__nb")).cast(DecimalType(38, 0)) *
          lit(9007199254740992L).cast(DecimalType(38, 0))
      val sumInv = total.cast("double") / lit(two53)
      val raw = lit(alphaMM) / sumInv
      val zeros = lit(m.toLong) - col("__nb")
      when(raw <= lit(2.5 * m) && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
        .otherwise(raw)
    }
  }

  // exact integer register sum: Σ 2^(53-M); empty registers contribute 2^53.
  // shiftleft with a column shift amount needs the SQL form (the Column API
  // variant only takes a literal Int)
  private def registerAggs: Seq[Column] = Seq(
    count(lit(1)).as("__nb"),
    sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)").cast(DecimalType(38, 0))).as("__s"))

  /** Collapses a register table into the HLL estimate (one row, one double
    * column `approx_distinct`).
    */
  def hllEstimate(regs: DataFrame, p: Int = 12): DataFrame =
    regs.agg(registerAggs.head, registerAggs.tail: _*)
      .select(estimateCol(p).as("approx_distinct"))

  /** Per-group register tables: `(groupCols…, bucket, m)` — the mergeable
    * per-group cardinality state ([[hllMerge]] per group after adding the
    * group keys to its groupBy).
    */
  def hllRegistersByGroup(df: DataFrame, valueCol: String, groupCols: Seq[String],
      p: Int = 12, seed: Long = 42L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val h = hash64(df.schema(valueCol).dataType, col(valueCol), seed)
    val hashed = df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ h.as("__h"): _*)
    val w = shiftleft(col("__h"), p)
    val rho = when(w === 0L, lit(rhoMax(p)))
      .otherwise(instr(lpad(bin(w), 64, "0"), "1"))
    hashed
      .select(groupCols.map(col) :+
        shiftrightunsigned(col("__h"), 64 - p).as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*).agg(max("rho").as("m"))
  }

  /** Distinct-values-per-group at sketch cost: `(groupCols…,
    * approx_distinct)` — group cardinality profiling (users per event type,
    * domains per language…) in ONE pass with O(groups · 2^p) state instead
    * of a `countDistinct` shuffle of every distinct pair.
    */
  def hllDistinctByGroup(df: DataFrame, valueCol: String, groupCols: Seq[String],
      p: Int = 12, seed: Long = 42L): DataFrame =
    hllRegistersByGroup(df, valueCol, groupCols, p, seed)
      .groupBy(groupCols.map(col): _*)
      .agg(registerAggs.head, registerAggs.tail: _*)
      .select(groupCols.map(col) :+ estimateCol(p).as("approx_distinct"): _*)

  /** Per-event-time-window HLL registers `(window, bucket, m)` — register
    * maxima are max-mergeable, so on a stream this is one stateful windowed
    * aggregation with ≤ 2^p rows of state per open window (the streaming
    * face is [[graft.streaming.EventStream.hllStream]]); batch estimates
    * come from [[hllDistinctWindowed]].
    */
  def hllRegistersWindowed(df: DataFrame, valueCol: String,
      windowDur: String = "1 hour", p: Int = 12, seed: Long = 42L,
      tsCol: String = "ts"): DataFrame =
    hllRegistersByGroup(df.withColumn("window", window(col(tsCol), windowDur)),
      valueCol, Seq("window"), p, seed)

  /** Per-window approximate distinct count `(window, approx_distinct)`. */
  def hllDistinctWindowed(df: DataFrame, valueCol: String,
      windowDur: String = "1 hour", p: Int = 12, seed: Long = 42L,
      tsCol: String = "ts"): DataFrame =
    hllDistinctByGroup(df.withColumn("window", window(col(tsCol), windowDur)),
      valueCol, Seq("window"), p, seed)

  /** Standard HLL bias constant (m ≥ 128 branch; p ≥ 7 in practice). */
  def alpha(m: Int): Double =
    if (m <= 16) 0.673 else if (m <= 32) 0.697 else if (m <= 64) 0.709
    else 0.7213 / (1.0 + 1.079 / m)

  /** Approximate distinct counts for several columns of `df`: one row
    * `(column, approx_distinct)` per entry — the corpus-profiling face.
    */
  def hllDistinct(df: DataFrame, cols: Seq[String], p: Int = 12, seed: Long = 42L): DataFrame = {
    require(cols.nonEmpty, "no columns given")
    cols.map { c =>
      hllEstimate(hllRegisters(df, c, p, seed), p)
        .select(lit(c).as("column"), col("approx_distinct"))
    }.reduce(_ unionByName _)
  }

  // ---- count-min sketch ----------------------------------------------------

  /** Per-row, per-depth counter index for the count-min sketch: row hash
    * xor'd with a per-depth seed, remixed, masked to `width` (power of two,
    * so the signed pmod equals the unsigned modulus the SQL mirror computes).
    */
  private def cmsIdx(h: Column, d: Column, width: Int, seed: Long): Column =
    pmod(mix64_hash(h.bitwiseXOR(lit(seed) + d), 0L), lit(width.toLong))

  /** Count-min sketch registers (Cormode & Muthukrishnan 2005, "An improved
    * data stream summary: the count-min sketch and its applications") of one
    * column: at most `depth`×`width` rows `(d, idx, c)` — frequency mass per
    * hashed counter. Like [[hllRegisters]] this is the mergeable
    * intermediate: persist per shard / per day and [[cmsMerge]] across
    * shards, then answer point frequency queries with [[cmsLookup]] without
    * rescanning the corpus — heavy-hitter profiling over unbounded key
    * domains (tokens, domains, n-grams) in O(depth·width) memory, whatever
    * the input size.
    *
    * Scale shape: one codegen'd projection (hash → depth×idx) and one
    * map-side-combined groupBy to ≤ depth·width rows. `width` must be a
    * power of two (the index is the hash's unsigned remainder — a power of
    * two makes signed and unsigned arithmetic agree, see [[cmsIdx]]).
    */
  def cmsRegisters(df: DataFrame, valueCol: String, depth: Int = 4, width: Int = 1024,
      seed: Long = 42L): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
    require(width >= 2 && (width & (width - 1)) == 0, "width must be a power of two")
    val h = hash64(df.schema(valueCol).dataType, col(valueCol), seed)
    df.where(col(valueCol).isNotNull)
      .select(h.as("__h"), explode(lit((0 until depth).toArray)).as("d"))
      .groupBy(col("d"), cmsIdx(col("__h"), col("d"), width, seed).as("idx"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merges register tables of the SAME (depth, width, seed): per-counter sum. */
  def cmsMerge(regs: DataFrame*): DataFrame =
    regs.reduce(_ unionByName _).groupBy("d", "idx").agg(sum("c").as("c"))

  /** Per-event-time-window CMS registers: the [[cmsRegisters]] rows keyed by
    * `window(tsCol, windowDur)` as well. Register counts are additive, so on
    * a stream this is one stateful windowed aggregation whose partial
    * registers merge across micro-batches natively (state is ≤ depth×width
    * counters per open window, never the raw values) — the streaming face is
    * [[graft.streaming.EventStream.cmsStream]]. Per-window estimates come
    * from [[cmsLookupWindowed]].
    */
  def cmsRegistersWindowed(df: DataFrame, valueCol: String,
      windowDur: String = "1 hour", depth: Int = 4, width: Int = 1024,
      seed: Long = 42L, tsCol: String = "ts"): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
    require(width >= 2 && (width & (width - 1)) == 0, "width must be a power of two")
    val h = hash64(df.schema(valueCol).dataType, col(valueCol), seed)
    df.where(col(valueCol).isNotNull)
      .select(window(col(tsCol), windowDur).as("window"), h.as("__h"),
        explode(lit((0 until depth).toArray)).as("d"))
      .groupBy(col("window"), col("d"), cmsIdx(col("__h"), col("d"), width, seed).as("idx"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates of `probes` against per-window registers: one row per
    * (window, probe) with the count-min upper-bound estimate.
    */
  def cmsLookupWindowed(regs: DataFrame, probes: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024, seed: Long = 42L): DataFrame = {
    val h = hash64(probes.schema(valueCol).dataType, col(valueCol), seed)
    val pd = probes.where(col(valueCol).isNotNull)
      .select(col(valueCol), h.as("__h"), explode(lit((0 until depth).toArray)).as("d"))
      .select(col(valueCol), col("d"), cmsIdx(col("__h"), col("d"), width, seed).as("idx"))
    // a probe row absent from a window's registers means that counter is 0 —
    // build the (window × probe × d) grid first so the min can see the zero
    regs.select(col("window")).distinct()
      .crossJoin(broadcast(pd))
      .join(regs, Seq("window", "d", "idx"), "left")
      .groupBy(col("window"), col(valueCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("approx_count"))
  }

  /** Equal-width histogram bin counts of a numeric column over [min, max]:
    * at most `bins` rows `(__b, __c)` plus the (lo, hi, n) stats row folded
    * in — the mergeable intermediate behind [[histQuantiles]] (same-bounds
    * tables merge by per-bin sum). Two exact passes: a 3-value min/max/count
    * aggregate, then one map-side-combined groupBy to ≤ `bins` rows —
    * corpus-size-independent state, the histogram-sketch shape (Greenwald-
    * Khanna-class accuracy is unnecessary for corpus profiling; equal-width
    * bins are deterministic and SQL-mirrorable bit-for-bit).
    */
  private def histCounts(data: DataFrame, stats: DataFrame, bins: Int): DataFrame = {
    val width = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val bin = when(col("__hi") === col("__lo"), lit(0.0))
      .otherwise(least(floor((col("__v") - col("__lo")) / width), lit(bins - 1.0)))
      .cast("int")
    data.crossJoin(broadcast(stats))
      .groupBy(bin.as("__b")).agg(count(lit(1)).as("__c"))
  }

  /** Quantile estimates from an equal-width histogram: one row
    * `(q, quantile)` per requested quantile — bin located by cumulative
    * count, value linearly interpolated inside the bin. Deterministic double
    * arithmetic in a fixed op order (the DuckDB oracle mirrors it literally)
    * — unlike `approx_percentile`, whose sketch is not reproducible in SQL.
    * Empty input yields no rows; constant input yields the constant.
    *
    * Scale shape: after the two corpus passes of [[histCounts]] everything
    * runs on ≤ `bins` rows (the single-partition cumulative window is over
    * the bin table, a model artifact, never the data).
    */
  def histQuantiles(df: DataFrame, valueCol: String, bins: Int = 128,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(bins >= 1 && bins <= 65536, "bins must be in [1, 65536]")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), "quantiles must be in [0, 1]")
    val data = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val stats = data.agg(min("__v").as("__lo"), max("__v").as("__hi"),
      count(lit(1)).as("__n"))
    val counts = histCounts(data, stats, bins)
    val w = org.apache.spark.sql.expressions.Window.orderBy("__b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = counts.withColumn("__cum", sum("__c").over(w))
    val qf = df.sparkSession.range(1).select(explode(array(qs.map(lit): _*)).as("q"))
    val width = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val est = col("__lo") + width *
      (col("__b") + (col("q") * col("__n") - (col("__cum") - col("__c"))) / col("__c"))
    qf.crossJoin(cum).crossJoin(broadcast(stats))
      .where(col("__cum") >= col("q") * col("__n"))
      .select(col("q"), col("__b"), est.as("__est"))
      .groupBy("q").agg(min_by(col("__est"), col("__b")).as("quantile"))
  }

  /** [[histQuantiles]] with the histogram built once PER GROUP: one row
    * `(groupCols..., q, quantile)` per (group, requested quantile). Same two
    * corpus passes — a per-group 3-value stats aggregate, then one
    * map-side-combined bin count — and the per-group state stays ≤ `bins`
    * rows, so total model size is #groups × bins whatever the corpus size.
    * The cumulative window partitions by group OVER THE BIN TABLE (a model
    * artifact), never the data. Groups whose values are all null get no row.
    */
  def histQuantilesByGroup(df: DataFrame, valueCol: String,
      groupCols: Seq[String], bins: Int = 128,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(bins >= 1 && bins <= 65536, "bins must be in [1, 65536]")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), "quantiles must be in [0, 1]")
    val g = groupCols.map(col)
    val data = df.where(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)
    val stats = data.groupBy(g: _*).agg(min("__v").as("__lo"),
      max("__v").as("__hi"), count(lit(1)).as("__n"))
    val width = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val bin = when(col("__hi") === col("__lo"), lit(0.0))
      .otherwise(least(floor((col("__v") - col("__lo")) / width), lit(bins - 1.0)))
      .cast("int")
    val counts = data.join(stats, groupCols)
      .groupBy(g :+ bin.as("__b"): _*).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy("__b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = counts.withColumn("__cum", sum("__c").over(w))
    val qf = df.sparkSession.range(1).select(explode(array(qs.map(lit): _*)).as("q"))
    val est = col("__lo") + width *
      (col("__b") + (col("q") * col("__n") - (col("__cum") - col("__c"))) / col("__c"))
    cum.crossJoin(broadcast(qf)).join(stats, groupCols)
      .where(col("__cum") >= col("q") * col("__n"))
      .select(g ++ Seq(col("q"), col("__b"), est.as("__est")): _*)
      .groupBy(g :+ col("q"): _*).agg(min_by(col("__est"), col("__b")).as("quantile"))
  }

  // ---- Bloom filter --------------------------------------------------------

  /** Per-row, per-hash bit position for the Bloom filter: the row hash xor'd
    * with a per-hash seed, remixed, masked to `numBits` (power of two — same
    * signed/unsigned agreement as [[cmsIdx]]).
    */
  private[operators] def bloomIdx(h: Column, k: Column, numBits: Int, seed: Long): Column =
    pmod(mix64_hash(h.bitwiseXOR(lit(seed) + k), 0L), lit(numBits.toLong))

  /** Bloom filter bit set of one column (Bloom 1970, "Space/time trade-offs
    * in hash coding with allowable errors"): at most `numBits` rows `(bit)` —
    * the DISTINCT positions set by hashing every value `numHashes` ways. The
    * mergeable intermediate: persist per shard / per day, [[bloomMerge]]
    * across shards (bitwise OR ≡ union-distinct), then gate a new batch with
    * [[bloomContains]] without rescanning the corpus — the membership shape
    * of incremental decontamination / URL-seen lists at 100 TB: sketch state
    * is O(numBits) whatever the corpus size, no false negatives, false
    * positives bounded by (1 − e^(−kn/m))^k.
    *
    * Scale shape: one codegen'd projection (hash → numHashes positions) and
    * one map-side-combined distinct to ≤ `numBits` rows.
    */
  def bloomBits(df: DataFrame, valueCol: String, numBits: Int = 1 << 16,
      numHashes: Int = 5, seed: Long = 42L): DataFrame = {
    require(numBits >= 2 && (numBits & (numBits - 1)) == 0, "numBits must be a power of two")
    require(numHashes >= 1 && numHashes <= 16, "numHashes must be in [1, 16]")
    val h = hash64(df.schema(valueCol).dataType, col(valueCol), seed)
    df.where(col(valueCol).isNotNull)
      .select(h.as("__h"), explode(lit((0 until numHashes).toArray)).as("__k"))
      .select(bloomIdx(col("__h"), col("__k"), numBits, seed).as("bit"))
      .distinct()
  }

  /** Merges bit sets of the SAME (numBits, numHashes, seed): union-distinct
    * (the relational bitwise OR).
    */
  def bloomMerge(regs: DataFrame*): DataFrame =
    regs.reduce(_ unionByName _).distinct()

  /** Membership queries against a bit set: for each probe row, `maybe_present`
    * = all `numHashes` positions of its `valueCol` are set. False means
    * definitely absent (the no-false-negative guarantee); true is approximate.
    * Probe values must be distinct. The bit table is bounded by `numBits`,
    * so the join broadcasts; probes never rescan the sketched corpus.
    */
  def bloomContains(regs: DataFrame, probes: DataFrame, valueCol: String,
      numBits: Int = 1 << 16, numHashes: Int = 5, seed: Long = 42L): DataFrame = {
    val h = hash64(probes.schema(valueCol).dataType, col(valueCol), seed)
    val pd = probes.where(col(valueCol).isNotNull)
      .select(col(valueCol), h.as("__h"), explode(lit((0 until numHashes).toArray)).as("__k"))
      .select(col(valueCol), bloomIdx(col("__h"), col("__k"), numBits, seed).as("bit"))
    pd.join(broadcast(regs.withColumn("__set", lit(1))), Seq("bit"), "left")
      .groupBy(col(valueCol))
      .agg((count(col("__set")) === lit(numHashes.toLong)).as("maybe_present"))
  }

  /** Point frequency queries against a register table: for each probe row,
    * the count-min estimate of its `valueCol` frequency — min over the
    * `depth` counters the value hashes to, 0 when a counter is absent
    * (never an underestimate, overestimates bounded by the sketch's ε·N).
    * Probe values must be distinct. The register table is counter-bounded,
    * so the join broadcasts; probes never rescan the sketched corpus.
    */
  def cmsLookup(regs: DataFrame, probes: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024, seed: Long = 42L): DataFrame = {
    val h = hash64(probes.schema(valueCol).dataType, col(valueCol), seed)
    val pd = probes.where(col(valueCol).isNotNull)
      .select(col(valueCol), h.as("__h"), explode(lit((0 until depth).toArray)).as("d"))
      .select(col(valueCol), col("d"), cmsIdx(col("__h"), col("d"), width, seed).as("idx"))
    pd.join(broadcast(regs), Seq("d", "idx"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("approx_count"))
  }

  /** Exact frequent items above `minCount`, CMS-prefiltered: pass 1 builds
    * the count-min registers (≤ depth × width mergeable rows); pass 2
    * estimates every distinct value against the broadcast registers and
    * keeps only CMS-plausible candidates for the exact count.
    *
    * Count-min only ever OVERestimates, so the candidate set is a strict
    * superset of the true frequent set and the exact-count filter makes the
    * result EXACT — same output as a full `groupBy(value).count()` filter,
    * but the wide exact aggregation only sees candidates. That inversion is
    * the 100 TB point: over a billion-distinct token column the full exact
    * count shuffles every distinct token, while here the register table is
    * a broadcast constant and the per-partition pre-aggregation drops
    * non-candidates before the exchange (the partial agg still touches all
    * rows, but the shuffled state is candidates only). Size `width` so
    * collision inflation (≈ n_rows / width per counter) stays well under
    * `minCount`, or the candidate superset degrades toward "everything".
    *
    * Output: (`valueCol`, `exact_count`) for values with count ≥ minCount.
    */
  def heavyHitters(df: DataFrame, valueCol: String, minCount: Long,
      depth: Int = 4, width: Int = 1024, seed: Long = 42L): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    require(depth.toLong * width <= (1 << 20),
      "depth*width registers embed in the plan as a literal; keep them <= 1M")
    // pass 1: registers, then a BOUNDED collect (<= depth*width counters —
    // sketch metadata, same policy as the IVF centroid fetch) into a dense
    // array literal, so the per-row estimate is pure codegen'd arithmetic:
    // no explode, no join, nothing added to the row before the filter
    val dense = new Array[Long](depth * width)
    cmsRegisters(df, valueCol, depth, width, seed).collect().foreach { r =>
      dense(r.getAs[Int]("d") * width + r.getAs[Long]("idx").toInt) = r.getAs[Long]("c")
    }
    val arr = typedLit(dense.toSeq)
    val h = hash64(df.schema(valueCol).dataType, col(valueCol), seed)
    val est = (0 until depth)
      .map(d => element_at(arr, (cmsIdx(h, lit(d), width, seed) + lit(d * width) + 1).cast("int")))
      .reduce(least(_, _))
    df.where(col(valueCol).isNotNull && est >= minCount)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("exact_count"))
      .where(col("exact_count") >= minCount)
  }
}
