package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{mix64_hash, string_hash64}

/** Cardinality sketching for corpus profiling: a fully relational
  * HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) built from graft's
  * own mirrored hash kernels, so — unlike Spark's built-in
  * `approx_count_distinct` — every register and the final estimate are
  * bit-reproducible in plain SQL (the DuckDB oracle recomputes them
  * value-for-value).
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
  private def hash64(dt: DataType, c: Column, seed: Long): Column = dt match {
    case StringType => string_hash64(c, seed)
    case ByteType | ShortType | IntegerType | LongType => mix64_hash(c.cast("long"), seed)
    case other =>
      throw new IllegalArgumentException(s"hllDistinct supports string/integral columns, got $other")
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

  /** Collapses a register table into the HLL estimate (one row, one double
    * column `approx_distinct`). Small-range (linear counting) correction per
    * the original paper; the large-range correction is unnecessary with
    * 64-bit hashes at any feasible cardinality.
    */
  def hllEstimate(regs: DataFrame, p: Int = 12): DataFrame = {
    val m = 1 << p
    val alphaMM = alpha(m) * m.toDouble * m.toDouble
    val two53 = 9007199254740992.0 // 2^53
    // exact integer register sum: Σ 2^(53-M); empty registers contribute 2^53
    val agg = regs.agg(
      count(lit(1)).as("__nb"),
      // shiftleft with a column shift amount needs the SQL form (the Column
      // API variant only takes a literal Int)
      sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)").cast(DecimalType(38, 0))).as("__s"))
    agg.select(
      (when(col("__nb") === 0, lit(0.0)).otherwise {
        val total = coalesce(col("__s"), lit(0).cast(DecimalType(38, 0))) +
          (lit(m.toLong) - col("__nb")).cast(DecimalType(38, 0)) *
            lit(9007199254740992L).cast(DecimalType(38, 0))
        val sumInv = total.cast("double") / lit(two53)
        val raw = lit(alphaMM) / sumInv
        val zeros = lit(m.toLong) - col("__nb")
        when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
          .otherwise(raw)
      }).as("approx_distinct"))
  }

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
}
