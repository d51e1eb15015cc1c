package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-stream processing: one transformation definition serving both batch
  * and Structured Streaming (reference: erde's chunk-streamed IO model,
  * erde/io read_stream/write_stream — subsumed by Spark partitions for batch
  * and by Structured Streaming for real time).
  */
object EventStream {

  // object field → static reference from executor closures, nothing serialized
  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Recall-loss warning for the capped band buckets: once a bucket holds
    * `maxSigs` distinct signatures, later signatures are not registered and
    * their future exact duplicates stream through unflagged. The cap is a
    * deliberate state bound (a boilerplate flood must not grow state without
    * limit), but hitting it should be observable at runtime.
    */
  private def warnSigCap(variant: String, bucket: Long, maxSigs: Int): Unit =
    log.warn(s"$variant: band bucket $bucket reached maxSigs=$maxSigs; new signatures " +
      "in this bucket are no longer registered (recall loss for their future duplicates)")

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long, n_events: Int, start: Timestamp, end: Timestamp, value_sum: Double)

  /** Hourly (by default) windowed counts/sums per event type — the shared
    * batch/stream aggregation. On a stream, pair with `withWatermark` (see
    * [[windowedStream]]).
    */
  def windowed(df: DataFrame, windowDur: String = "1 hour"): DataFrame =
    df.groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Streaming face of [[windowed]]: event-time watermark bounds state. */
  def windowedStream(stream: DataFrame, watermark: String = "2 hours",
      windowDur: String = "1 hour"): DataFrame =
    windowed(stream.withWatermark("ts", watermark), windowDur)

  /** Per-window value quantiles — the KLL sketch as a streaming aggregation:
    * the same mergeable [[graft.operators.Kll.QuantilesAgg]] buffer runs
    * inside the stateful windowed aggregate (partials merge across
    * micro-batches exactly as they merge across partitions in batch), so a
    * live p50/p99 per window costs O(k·log n) state per open window, bounded
    * by the watermark. `quantiles(i)` pairs positionally with `qs(i)`.
    */
  def quantilesStream(stream: DataFrame, qs: Seq[Double], k: Int = 1024,
      valueCol: String = "value", watermark: String = "2 hours",
      windowDur: String = "1 hour"): DataFrame =
    quantilesWindowed(stream.withWatermark("ts", watermark), qs, k, valueCol, windowDur)

  /** Per-window count-min registers over a live stream — the token/URL
    * frequency monitor: state per open window is ≤ depth×width additive
    * counters (never the raw values), partial registers merge across
    * micro-batches natively because counts are sums, and closed windows emit
    * mergeable register rows that [[graft.operators.Sketch.cmsLookupWindowed]]
    * (or `cmsMerge` across windows) consumes downstream. Batch twin:
    * [[graft.operators.Sketch.cmsRegistersWindowed]] (parity-spec'd).
    */
  def cmsStream(stream: DataFrame, valueCol: String,
      watermark: String = "2 hours", windowDur: String = "1 hour",
      depth: Int = 4, width: Int = 1024, seed: Long = 42L): DataFrame =
    graft.operators.Sketch.cmsRegistersWindowed(
      stream.withWatermark("ts", watermark), valueCol, windowDur, depth, width, seed)

  /** Per-window HLL registers over a live stream — the distinct-count
    * monitor (unique users/URLs per window): ≤ 2^p max-mergeable register
    * rows of state per open window, merged across micro-batches natively
    * because register maxima are maxima. Estimate downstream with
    * [[graft.operators.Sketch.hllDistinctByGroup]] over the emitted
    * registers (or batch-twin [[graft.operators.Sketch.hllDistinctWindowed]],
    * parity-spec'd).
    */
  def hllStream(stream: DataFrame, valueCol: String,
      watermark: String = "2 hours", windowDur: String = "1 hour",
      p: Int = 12, seed: Long = 42L): DataFrame =
    graft.operators.Sketch.hllRegistersWindowed(
      stream.withWatermark("ts", watermark), valueCol, windowDur, p, seed)

  /** Batch twin of [[quantilesStream]] (shared plan shape, parity-spec'd). */
  def quantilesWindowed(df: DataFrame, qs: Seq[Double], k: Int = 1024,
      valueCol: String = "value", windowDur: String = "1 hour"): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(window(col("ts"), windowDur))
      .agg(graft.operators.Kll.quantilesAgg(col(valueCol).cast("double"), k, qs)
        .as("quantiles"))

  /** Stream-static as-of lookup: each stream row picks the latest static
    * row with the same `on` keys whose `rightTime` is at-or-before the
    * stream row's `leftTime` — the streaming face of
    * [[graft.operators.Ops.asofJoin]] (backward, exact matches allowed),
    * for slowly-changing dimension history (price books, config versions,
    * model rollouts) against a live event stream.
    *
    * Shape: the static side aggregates once into a per-key TIME-SORTED
    * array of payload structs (`__rt` leads the struct, so `sort_array`
    * orders by time, then by the remaining fields as deterministic
    * tie-breaks, later-wins via the array pick). The stream broadcast-joins
    * that key table and selects `filter(history, e -> e.__rt <= ts)[-1]` —
    * pure codegen'd array built-ins, no state store, no watermark coupling:
    * the pick is a stateless projection, so it composes with any downstream
    * windowed/sessionized stage. The per-key history array must fit in a
    * row (dimension-history scale, not fact scale); for fact-to-fact as-of
    * use the batch union-sort operator.
    */
  def asofLookup(
      stream: DataFrame,
      static: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      suffix: String = "_right"): DataFrame = {
    require(on.nonEmpty, "asofLookup needs at least one equi-key column")
    require(rightCols.nonEmpty, "rightCols must name at least one payload column")
    val payStruct = struct(
      col(rightTime).as("__rt") +: rightCols.map(c => col(c).as(c)): _*)
    val hist = static
      .groupBy(on.map(col): _*)
      .agg(sort_array(collect_list(payStruct)).as("__hist"))
    val streamNames = stream.columns.toSet
    val eligible = filter(col("__hist"),
      e => e.getField("__rt") <= col(leftTime))
    // guard the pick: ANSI mode makes element_at(-1) on an empty array an
    // error, and an unmatched key leaves __hist (hence `eligible`) null
    val pick = when(size(eligible) > 0, element_at(eligible, -1))
    stream
      .join(broadcast(hist), on, "left")
      .withColumn("__pick", pick)
      .select(stream.columns.toSeq.map(col) ++ rightCols.map { c =>
        val name = if (streamNames(c)) c + suffix else c
        col("__pick").getField(c).as(name)
      }: _*)
  }

  /** Stream-stream interval overlap join: pairs rows of two streams sharing
    * `on` keys whose closed intervals [ts, ts + durSec] overlap — the
    * streaming face of [[graft.operators.Joins.intervalJoin]]. Spark's
    * native stream-stream join supplies the state machinery; what it CANNOT
    * infer is a bound on interval length, so `maxSpanSec` caps both
    * duration columns (rows above the cap are dropped — at 100 TB feed
    * those through the batch ladder instead) and turns the overlap into an
    * event-time RANGE condition (|l.ts − r.ts| ≤ maxSpan) the engine uses
    * to expire join state at `watermark + maxSpan`; the exact closed-
    * interval predicate rides along as a residual filter in the same join
    * condition. Applied to two batch frames the identical plan degrades to
    * a plain join (watermarks are no-ops) — the parity-spec path.
    *
    * Both inputs need a `ts` TimestampType event-time column; durations are
    * numeric seconds. Output carries left columns as-is and right columns
    * with `suffix` on collisions, one row per qualifying pair per arrival
    * (Spark emits a pair when both sides are present; late rows beyond the
    * watermark drop, the standard streaming-join contract).
    */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftDurCol: String,
      rightDurCol: String,
      maxSpanSec: Long,
      watermark: String = "1 hour",
      suffix: String = "_right"): DataFrame = {
    require(maxSpanSec >= 0, "maxSpanSec must be >= 0")
    val l = left.where(col(leftDurCol) >= 0 && col(leftDurCol) <= maxSpanSec)
      .withWatermark("ts", watermark).alias("__ij_l")
    val r = right.where(col(rightDurCol) >= 0 && col(rightDurCol) <= maxSpanSec)
      .withWatermark("ts", watermark).alias("__ij_r")
    val keyCond = on.map(c => col(s"__ij_l.$c") === col(s"__ij_r.$c"))
    // the state-bounding range condition, in the timestamp ± interval form
    // the streaming analyzer recognizes
    val range =
      col("__ij_r.ts") >= col("__ij_l.ts") - expr(s"INTERVAL '$maxSpanSec' SECOND") &&
        col("__ij_r.ts") <= col("__ij_l.ts") + expr(s"INTERVAL '$maxSpanSec' SECOND")
    // exact closed-interval overlap on epoch micros (codegen'd residual)
    val overlap =
      unix_micros(col("__ij_l.ts")) <=
        unix_micros(col("__ij_r.ts")) + (col(s"__ij_r.$rightDurCol").cast("long") * 1000000L) &&
      unix_micros(col("__ij_r.ts")) <=
        unix_micros(col("__ij_l.ts")) + (col(s"__ij_l.$leftDurCol").cast("long") * 1000000L)
    val joined = l.join(r, (keyCond :+ range :+ overlap).reduce(_ && _))
    val leftNames = left.columns.toSet
    joined.select(
      left.columns.toSeq.map(c => col(s"__ij_l.$c").as(c)) ++
        right.columns.toSeq.map { c =>
          col(s"__ij_r.$c").as(if (leftNames(c)) c + suffix else c)
        }: _*)
  }

  /** File-based streaming source over a parquet events directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Streaming seen-corpus gate: drops (default) or keeps stream rows whose
    * `keyCol` the Bloom bits of the STATIC `seen[seenKey]` corpus consider
    * maybe-present — incremental decontamination / URL-seen filtering
    * without ever rescanning the corpus from the stream. The bits fold into
    * the plan once at query definition ([[graft.operators.Joins.bloomMember]]),
    * so the gate is a stateless codegen'd filter: no state store, no
    * watermark requirement, composable before any stateful stage.
    *
    * Guarantee direction: nothing already seen ever passes a `drop = true`
    * gate (Bloom has no false negatives); the price is a bounded false-
    * positive fraction of genuinely-new rows dropped — the standard trade
    * of seen-lists at corpus scale. Null keys cannot have been seen and
    * always pass a drop-gate (and never pass a keep-gate).
    */
  def bloomGateStream(stream: DataFrame, seen: DataFrame,
      keyCol: String, seenKey: String, drop: Boolean = true,
      numBits: Int = 1 << 20, numHashes: Int = 5, seed: Long = 42L): DataFrame = {
    val member = graft.operators.Joins.bloomMember(seen, seenKey, col(keyCol),
      stream.schema(keyCol).dataType, numBits, numHashes, seed)
    if (drop) stream.where(col(keyCol).isNull || !member)
    else stream.where(col(keyCol).isNotNull && member)
  }

  /** Streaming duplicate-drop bounded by the watermark (exactly-once event
    * ingestion when upstream retries): state holds only ids younger than the
    * watermark.
    */
  def dedupStream(stream: DataFrame, idCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Streaming NEAR-dedup via document fingerprints: the 64-bit winnowing
    * fingerprint ([[graft.operators.TextAnalysis.fingerprint]]) collides for
    * near-identical texts (same 4 smallest 8-gram hashes), so dropping
    * duplicate fingerprints inside the watermark removes near-copies with
    * the same sketch semantics as the batch operator — watermark-bounded
    * state, batch/stream parity on the kept-fingerprint set.
    */
  def nearDedupStream(stream: DataFrame, textCol: String = "text",
      watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__fp", graft.functions.TextFunctions.doc_fingerprint(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Rows of the MinHash-band streaming dedup: one per (doc, band). */
  final case class BandRow(bucket: Long, doc_id: Long, ts: Timestamp, band: Int,
      sig: Array[Long], text: String)

  /** Per-band verdict: `hit` = an earlier doc in this band bucket had an
    * estimated-similar signature; the payload travels on band 0 only.
    */
  final case class BandHit(doc_id: Long, ts: Timestamp, hit: Boolean, text: String)

  /** Watermark-bounded state of one band bucket: distinct signatures seen
    * (identical signatures collapse — the streaming face of the batch
    * exact-duplicate pre-collapse) and the latest event time.
    */
  final case class BucketSigs(sigs: List[Array[Long]], maxTs: Long)

  /** Streaming MinHash-LSH near-dedup: the state-store variant of the batch
    * [[graft.operators.Dedup.minhashLsh]]. Each doc fans out to `numBands`
    * band-bucket rows; a per-bucket flatMapGroupsWithState keeps the distinct
    * signatures seen inside the watermark and flags docs whose estimated
    * Jaccard against any EARLIER registered signature reaches `threshold`;
    * a per-doc event-time aggregation then keeps docs no band flagged.
    *
    * Parity with the batch operator: when docs arrive in id order, "earlier
    * arrival" = "smaller id", so the kept set equals `minhashLsh`'s (the
    * MemoryStream spec proves it across micro-batches). State per bucket is
    * bounded: identical signatures collapse to one entry (mass-duplicated
    * boilerplate costs one signature, not one per copy), `maxSigs` caps
    * distinct ones, and event-time timeout drops buckets silent past the
    * watermark.
    *
    * Requires `spark.sql.streaming.statefulOperator.checkCorrectness.enabled
    * = false`: the planner conservatively flags any stateful operator chained
    * after flatMapGroupsWithState because the latter COULD emit rows older
    * than the watermark — this one never does (verdicts carry their input
    * row's event time, emitted in the same micro-batch), so the flagged
    * hazard cannot occur.
    */
  def minhashDedupStream(
      stream: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 128,
      numBands: Int = 16,
      shingle: Int = 5,
      threshold: Double = 0.8,
      watermark: String = "1 hour",
      maxSigs: Int = 128): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._

    def update(bucket: Long, rows: Iterator[BandRow],
        state: GroupState[BucketSigs]): Iterator[BandHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val st = state.getOption.getOrElse(BucketSigs(Nil, 0L))
      var sigs = st.sigs
      var maxTs = st.maxTs
      var warned = false // once per bucket per micro-batch, not per row —
      // the flood that trips the cap would otherwise BE the log flood
      val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).map { r =>
        // NULL-text docs have a null signature: kept, never candidates, and
        // never registered — the batch family's deliberate NULL contract
        val hit = r.sig != null && sigs.exists(s => estSim(s, r.sig) >= threshold)
        if (r.sig != null && !sigs.exists(_.sameElements(r.sig))) {
          if (sigs.length < maxSigs) sigs ::= r.sig
          else if (!warned) { warnSigCap("minhashDedupStream", bucket, maxSigs); warned = true }
        }
        maxTs = math.max(maxTs, r.ts.getTime)
        BandHit(r.doc_id, r.ts, hit, if (r.band == 0) r.text else null)
      }
      state.update(BucketSigs(sigs, maxTs))
      state.setTimeoutTimestamp(maxTs, watermark)
      out.iterator
    }

    bandedRows(stream, textCol, idCol, numHashes, numBands, shingle, watermark)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
      .withWatermark("ts", watermark)
      .groupBy(col("doc_id"), col("ts"))
      .agg(max(col("hit")).as("__dropped"), max(col("text")).as(textCol))
      .where(!col("__dropped"))
      .select(col("doc_id").as(idCol), col("ts"), col(textCol))
  }

  /** Duration string ("2 hours") → milliseconds, via Spark's own interval
    * parser (calendar months count as 30 days, like watermark handling).
    */
  private def intervalMs(duration: String): Long = {
    val i = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(duration))
    i.months * 30L * 86400000L + i.days * 86400000L + i.microseconds / 1000L
  }

  /** Estimated Jaccard of two MinHash signatures (fraction of equal
    * components) — shared by the streaming dedup variants.
    */
  private def estSim(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** The per-bucket signature logic of the MinHash streaming dedup as a
    * Spark 4 `StatefulProcessor` (state-store v2): ListState of distinct
    * signatures, an event-time timer expiring the bucket once the watermark
    * passes its newest row + `expireDelayMs`.
    */
  final class BandBucketProcessor(threshold: Double, maxSigs: Int, expireDelayMs: Long)
      extends StatefulProcessor[Long, BandRow, BandHit] {
    import implicits._
    @transient private var sigs: ListState[Array[Long]] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sigs = getHandle.getListState[Array[Long]]("sigs", newLongArrayEncoder, TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer", newLongEncoder, TTLConfig.NONE)
    }

    override def handleInputRows(bucket: Long, rows: Iterator[BandRow],
        tv: TimerValues): Iterator[BandHit] = {
      var list = if (sigs.exists()) sigs.get().toList else Nil
      var changed = false
      var maxTs = 0L
      var warned = false // once per bucket per micro-batch (see update above)
      val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).map { r =>
        // null signature (NULL text): kept, never a candidate, never stored
        val hit = r.sig != null && list.exists(s => estSim(s, r.sig) >= threshold)
        if (r.sig != null && !list.exists(_.sameElements(r.sig))) {
          if (list.length < maxSigs) {
            list ::= r.sig
            changed = true
          } else if (!warned) { warnSigCap("minhashDedupStreamTws", bucket, maxSigs); warned = true }
        }
        maxTs = math.max(maxTs, r.ts.getTime)
        BandHit(r.doc_id, r.ts, hit, if (r.band == 0) r.text else null)
      }
      if (changed) sigs.put(list.reverse.toArray)
      // one outstanding event-time timer per bucket, pushed forward as newer
      // rows arrive
      val newTimer = maxTs + expireDelayMs
      if (timer.exists() && timer.get() < newTimer) getHandle.deleteTimer(timer.get())
      if (!timer.exists() || timer.get() < newTimer) {
        getHandle.registerTimer(newTimer)
        timer.update(newTimer)
      }
      out.iterator
    }

    override def handleExpiredTimer(bucket: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[BandHit] = {
      sigs.clear()
      timer.clear()
      Iterator.empty
    }
  }

  /** `transformWithState` face of [[minhashDedupStream]]: identical
    * semantics, but the operator declares `ts` as its output event-time
    * column, so the per-doc aggregation chains WITHOUT the
    * checkCorrectness opt-out the flatMapGroupsWithState variant needs.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — transformWithState's backing
    * store; rocksdbjni ships with Spark.
    */
  def minhashDedupStreamTws(
      stream: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 128,
      numBands: Int = 16,
      shingle: Int = 5,
      threshold: Double = 0.8,
      watermark: String = "1 hour",
      maxSigs: Int = 128,
      expireDelayMs: Long = -1L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    // default the bucket expiry to the WATERMARK duration: a fixed delay
    // shorter than the watermark would clear state while near-duplicates are
    // still admissible (silent misses); the fMGWS variant ties expiry to the
    // watermark string for exactly this reason
    val delayMs = if (expireDelayMs >= 0) expireDelayMs else intervalMs(watermark)
    val verdicts = bandedRows(stream, textCol, idCol, numHashes, numBands, shingle, watermark)
      .groupByKey(_.bucket)
      .transformWithState(new BandBucketProcessor(threshold, maxSigs, delayMs),
        "ts", OutputMode.Append())
    verdicts
      .groupBy(col("doc_id"), col("ts"))
      .agg(max(col("hit")).as("__dropped"), max(col("text")).as(textCol))
      .where(!col("__dropped"))
      .select(col("doc_id").as(idCol), col("ts"), col(textCol))
  }

  /** Shared banding stage: (doc, ts, text) → one watermarked [[BandRow]] per
    * LSH band.
    */
  private def bandedRows(stream: DataFrame, textCol: String, idCol: String,
      numHashes: Int, numBands: Int, shingle: Int, watermark: String): Dataset[BandRow] = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val spark = stream.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / numBands
    stream
      .withColumn("__sig", graft.functions.TextFunctions.minhash_sig(col(textCol), numHashes, shingle))
      .withColumn("__band", explode(sequence(lit(0), lit(numBands - 1))))
      .select(
        // the ONE banding formula, shared with the batch family
        graft.operators.Dedup.bandBucket(col("__band"), col("__sig"), rowsPerBand).as("bucket"),
        col(idCol).as("doc_id"), col("ts"), col("__band").as("band"),
        col("__sig").as("sig"), col(textCol).as("text"))
      .withWatermark("ts", watermark)
      .as[BandRow]
  }

  // ---- sessionization -----------------------------------------------------

  /** Batch sessionization with window functions: a session breaks when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    * Gaps compare in exact integer MICROseconds (unix_micros) — whole-second
    * truncation would merge sessions whose true gap exceeds the bound by a
    * sub-second fraction, silently diverging from [[sessionizeStream]] on
    * the nanosecond-stamped event tables.
    */
  def sessionizeBatch(df: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapUs = gapMinutes * 60L * 1000000L
    df.withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__newsess",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > gapUs, 1).otherwise(0))
      .withColumn("__sess", sum("__newsess").over(byUser))
      .groupBy("user_id", "__sess")
      .agg(count(lit(1)).cast("int").as("n_events"),
        min("ts").as("start"), max("ts").as("end"),
        sum("value").as("value_sum"))
      .drop("__sess")
  }

  /** Streaming sessionization via flatMapGroupsWithState (event-time timeout):
    * per-user state holds the open session; a session closes (and emits) when
    * the next event arrives after the gap, or when the watermark passes the
    * session end + gap.
    */
  /** Streaming drift-monitor front half: per-(event-time window, bin)
    * value counts with the same clamped fixed-width binning as
    * [[graft.operators.Profiling.psi]] — a watermark-bounded stateful
    * windowed aggregation whose partials merge across micro-batches
    * natively. The PSI finalize against a reference runs batch-side over
    * the closed windows ([[graft.operators.Profiling.psiFromCounts]] keyed
    * on the window) — the `cmsStream` batch-gated pattern: chaining a
    * second stateful aggregation onto a streaming one is not expressible
    * in Append mode, and the finalize is model-sized anyway.
    */
  def psiStream(stream: DataFrame, valueCol: String, bins: Int,
      lo: Double, hi: Double, windowDur: String = "1 hour",
      watermark: String = "2 hours", timeCol: String = "ts"): DataFrame = {
    require(bins >= 2 && hi > lo, "need >= 2 bins and hi > lo")
    val width = (hi - lo) / bins
    stream.withWatermark(timeCol, watermark)
      .where(col(valueCol).isNotNull)
      .withColumn("bin",
        least(greatest(floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
          lit(bins - 1L)).cast("int"))
      .groupBy(window(col(timeCol), windowDur), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** One changelog record: an upsert or delete for `key`, ordered by
    * (ts, tie) — the streaming face of [[graft.operators.Ops.applyChangelog]].
    */
  final case class Change(key: Long, ts: Timestamp, tie: Long, op: String,
      value: Double, tag: String)

  /** The maintained snapshot row for one key: latest change applied;
    * `deleted` rows are tombstones (kept so a late out-of-order upsert with
    * an OLDER ordinal cannot resurrect a newer delete).
    */
  final case class SnapshotRow(key: Long, ts: Timestamp, tie: Long,
      deleted: Boolean, value: Double, tag: String)

  /** Streaming latest-wins upsert: maintains the per-key current-state
    * snapshot of a CDC changelog with `mapGroupsWithState` — each
    * micro-batch advances every touched key to its (ts, tie)-maximal change
    * and emits the new state (Update mode downstream; a memory/foreachBatch
    * sink holds the materialized table). Late or replayed changes are
    * harmless: anything older than the stored frontier is ignored, so the
    * stream is idempotent under at-least-once delivery, exactly like the
    * batch operator's replay-idempotence.
    *
    * Scale shape: state is ONE narrow row per live key — the inherent cost
    * of materializing a snapshot, the same O(keys) any keyed state store
    * pays — with no growth in the number of changes; tombstones hold the
    * delete frontier. No watermark requirement: ordering is by the payload
    * ordinal, not arrival time.
    */
  def upsertStream(changes: Dataset[Change]): Dataset[SnapshotRow] = {
    import changes.sparkSession.implicits._
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def ord(ts: Timestamp, tie: Long): (Long, Long) = (micros(ts), tie)

    def update(key: Long, rows: Iterator[Change],
        state: GroupState[SnapshotRow]): SnapshotRow = {
      val best0 = state.getOption
      val newest = rows.maxBy(c => ord(c.ts, c.tie))(
        Ordering.Tuple2(Ordering.Long, Ordering.Long))
      val next = best0 match {
        case Some(s) if Ordering.Tuple2(Ordering.Long, Ordering.Long)
            .gteq(ord(s.ts, s.tie), ord(newest.ts, newest.tie)) => s
        case _ => SnapshotRow(key, newest.ts, newest.tie,
          newest.op == "delete", newest.value, newest.tag)
      }
      state.update(next)
      next
    }

    changes.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // exact microseconds (getTime truncates sub-ms; the batch face compares
    // unix_micros — both faces must agree at sub-second gap boundaries)
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[Session]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(s)
      }
      var closed = List.empty[Session]
      var open = state.getOption
      rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
        open match {
          case Some(s) if micros(e.ts) - micros(s.end) <= gapUs =>
            open = Some(s.copy(
              n_events = s.n_events + 1,
              // a late-but-admissible event can precede the open session —
              // both bounds must absorb it or start drifts from the batch face
              start = if (e.ts.before(s.start)) e.ts else s.start,
              end = if (e.ts.after(s.end)) e.ts else s.end,
              value_sum = s.value_sum + e.value))
          case Some(s) =>
            closed ::= s
            open = Some(Session(userId, 1, e.ts, e.ts, e.value))
          case None =>
            open = Some(Session(userId, 1, e.ts, e.ts, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end.getTime + gapUs / 1000L)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
