package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream processing: one transformation definition serving both batch
  * and Structured Streaming (reference: erde's chunk-streamed IO model,
  * erde/io read_stream/write_stream — subsumed by Spark partitions for batch
  * and by Structured Streaming for real time).
  */
object EventStream {

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

  /** File-based streaming source over a parquet events directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
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

  // ---- sessionization -----------------------------------------------------

  /** Batch sessionization with window functions: a session breaks when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    */
  def sessionizeBatch(df: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapS = gapMinutes * 60L
    df.withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__newsess",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapS, 1).otherwise(0))
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
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[Session]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(s)
      }
      var closed = List.empty[Session]
      var open = state.getOption
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        open match {
          case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
            open = Some(s.copy(
              n_events = s.n_events + 1,
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
        state.setTimeoutTimestamp(s.end.getTime + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
