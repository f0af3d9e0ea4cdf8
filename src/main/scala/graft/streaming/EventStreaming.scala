package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured-Streaming lift of the batch pipeline (SURVEY.md §2.10 notes
  * the reference is batch-only; this is the engine's incremental path).
  *
  * The transform functions below take a plain DataFrame and are shared
  * verbatim between `spark.read` (batch backfill) and `spark.readStream`
  * (incremental) — the Spark-idiomatic way to keep one logic path. State
  * is bounded by watermarks: late events beyond the watermark are dropped
  * deterministically, and window state is evicted as the watermark passes,
  * so executor memory stays flat at any throughput.
  */
object EventStreaming {

  /** The events schema (matches TESTDATA.md's events table). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window per-type aggregation; with a streaming input this is
    * an incremental stateful aggregation whose state expires `watermark`
    * after each window closes.
    */
  def windowedTypeCounts(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once event feed: drops duplicate event_ids arriving within
    * the watermark horizon (at-least-once source → effectively-once sink).
    */
  def dedupedEvents(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Open-session state: epoch-micros bounds plus running aggregates. */
  final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long, sumValue: Double)

  /** One closed session per user. */
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      sum_value: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState`: per-user
    * sessions close after `gap` of event-time inactivity.
    *
    * Sessions that close *within* a batch (a later event arrives more than
    * `gap` after the previous one) are emitted immediately; the open tail
    * session is held as `GroupState` and flushed by the event-time timeout
    * once the watermark passes `last + gap` — so state size is bounded by
    * the number of concurrently active users inside the watermark horizon,
    * not by history. Each state value is four scalars (~48 bytes): 10M
    * concurrent users ≈ 500 MB across the cluster, partitioned by the
    * group key's shuffle.
    */
  def sessionize(events: DataFrame, gap: String, watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapUs.months == 0 && gapUs.days == 0, "session gap must be sub-day")

    def close(userId: Long, st: SessionState): Session =
      Session(userId,
        new java.sql.Timestamp(st.startUs / 1000),
        new java.sql.Timestamp(st.lastUs / 1000),
        st.nEvents, st.sumValue)

    // the watermarked `ts` attribute must survive up to the stateful
    // operator (projecting it to a long strips the watermark tag), so the
    // micros conversion happens inside the lambda
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed last + gap: flush the open session
            val out = state.getOption.map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            // true epoch micros: getTime is ms-truncated, the sub-ms digits
            // live in getNanos (micros precision is all Spark timestamps
            // carry, so this is lossless)
            val sorted = rows.map { case (_, ts, v) =>
              (ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L, v)
            }.toSeq.sortBy(_._1)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { case (us, v) =>
              open match {
                case Some(st) if us - st.lastUs <= gapUs.microseconds =>
                  open = Some(st.copy(
                    lastUs = math.max(st.lastUs, us),
                    nEvents = st.nEvents + 1, sumValue = st.sumValue + v))
                case Some(st) =>
                  closed += close(userId, st)
                  open = Some(SessionState(us, us, 1L, v))
                case None =>
                  open = Some(SessionState(us, us, 1L, v))
              }
            }
            open.foreach { st =>
              state.update(st)
              // must exceed the current watermark (late-but-kept events can
              // have last + gap already behind it)
              state.setTimeoutTimestamp(math.max(
                (st.lastUs + gapUs.microseconds) / 1000,
                state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Batch (historical-backfill) form of [[sessionize]]: the classic
    * gap-and-island window — a session break is an event-time gap > `gap`
    * within a user's ordered stream, the session id is the running count
    * of breaks. Identical session boundaries to the streaming path
    * (EventStreamingSpec asserts parity), but expressed as two window
    * functions + one aggregation, so the whole thing is
    * whole-stage-codegen'd and shuffles ONCE on user_id (the window and
    * the groupBy share the partitioning — Catalyst reuses the exchange).
    */
  def sessionizeBatch(events: DataFrame, gap: String): DataFrame = {
    val gapIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapIv.months == 0 && gapIv.days == 0, "session gap must be sub-day")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val isBreak =
      when(us - lag(us, 1).over(w) > gapIv.microseconds, 1).otherwise(0)
    events
      .withColumn("__sess", sum(isBreak).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("__sess").as("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
  }

  /** Stream-stream interval self-join: each purchase attributed to the
    * same user's clicks within `window` BEFORE it. Batch and streaming
    * share this function; with streaming inputs both sides are
    * watermarked and the event-time range condition bounds the join
    * state — Spark evicts buffered rows once the watermark passes
    * `ts + window`, so state is proportional to the window, not history.
    */
  def clickAttribution(events: DataFrame, window: String, watermark: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("amount"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"), col("amount"))
  }

  /** File-arrival streaming source over a directory of parquet events —
    * the incremental form of the batch table scan. `maxFilesPerTrigger`
    * bounds per-batch work so backfills don't starve the trigger cadence.
    */
  def fileStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Sink the windowed aggregation to per-window parquet, checkpointed —
    * `foreachBatch` gives the batch writer (and its whole-stage codegen)
    * to the streaming path.
    */
  def startParquetSink(
      agg: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
}
