package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}
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
