package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** End-to-end file-arrival streaming: parquet files land in a directory,
  * the stream picks them up (bounded per trigger), the windowed aggregate
  * updates incrementally, and the checkpointed parquet sink survives a
  * stop/restart without reprocessing — the incremental form of the batch
  * pipeline over the same transform function.
  */
class FileStreamSpec extends SparkTestBase {

  private def ev(id: Long, hour: Int, typ: String, v: Double) =
    (id, Timestamp.valueOf(f"2024-01-01 $hour%02d:15:00"), 7L, typ, v, "{}")

  test("file-arrival stream aggregates incrementally with checkpointed sink") {
    val s = spark
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    def toDf(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // batch 1 lands before the stream starts
    toDf(Seq(ev(1, 1, "click", 1.0), ev(2, 1, "click", 2.0)))
      .write.mode("append").parquet(srcDir)
    val agg = EventStreaming.windowedTypeCounts(
      EventStreaming.fileStream(s, srcDir), "1 hour", "30 minutes")
    val q1 = EventStreaming.startParquetSink(agg, outDir, ckDir)
    // with Append mode the 01:00 window only FINALIZES once the watermark
    // passes; a later file pushes event time forward and flushes it
    q1.processAllAvailable()
    toDf(Seq(ev(3, 5, "view", 5.0))).write.mode("append").parquet(srcDir)
    q1.processAllAvailable()
    q1.stop()
    val flushed = s.read.parquet(outDir)
      .select($"event_type", $"n", $"sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(flushed == Set(("click", 2L, 3.0)), s"got $flushed")

    // restart from the checkpoint: only the new file is processed, and the
    // already-flushed window is not re-emitted
    toDf(Seq(ev(4, 9, "view", 7.0))).write.mode("append").parquet(srcDir)
    val agg2 = EventStreaming.windowedTypeCounts(
      EventStreaming.fileStream(s, srcDir), "1 hour", "30 minutes")
    val q2 = EventStreaming.startParquetSink(agg2, outDir, ckDir)
    q2.processAllAvailable()
    q2.stop()
    val after = s.read.parquet(outDir)
      .select($"event_type", $"n", $"sum_value")
      .as[(String, Long, Double)].collect().toSeq
    // click window exactly once (no reprocessing), view@05 flushed by ev4
    assert(after.count(_ == (("click", 2L, 3.0))) == 1, s"got $after")
    assert(after.toSet == Set(("click", 2L, 3.0), ("view", 1L, 5.0)), s"got $after")
  }
}
