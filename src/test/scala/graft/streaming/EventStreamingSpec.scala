package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

final case class StreamEvent(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Streaming ops tested through MemoryStream — same transform functions
  * as the batch path, incremental execution.
  */
class EventStreamingSpec extends SparkTestBase {

  private def ev(id: Long, hour: Int, typ: String, v: Double) =
    StreamEvent(id, Timestamp.valueOf(f"2024-01-01 $hour%02d:30:00"), 1L, typ, v, "{}")

  test("windowedTypeCounts aggregates tumbling windows incrementally") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamEvent]
    val agg = EventStreaming.windowedTypeCounts(mem.toDF(), "1 hour", "30 minutes")

    val q = agg.writeStream.format("memory").queryName("wtc")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(ev(1, 1, "click", 1.0), ev(2, 1, "click", 2.0), ev(3, 2, "view", 5.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT event_type, n, sum_value FROM wtc ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))

      // incremental update: a second batch lands in the same click window
      mem.addData(ev(4, 1, "click", 4.0))
      q.processAllAvailable()
      val clicks = s.sql("SELECT n, sum_value FROM wtc WHERE event_type = 'click'")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(clicks.toSeq == Seq((3L, 7.0)))
    } finally q.stop()
  }

  test("sessionize closes sessions on event-time gaps and on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def at(id: Long, hm: String, user: Long, v: Double) =
      StreamEvent(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", v, "{}")

    val mem = MemoryStream[StreamEvent]
    val sessions = EventStreaming.sessionize(mem.toDF(), "1 hour", "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 30min apart (one session), then a 3.5h gap
      // closes it within the batch and opens a new one at 05:00
      mem.addData(at(1, "01:00", 1, 1.0), at(2, "01:30", 1, 2.0), at(3, "05:00", 1, 4.0))
      q.processAllAvailable()
      val closed1 = s.sql("SELECT user_id, n_events, sum_value FROM sess")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(closed1.toSeq == Seq((1L, 2L, 3.0)))

      // another user far in the future advances the watermark past
      // 05:00 + gap; the next batch's timeout flushes user 1's open session
      mem.addData(at(4, "10:00", 2, 7.0))
      q.processAllAvailable()
      mem.addData(at(5, "10:05", 2, 8.0))
      q.processAllAvailable()
      val all = s.sql(
        "SELECT user_id, hour(session_start), n_events, sum_value FROM sess ORDER BY user_id, 2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(all.toSeq == Seq((1L, 1, 2L, 3.0), (1L, 5, 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionizeBatch agrees with the streaming sessionizer on closed sessions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def at(id: Long, hm: String, user: Long, v: Double) =
      StreamEvent(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", v, "{}")
    val data = Seq(
      at(1, "01:00", 1, 1.0), at(2, "01:30", 1, 2.0), at(3, "05:00", 1, 4.0),
      at(4, "02:00", 2, 7.0), at(5, "02:10", 2, 1.0), at(6, "02:20", 2, 2.0))

    val batch = EventStreaming.sessionizeBatch(data.toDF(), "1 hour")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet

    val mem = MemoryStream[StreamEvent]
    val q = EventStreaming.sessionize(mem.toDF(), "1 hour", "30 minutes")
      .toDF().writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // advance the watermark far enough to flush every open session
      mem.addData(at(7, "23:00", 99, 0.0))
      q.processAllAvailable()
      mem.addData(at(8, "23:05", 99, 0.0))
      q.processAllAvailable()
      val streamed = s.sql(
        "SELECT user_id, session_start, session_end, n_events, sum_value FROM sess_parity WHERE user_id < 99")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"batch/streaming session mismatch:\n batch=$batch\n streamed=$streamed")
    } finally q.stop()
  }

  test("clickAttribution joins purchase to in-window clicks incrementally") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def at(id: Long, hm: String, typ: String, v: Double) =
      StreamEvent(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), 1L, typ, v, "{}")

    val mem = MemoryStream[StreamEvent]
    val q = EventStreaming.clickAttribution(mem.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      // click at 01:00 → purchase at 01:20 (in window); click at 02:30 is
      // 50 min before the 03:20 purchase (out of window)
      mem.addData(at(1, "01:00", "click", 0), at(2, "01:20", "purchase", 9.0))
      q.processAllAvailable()
      // a later batch joins against the buffered click state
      mem.addData(at(3, "01:25", "purchase", 5.0),
        at(4, "02:30", "click", 0), at(5, "03:20", "purchase", 7.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT purchase_id, click_id, amount FROM attr ORDER BY purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((2L, 1L, 9.0), (3L, 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupedEvents drops duplicate event_ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamEvent]
    val deduped = EventStreaming.dedupedEvents(mem.toDF(), "1 hour")

    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, 1, "click", 1.0), ev(1, 1, "click", 1.0), ev(2, 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(ev(1, 1, "click", 1.0), ev(3, 2, "buy", 3.0))
      q.processAllAvailable()
      val ids = s.sql("SELECT event_id FROM dedup ORDER BY event_id")
        .collect().map(_.getLong(0))
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
