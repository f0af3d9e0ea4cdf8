package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.exec.Scd2

class Scd2StreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changeDf(rows: Seq[(Long, Timestamp, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts", "event_id", "tier")
  }

  private def assertSetEqual(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"history mismatch:\nstream:\n${a.orderBy("user_id", "version").collect().mkString("\n")}\n" +
        s"batch:\n${b.orderBy("user_id", "version").collect().mkString("\n")}")

  test("streamed merges converge to the batch history after each arrival") {
    val src = Files.createTempDirectory("scd2_src").toString
    val hist = Files.createTempDirectory("scd2").toString + "/history"
    val ck = Files.createTempDirectory("scd2_ck").toString

    val b1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (2L, ts("2024-01-01 01:00:00"), 2L, "gold"))
    val b2 = Seq(
      (1L, ts("2024-01-02 00:00:00"), 3L, "silver"), // real change
      (2L, ts("2024-01-02 01:00:00"), 4L, "gold"))   // no-op restatement
    val b3 = Seq(
      (3L, ts("2024-01-03 00:00:00"), 5L, "bronze"), // new key
      (1L, ts("2024-01-03 01:00:00"), 6L, "gold"))

    changeDf(b1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(changeDf(b1).schema).parquet(src)
    val q = Scd2Stream.start(stream, hist, ck, "user_id", "ts", "event_id", "tier")
    try {
      q.processAllAvailable()
      assertSetEqual(Scd2Stream.readHistory(spark, hist).get,
        Scd2.history(changeDf(b1), "user_id", "ts", "event_id", "tier"))

      changeDf(b2).write.mode("append").parquet(src)
      q.processAllAvailable()
      assertSetEqual(Scd2Stream.readHistory(spark, hist).get,
        Scd2.history(changeDf(b1 ++ b2), "user_id", "ts", "event_id", "tier"))

      changeDf(b3).write.mode("append").parquet(src)
      q.processAllAvailable()
      val streamed = Scd2Stream.readHistory(spark, hist).get
      val batch = Scd2.history(changeDf(b1 ++ b2 ++ b3), "user_id", "ts", "event_id", "tier")
      assertSetEqual(streamed, batch)
      // point-in-time read works on the maintained history
      val asOf = streamed.filter(
        col("valid_from") <= ts("2024-01-02 12:00:00") &&
          (col("valid_to").isNull || col("valid_to") > ts("2024-01-02 12:00:00")))
      assert(asOf.filter(col("user_id") === 1L).select("tier").collect()
        .map(_.getString(0)).toSeq == Seq("silver"))
    } finally q.stop()
  }

  test("readHistory repairs a crash between the two swap moves") {
    // simulate the torn state: history renamed to __old_7, the second
    // move (stage → history) never ran, plus debris from both phases
    val root = Files.createTempDirectory("scd2_crash").toString
    val hist = root + "/history"
    val h0 = Scd2.history(changeDf(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (2L, ts("2024-01-01 01:00:00"), 2L, "gold"))),
      "user_id", "ts", "event_id", "tier")
    h0.write.parquet(hist + "__old_7")
    changeDf(Seq((9L, ts("2024-01-09 00:00:00"), 9L, "gold")))
      .write.parquet(hist + "__stage_8") // swap never started for batch 8
    val recovered = Scd2Stream.readHistory(spark, hist)
    assert(recovered.isDefined, "pre-image must be restored as the history")
    assertSetEqual(recovered.get, h0)
    assert(!Files.exists(java.nio.file.Paths.get(hist + "__old_7")))
    assert(!Files.exists(java.nio.file.Paths.get(hist + "__stage_8")))
    // a completed swap's leftover __old (crash before delete) is debris:
    // the history dir exists, so recovery must KEEP it and drop the old
    val stale = changeDf(Seq((5L, ts("2024-01-05 00:00:00"), 5L, "bronze")))
    stale.write.parquet(hist + "__old_3")
    assertSetEqual(Scd2Stream.readHistory(spark, hist).get, h0)
    assert(!Files.exists(java.nio.file.Paths.get(hist + "__old_3")))
  }

  test("re-applying an already-merged batch is a no-op (crash-replay idempotency)") {
    val all = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "silver"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "gold"))
    val lastBatch = Seq(
      (1L, ts("2024-01-02 00:00:00"), 2L, "silver"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "gold"))
    val once = Scd2.history(changeDf(all), "user_id", "ts", "event_id", "tier")
    val replayed = Scd2.merge(once, changeDf(lastBatch), "user_id", "ts", "event_id", "tier")
    assertSetEqual(replayed, once)
  }
}
