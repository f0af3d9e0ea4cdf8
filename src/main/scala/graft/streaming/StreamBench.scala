package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-scale measurement of the STREAMING path under a real
  * `readStream` file source — the evidence the batch==stream parity specs
  * can't give: throughput and state behavior when micro-batches arrive as
  * files over time.
  *
  * Staging replays the events table the way production replays a day of
  * logs: rows are split into time-range buckets, each bucket lands as
  * parquet files whose modification times increase in event-time order
  * (the file source's arrival order), so watermarks advance monotonically
  * and state is evicted as it would be live — a shuffled replay would
  * instead drop most events as late, measuring the wrong thing. One mid
  * bucket additionally arrives TWICE (in a second watch dir, one bucket
  * later — inside the dedup horizon) so the exactly-once path has real
  * duplicates to drop.
  *
  * Each stream is timed from start to full consumption, then a sentinel
  * event far past the data's horizon pushes the watermark so Append-mode
  * windows and open sessions flush, and the flushed output is checked
  * against the same transform run in batch (exact on counts, fp-tolerant
  * on incrementally-accumulated double sums). Results print as one JSON
  * line and land in `bench/` via the wrapper scripts.
  */
object StreamBench {

  final case class Staged(
      cleanDir: String, dupDir: String, nRows: Long, nDupRows: Long,
      delay: String, maxUs: Long)

  final case class StreamResult(name: String, sec: Double, rows: Long, ok: Boolean)

  private val SentinelType = "sentinel"

  /** Split events into nBuckets event-time-range chunks, laid down in
    * arrival order (strictly increasing mtimes). The watermark delay is
    * sized to twice the bucket width so a bucket is never late relative
    * to the one before it, and the duplicated bucket (arriving one bucket
    * later) still falls inside the dedup state horizon.
    */
  def stage(spark: SparkSession, sfDir: String, nBuckets: Int, work: Path): Staged = {
    val ev = graft.queries.Tables.t(spark, sfDir, "events")
    val bounds = ev.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
      count(lit(1))).head
    val (minUs, maxUs, nRows) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val width = math.max((maxUs - minUs) / nBuckets + 1, 1L)
    val delayUs = 2 * width
    val staged = work.resolve("staged")
    ev.withColumn("tb",
        ((unix_micros(col("ts")) - minUs) / width).cast("int"))
      .repartition(col("tb")) // one task per bucket: few files each
      .write.partitionBy("tb").parquet(staged.toString)

    val clean = Files.createDirectories(work.resolve("watch_clean"))
    val dup = Files.createDirectories(work.resolve("watch_dup"))
    val dupBucket = nBuckets / 2
    var nDupRows = 0L
    // mtimes: bucket b arrives at base + 2b seconds; the duplicate copy of
    // dupBucket arrives between buckets b+1 and b+2 (odd offset)
    val base = System.currentTimeMillis() - 1000L * 60 * 60
    def place(src: Path, dst: Path, atMs: Long): Unit = {
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(atMs))
    }
    (0 until nBuckets).foreach { b =>
      val bucketDir = staged.resolve(s"tb=$b")
      if (Files.isDirectory(bucketDir)) {
        val files = Files.list(bucketDir)
        try {
          val parts = files.filter(_.toString.endsWith(".parquet")).toArray.map(_.asInstanceOf[Path])
          parts.zipWithIndex.foreach { case (p, i) =>
            place(p, clean.resolve(s"b$b-$i.parquet"), base + 2000L * b)
            place(p, dup.resolve(s"b$b-$i.parquet"), base + 2000L * b)
            if (b == dupBucket)
              place(p, dup.resolve(s"b$b-$i-again.parquet"), base + 2000L * (b + 1) + 1000L)
          }
        } finally files.close()
      }
    }
    if (Files.isDirectory(staged.resolve(s"tb=$dupBucket")))
      nDupRows = spark.read.parquet(staged.resolve(s"tb=$dupBucket").toString).count()
    Staged(clean.toString, dup.toString, nRows, nDupRows,
      s"${delayUs / 1000000 + 1} seconds", maxUs)
  }

  /** One event far past the horizon: pushes the watermark so Append-mode
    * windows finalize and open sessions time out. Excluded from all
    * comparisons by its event_type / user_id.
    */
  private def writeSentinel(spark: SparkSession, dir: String, maxUs: Long): Unit = {
    import spark.implicits._
    val farUs = maxUs + 365L * 24 * 3600 * 1000000
    Seq((-1L, new java.sql.Timestamp(farUs / 1000), -1L, SentinelType, 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Run the stateful streams over the staged dirs; returns one result
    * per stream with the batch-equality verdict. `only` selects a subset
    * by name prefix (e.g. Seq("ws2") for a state-store A/B at sf100
    * without paying for the whole suite); empty = all.
    */
  def run(spark: SparkSession, sfDir: String, nBuckets: Int,
      maxFilesPerTrigger: Int = 8, only: Seq[String] = Nil): Seq[StreamResult] = {
    val work = Files.createTempDirectory("graft_stream_bench")
    val st = stage(spark, sfDir, nBuckets, work)
    val events = graft.queries.Tables.t(spark, sfDir, "events")
    // ws1 writes the watermark-flushing sentinel AFTER its own timing;
    // when ws1 is deselected the streams that need a flushed tail (ws2's
    // open sessions) still get one, written before their stream starts
    var sentinelWritten = false
    def ensureSentinel(): Unit = if (!sentinelWritten) {
      writeSentinel(spark, st.cleanDir, st.maxUs); sentinelWritten = true
    }
    def dirs(tag: String): (String, String) =
      (Files.createDirectories(work.resolve(s"out_$tag")).toString,
        Files.createDirectories(work.resolve(s"ck_$tag")).toString)

    // ws1: watermarked tumbling-window aggregate, Append-mode parquet sink
    def ws1 = {
      val (out, ck) = dirs("ws1")
      val agg = EventStreaming.windowedTypeCounts(
        EventStreaming.fileStream(spark, st.cleanDir, maxFilesPerTrigger),
        "1 hour", st.delay)
      val q = EventStreaming.startParquetSink(agg, out, ck)
      val (_, sec) = timed(q.processAllAvailable())
      ensureSentinel()
      q.processAllAvailable(); q.stop()
      val got = spark.read.parquet(out).filter(col("event_type") =!= SentinelType)
      val want = EventStreaming.windowedTypeCounts(events, "1 hour", st.delay)
      // counts exact; double sums accumulate in micro-batch order, so
      // compare with relative tolerance instead of bitwise
      val joined = want.as("w").join(got.as("g"),
        Seq("window_start", "event_type"), "full_outer")
      val bad = joined.filter(
        col("w.n").isNull || col("g.n").isNull || col("w.n") =!= col("g.n") ||
          abs(col("w.sum_value") - col("g.sum_value")) >
            lit(1e-6) * (abs(col("w.sum_value")) + lit(1.0))).count()
      StreamResult("ws1_windowed_agg", sec, st.nRows, bad == 0)
    }

    // ws2: flatMapGroupsWithState sessionization
    def ws2 = {
      ensureSentinel() // pre-start: consumed within the timed drain
      val (out, ck) = dirs("ws2")
      val sess = EventStreaming.sessionize(
        EventStreaming.fileStream(spark, st.cleanDir, maxFilesPerTrigger),
        "30 minutes", st.delay).toDF()
      val q = EventStreaming.startParquetSink(sess, out, ck)
      val (_, sec) = timed(q.processAllAvailable())
      q.stop()
      val got = spark.read.parquet(out).filter(col("user_id") =!= -1L)
        .agg(count(lit(1)), sum(col("n_events")), sum(col("sum_value")))
        .head()
      val want = EventStreaming.sessionizeBatch(events, "30 minutes")
        .agg(count(lit(1)), sum(col("n_events")), sum(col("sum_value")))
        .head()
      val ok = got.getLong(0) == want.getLong(0) &&
        got.getLong(1) == want.getLong(1) &&
        math.abs(got.getDouble(2) - want.getDouble(2)) <=
          1e-6 * (math.abs(want.getDouble(2)) + 1.0)
      StreamResult("ws2_sessionize", sec, st.nRows, ok)
    }

    // ws3: exactly-once dedup over the dir where one bucket arrives twice
    def ws3 = {
      val (out, ck) = dirs("ws3")
      val dd = EventStreaming.dedupedEvents(
        EventStreaming.fileStream(spark, st.dupDir, maxFilesPerTrigger),
        st.delay).select(col("event_id"))
      val q = EventStreaming.startParquetSink(dd, out, ck)
      val (_, sec) = timed(q.processAllAvailable())
      q.stop()
      val emitted = spark.read.parquet(out).count()
      // every duplicate dropped, nothing else lost
      StreamResult("ws3_dedup", sec, st.nRows + st.nDupRows, emitted == st.nRows)
    }

    // ws4: stream-stream interval self-join — purchases attributed to the
    // same user's clicks in the preceding hour. Inner-join rows emit
    // eagerly (the watermark only bounds buffered state), and time-ordered
    // arrival means a purchase finds its clicks already buffered; the raw
    // columns pass through unaggregated, so the batch compare is bitwise.
    def ws4 = {
      val (out, ck) = dirs("ws4")
      val attr = EventStreaming.clickAttribution(
        EventStreaming.fileStream(spark, st.cleanDir, maxFilesPerTrigger),
        "1 hour", st.delay)
      val q = EventStreaming.startParquetSink(attr, out, ck)
      val (_, sec) = timed(q.processAllAvailable())
      q.stop()
      val got = spark.read.parquet(out)
      val want = EventStreaming.clickAttribution(events, "1 hour", st.delay)
      val ok = got.except(want).isEmpty && want.except(got).isEmpty
      StreamResult("ws4_interval_join", sec, st.nRows, ok)
    }

    // ws5: SCD2 maintenance via foreachBatch — the signup change feed
    // keeps the versioned tier dimension continuously current. Wall time
    // includes the per-batch history rewrite (the honest cost of a
    // transactionless parquet dimension — a table format with file-level
    // merge would rewrite only matched files; the JOIN work per batch is
    // already bounded by the batch's key set). Verdict: the maintained
    // history must equal the from-scratch batch build over the full feed,
    // bitwise.
    def ws5 = {
      val hist = work.resolve("hist_ws5").toString
      val ckd = Files.createDirectories(work.resolve("ck_ws5")).toString
      def tier = when(col("value") < 5, "bronze")
        .when(col("value") < 15, "silver").otherwise(lit("gold")).as("tier")
      def feed(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id"), tier)
      val q = Scd2Stream.start(
        feed(EventStreaming.fileStream(spark, st.cleanDir, maxFilesPerTrigger)),
        hist, ckd, "user_id", "ts", "event_id", "tier")
      val (_, sec) = timed(q.processAllAvailable())
      q.stop()
      val got = spark.read.parquet(hist)
      val want = graft.exec.Scd2.history(
        feed(events), "user_id", "ts", "event_id", "tier")
      val nChanges = feed(events).count()
      val ok = got.except(want).isEmpty && want.except(got).isEmpty
      StreamResult("ws5_scd2_maintain", sec, nChanges, ok)
    }

    val all = Seq[(String, () => StreamResult)](
      ("ws1", () => ws1), ("ws2", () => ws2), ("ws3", () => ws3),
      ("ws4", () => ws4), ("ws5", () => ws5))
    val picked =
      if (only.isEmpty) all
      else all.filter { case (n, _) => only.exists(n.startsWith) }
    require(picked.nonEmpty, s"no stream matches $only")
    picked.map(_._2())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBuckets = sys.env.get("SPARK_GRAFT_STREAM_BUCKETS").map(_.toInt).getOrElse(64)
    val only = sys.env.get("SPARK_GRAFT_STREAMS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    // State-store A/B (SCALE.md): rocksdb = native off-JVM-heap store with
    // changelog checkpointing — the 100 TB deployment choice when per-key
    // state (ws2's open sessions) outgrows executor heap. Session conf
    // must be set before the first query starts.
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")
    val spark = graft.GraftSession.local("graft-stream-bench")
    if (stateStore == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rs = run(spark, sfDir, nBuckets, only = only)
    // Locale.ROOT: comma-decimal default locales would break the JSON
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val js = rs.map(r =>
      s""""${r.name}":{"sec":${f3(r.sec)},"rows":${r.rows},""" +
        s""""rows_per_sec":${(r.rows / math.max(r.sec, 1e-9)).toLong},"ok":${r.ok}}""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_suite","value":${f3(rs.map(_.sec).sum)},"unit":"sec","streams":$js,"state_store":"$stateStore","sf":"${new java.io.File(sfDir).getName}"}""")
    require(rs.forall(_.ok), s"stream/batch mismatch: ${rs.filterNot(_.ok).map(_.name)}")
    spark.stop()
  }
}
