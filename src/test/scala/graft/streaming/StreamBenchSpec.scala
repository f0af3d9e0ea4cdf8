package graft.streaming

import graft.SparkTestBase

/** End-to-end run of the streaming decade harness at the smallest scale
  * factor: stages time-ordered arrival chunks (with the duplicated
  * bucket), drives all three stateful streams through the real file
  * source, and asserts every stream's output matched its batch
  * equivalent — the same verdicts the sf1/sf10 measurement runs gate on.
  */
class StreamBenchSpec extends SparkTestBase {

  test("staged file-arrival replay matches batch for all five streams") {
    val results = StreamBench.run(spark, "/root/testdata/sf0.001", nBuckets = 8,
      maxFilesPerTrigger = 2)
    assert(results.map(_.name) ==
      Seq("ws1_windowed_agg", "ws2_sessionize", "ws3_dedup", "ws4_interval_join",
        "ws5_scd2_maintain"))
    results.foreach { r =>
      assert(r.ok, s"${r.name}: stream output diverged from batch")
      assert(r.sec > 0 && r.rows > 0)
    }
    // the dup dir really carried more input than the clean dir
    assert(results(2).rows > results.head.rows)
  }
}
