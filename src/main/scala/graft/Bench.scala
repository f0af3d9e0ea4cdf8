package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Queries run in sorted name order (deterministic
  * attribution round to round) after a FULL untimed warm-up pass of every
  * query — that pass absorbs JVM/codegen/parquet-footer spin-up, JITs the
  * native kernels, faults the page cache, and populates the shared
  * signature frames, so every timed run measures a steady-state plan
  * execution rather than whichever one-time cost lands on it (without the
  * pass, round-over-round comparison carried ±20% GC/compile noise).
  * Each query is then timed three times and the MEDIAN reported:
  * steady-state with single-outlier rejection is what a cluster run
  * amortizes to, and it keeps round-over-round deltas attributable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional args: query-name prefixes to time (default: all) — lets a
    // perf investigation re-measure one suspect query without paying for
    // the whole suite
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true else n => args.exists(n.startsWith)
    val spark = GraftSession.local("graft-bench")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    // a failed query reports the -1.0 sentinel (and logs to stderr), never
    // a near-zero wall time — min() keeps the sentinel if either run broke
    def timeOnce(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
    }
    // SPARK_GRAFT_BENCH_REPS / _WARMUP override the 3-run-median +
    // warm-up protocol for decade-scale runs (SCALE.md), where a single
    // multi-second reading is already attributable and 4 passes of a
    // 100x dataset would cost hours. Unset (the driver's per-round run)
    // keeps the default protocol.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    val warmup = sys.env.get("SPARK_GRAFT_BENCH_WARMUP").forall(_ != "0")
    val ordered = SparkEntry.queries.toSeq.filter(q => wanted(q._1)).sortBy(_._1)
    if (warmup)
      ordered.foreach { case (name, fn) => timeOnce(name, fn) } // untimed warm-up pass
    // MEDIAN of 3 after the warm-up: most queries are sub-second, where
    // ~50ms of scheduler jitter is 15-25% of a single reading. The median
    // rejects the one outlier a GC pause injects without the min's bias
    // toward lucky runs, so round-over-round deltas are attributable to
    // code, not machine weather. A failed run (-1 sentinel) poisons the
    // whole reading — a query that breaks intermittently must never
    // report a plausible time.
    val results = ordered.map { case (name, fn) =>
      val runs = Seq.fill(reps)(timeOnce(name, fn))
      name -> (if (runs.contains(-1.0)) -1.0 else runs.sorted.apply(reps / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
