package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Queries run in sorted name order (deterministic
  * attribution round to round) after an untimed warmup that absorbs JVM /
  * codegen / parquet-footer spin-up — otherwise whichever query happens to
  * run first is charged ~4s of session warmup. Each query is timed twice
  * and the best run reported: the first run of the round-robin pays
  * first-touch page-cache and codegen-compile costs that say nothing
  * about the plan, and steady-state is what a cluster run amortizes to.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> math.min(timeOnce(name, fn), timeOnce(name, fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
