package graft.queries

/** Scratch probe: print a query's AQE-final physical plan after a real
  * run at the given sfDir (PlanDump fingerprints the pre-AQE plan at
  * sf0.001 — this shows what ACTUALLY executed at scale).
  *   sbt "Test/runMain graft.queries.PlanProbe <sfDir> [query]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("t7probe")
    val name = if (args.length > 1) args(1) else "t7_freq_rank_quality"
    val df = Registry.byName(name).fn(spark, args(0))
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
