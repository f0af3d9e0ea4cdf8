package graft.queries

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for registry queries to files — the r15
  * optimization-round evidence artifacts (`plans/r15/<query>_<tag>.txt`).
  *   sbt "Test/runMain graft.queries.PlanExplain <sfDir> <outDir> <tag> [query...]"
  * Queries are matched exactly; no args = all. The dump is the pre-execution
  * plan (AQE initial) — the same thing `df.explain("formatted")` prints.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanExplain <sfDir> <outDir> <tag> [query...]")
    val Array(sfDir, outDir, tag) = args.take(3)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else Registry.all.map(_.name).sorted
    val spark = graft.GraftSession.local("plan-explain")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      DedupOps.evictSigEntries(spark)
      val df = Registry.byName(name).fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
