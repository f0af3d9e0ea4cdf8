package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.plans.PlanFingerprint

/** The canonical fingerprint-generation procedure shared by the checked-in
  * corpus writer (`PlanDump`) and the per-round checker
  * (`PlanRegressionSpec`) — one definition, so the two can never drift.
  *
  * Fingerprints are pinned to sf0.001: statically planned join strategies
  * depend on file-size stats, so a fingerprint is only reproducible at the
  * scale it was generated at. The signature cache is evicted before EVERY
  * query so each fingerprint is the cold-cache plan, independent of which
  * suites (or which other fingerprints) ran earlier in the shared JVM.
  */
object PlanCorpus {
  val sf = "/root/testdata/sf0.001"

  /** Checked-in corpus location — read via source path, not classpath, so a
    * regeneration is visible without a recompile-resources round.
    */
  val dir: Path = Paths.get("src/test/resources/plans")

  def fingerprint(spark: SparkSession, name: String): String = {
    DedupOps.evictSigEntries(spark)
    // plan-text truncation happens BEFORE normalization, so the cutoff
    // position depends on expression-id digit width (a JVM-global counter):
    // widen the limits so no metadata line truncates mid-expression, then
    // restore whatever the session had
    val limits = Seq("spark.sql.maxMetadataStringLength" -> "100000",
      "spark.sql.debug.maxToStringFields" -> "10000")
    val saved = limits.map { case (k, _) => k -> spark.conf.getOption(k) }
    limits.foreach { case (k, v) => spark.conf.set(k, v) }
    try PlanFingerprint.of(Registry.byName(name).fn(spark, sf), sf)
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  def expectedFile(name: String): Path = dir.resolve(s"$name.plan")

  def expected(name: String): Option[String] = {
    val f = expectedFile(name)
    if (Files.exists(f)) Some(new String(Files.readAllBytes(f), "UTF-8"))
    else None
  }

  /** First-divergence context diff — enough to see WHAT changed without
    * dumping two full plan trees into the failure message.
    */
  def contextDiff(expected: String, actual: String, context: Int = 4): String = {
    val e = expected.split("\n", -1)
    val a = actual.split("\n", -1)
    val i = e.zip(a).indexWhere { case (x, y) => x != y } match {
      case -1 => math.min(e.length, a.length) // pure length difference
      case k  => k
    }
    def slice(ls: Array[String], tag: String): String =
      ls.slice(math.max(0, i - context), i + context + 1)
        .zipWithIndex.map { case (l, j) =>
          val mark = if (math.max(0, i - context) + j == i) ">>" else "  "
          s"$mark $tag $l"
        }.mkString("\n")
    s"first divergence at line ${i + 1}:\n${slice(e, "exp|")}\n${slice(a, "got|")}"
  }
}

/** Regenerate the checked-in plan corpus:
  *   sbt "Test/runMain graft.queries.PlanDump [queryPrefix...]"
  * Writes one `<name>.plan` per registry query under
  * `src/test/resources/plans/`. Run it after an INTENTIONAL plan change,
  * eyeball the git diff of the .plan files (that diff IS the review
  * artifact), and commit them with the code change.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.SharedSpark.spark
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true else n => args.exists(n.startsWith)
    Files.createDirectories(PlanCorpus.dir)
    Registry.all.map(_.name).sorted.filter(wanted).foreach { name =>
      val fp = PlanCorpus.fingerprint(spark, name)
      Files.write(PlanCorpus.expectedFile(name), fp.getBytes("UTF-8"))
      println(s"wrote ${PlanCorpus.expectedFile(name)} (${fp.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
