package graft.queries

import graft.SparkTestBase

/** EXPLAIN-diff regression gate: every registry query's normalized physical
  * plan must match its checked-in fingerprint
  * (`src/test/resources/plans/<name>.plan`, written by `PlanDump`).
  *
  * `PlanAssertionsSpec` guards a handful of named scale properties; this
  * spec guards EVERYTHING ELSE about the 66 plans — a refactor that
  * reintroduces a window sort, drops a broadcast, or grows an extra
  * exchange fails here with a line diff, instead of surviving until the
  * next manual `.explain` audit.
  *
  * On an INTENTIONAL plan change: regenerate with
  *   sbt "Test/runMain graft.queries.PlanDump <query>"
  * review the .plan git diff, and commit it alongside the code.
  */
class PlanRegressionSpec extends SparkTestBase {

  test("plan corpus covers every registry query (no unfingerprinted query)") {
    val missing = Registry.all.map(_.name).filter(PlanCorpus.expected(_).isEmpty)
    assert(missing.isEmpty,
      s"queries with no checked-in fingerprint: ${missing.sorted.mkString(", ")} — " +
        "run: sbt \"Test/runMain graft.queries.PlanDump\"")
  }

  test("plan corpus has no orphan fingerprints (stale .plan files)") {
    import scala.jdk.CollectionConverters._
    val known = Registry.all.map(_.name).toSet
    val orphans = java.nio.file.Files.list(PlanCorpus.dir).iterator.asScala
      .map(_.getFileName.toString).filter(_.endsWith(".plan"))
      .map(_.stripSuffix(".plan")).filterNot(known).toSeq
    assert(orphans.isEmpty, s"fingerprints for unknown queries: ${orphans.sorted.mkString(", ")}")
  }

  Registry.all.map(_.name).sorted.foreach { name =>
    test(s"plan unchanged: $name") {
      PlanCorpus.expected(name) match {
        case None => fail(s"no checked-in fingerprint for $name (see corpus-coverage test)")
        case Some(exp) =>
          val got = PlanCorpus.fingerprint(spark, name)
          if (got != exp)
            fail(s"plan shape changed for $name — if intentional, regenerate with " +
              s"""sbt "Test/runMain graft.queries.PlanDump $name" and commit the diff.\n""" +
              PlanCorpus.contextDiff(exp, got))
      }
    }
  }
}
