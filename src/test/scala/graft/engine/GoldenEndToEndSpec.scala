package graft.engine

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

/** Golden end-to-end parity pins, one per engine mode (reference
  * etl/target = csv, etl/ccdi = workbook, etl/mci = jsondocs): run the
  * full config-driven pipeline over a COMMITTED fixture and compare every
  * harmonized document byte-for-byte against a committed golden file.
  *
  * The byte comparison pins everything the per-component specs assert
  * separately — replacement chains, defaults, enum gates, `{uuid}`
  * determinism, integer conversion, form-flatten first-wins, merge-dedup
  * first-wins, record order, field order (sorted), pluralization,
  * pretty-print shape — so an EtlRunner/sink refactor that shifts ANY of
  * it fails here with a file diff instead of surviving until a reference
  * re-read.
  *
  * On an INTENTIONAL output change, regenerate and review the git diff:
  *   GRAFT_REGEN_GOLDEN=1 sbt "Test/testOnly graft.engine.GoldenEndToEndSpec"
  */
class GoldenEndToEndSpec extends SparkTestBase {

  private val root = Paths.get("src/test/resources/fixtures/golden")
  private val regen = sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")

  /** Run one mode's fixture, then diff (or regenerate) every golden under
    * `expected/` against the run's output of the same file name.
    */
  private def check(mode: String, sourceRel: String, sourceFormat: String,
      rowKeyColumn: String, docNames: Seq[String]): Unit = {
    val dir = root.resolve(mode)
    val outDir = Files.createTempDirectory(s"graft_golden_$mode")
    EtlRunner.run(spark, EtlRunner.Config(
      dir.resolve("schema.json").toString,
      dir.resolve("transformations.json").toString,
      dir.resolve(sourceRel).toString,
      rowKeyColumn = rowKeyColumn,
      outDir = outDir.toString,
      sourceFormat = sourceFormat))
    val expectedDir = dir.resolve("expected")
    Files.createDirectories(expectedDir)
    docNames.foreach { name =>
      val produced = outDir.resolve(name)
      assert(Files.exists(produced), s"$mode run produced no $name")
      if (regen) {
        Files.copy(produced, expectedDir.resolve(name),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        info(s"regenerated golden $mode/expected/$name")
      } else {
        val golden = expectedDir.resolve(name)
        assert(Files.exists(golden),
          s"missing golden $mode/expected/$name — regenerate with " +
            "GRAFT_REGEN_GOLDEN=1 sbt \"Test/testOnly graft.engine.GoldenEndToEndSpec\"")
        val got = Files.readString(produced)
        val exp = Files.readString(golden)
        if (got != exp) {
          val diff = exp.linesIterator.zipAll(got.linesIterator, "<eof>", "<eof>")
            .zipWithIndex.collect {
              case ((e, g), i) if e != g => s"  line ${i + 1}:\n    golden: $e\n    got:    $g"
            }.take(8).mkString("\n")
          fail(s"$mode/$name drifted from its golden — if intentional, " +
            s"regenerate with GRAFT_REGEN_GOLDEN=1 and review the git diff.\n$diff")
        }
      }
    }
    // no goldens other than the ones this spec owns may accumulate
    val known = docNames.toSet
    val orphans = Files.list(expectedDir).iterator.asScala
      .map(_.getFileName.toString).filterNot(known).toSeq
    assert(orphans.isEmpty, s"orphan goldens under $mode/expected: $orphans")
  }

  test("TARGET mode (csv): harmonized + merged docs byte-stable") {
    check("target", "source.csv", "csv", rowKeyColumn = "TARGET USI",
      Seq("target1.harmonized.json", "target2.harmonized.json",
        "merged.harmonized.json"))
  }

  test("CCDI mode (workbook): harmonized + merged docs byte-stable") {
    check("ccdi", "workbook", "workbook", rowKeyColumn = "unused",
      Seq("ccdi1.harmonized.json", "merged.harmonized.json"))
  }

  test("MCI mode (jsondocs): harmonized + merged docs byte-stable") {
    check("mci", "docs", "jsondocs", rowKeyColumn = "upi",
      Seq("mci1.harmonized.json", "merged.harmonized.json"))
  }
}
