package graft

import java.nio.file.Files

import graft.sink.HarmonizedJsonSink

/** The standalone reporter CLI (reference
  * harmonized_data_reporter.py:96-125): per-study node counts over
  * harmonized output, union-of-fieldnames CSV with csv.DictWriter
  * rendering (first-seen column order, empty missing cells, CRLF rows).
  */
class ReporterSpec extends SparkTestBase {
  import spark.implicits._

  private def nodesA = Map(
    "participant" -> Seq(("P1", "Auto"), ("P2", null)).toDF("participant_id", "segment"),
    "study" -> Seq("ST1").toDF("study_id"))
  // different node set than A: exercises union-of-fieldnames + empty cells
  private def nodesB = Map(
    "participant" -> Seq(("P9", "Manual")).toDF("participant_id", "segment"),
    "diagnosis" -> Seq(("D1", "P9"), ("D2", "P9"), ("D3", "P9"))
      .toDF("diagnosis_id", "participant_id"))

  test("document mode: per-node counts in document key order") {
    val dir = Files.createTempDirectory("graft_reporter")
    val doc = dir.resolve("a.json").toString
    HarmonizedJsonSink.writeDocument(nodesA, doc)
    val rows = Reporter.reportRows(spark, Seq("study_a" -> doc))
    assert(rows == Seq(Seq(
      "study" -> "study_a", "participants" -> "2", "studies" -> "1")))
  }

  test("directory mode: distributed JSON-lines counts, name-sorted") {
    val dir = Files.createTempDirectory("graft_reporter_dist").toString
    HarmonizedJsonSink.writeDistributed(nodesB, dir)
    val rows = Reporter.reportRows(spark, Seq("study_b" -> dir))
    assert(rows == Seq(Seq(
      "study" -> "study_b", "diagnoses" -> "3", "participants" -> "1")))
  }

  test("CSV: union header in first-seen order, empty missing cells, CRLF") {
    val dir = Files.createTempDirectory("graft_reporter_csv")
    val a = dir.resolve("a.json").toString
    val b = dir.resolve("b").toString
    HarmonizedJsonSink.writeDocument(nodesA, a)
    HarmonizedJsonSink.writeDistributed(nodesB, b)
    val out = dir.resolve("report.csv").toString
    Reporter.writeReport(spark, Seq("study_a" -> a, "study_b" -> b), out)
    val got = new String(Files.readAllBytes(dir.resolve("report.csv")), "UTF-8")
    assert(got ==
      "study,participants,studies,diagnoses\r\n" +
      "study_a,2,1,\r\n" +
      "study_b,1,,3\r\n")
  }

  test("csv cells quote commas and double internal quotes (DictWriter minimal quoting)") {
    val csv = Reporter.toCsv(Seq(
      Seq("study" -> "a,b", "n" -> "say \"hi\""),
      Seq("study" -> "plain", "n" -> "7")))
    assert(csv ==
      "study,n\r\n" +
      "\"a,b\",\"say \"\"hi\"\"\"\r\n" +
      "plain,7\r\n")
  }

  test("config form: .env HARMONIZED_DATA_FILES drives studies in JSON key order") {
    val cfg = Reporter.parseEnv(
      """# comment
        |REPORT_OUTPUT_PATH='/tmp/out.csv'
        |HARMONIZED_DATA_FILES={"s2": "/p/two.json", "s1": "/p/one.json"}
        |""".stripMargin)
    assert(cfg("REPORT_OUTPUT_PATH") == "/tmp/out.csv")
    assert(Reporter.filesFromJson(cfg("HARMONIZED_DATA_FILES")) ==
      Seq("s2" -> "/p/two.json", "s1" -> "/p/one.json"))
  }

}
