package graft.sink

import java.nio.file.Files

import graft.SparkTestBase

class FormPivotSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def entries = Seq(
    ("u1", "DEMOG", "sex", "F", 1L),
    ("u1", "DEMOG", "sex", "IGNORED-LATER", 2L), // first value wins
    ("u1", "DEMOG", "age", "12", 3L),
    ("u2", "DEMOG", "sex", "M", 4L),
    ("u1", "VISIT", "status", "alive", 5L)
    // u2 has no VISIT form → nulls in full_width
  ).toDF("subject", "form", "field", "value", "ord")

  test("per-form sheets pivot wide with first-value-wins") {
    val demog = FormPivotSink.pivotForm(
      entries.filter($"form" === "DEMOG"), "subject", "field", "value", "ord")
      .orderBy("subject")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // columns sorted: subject, age, sex
    assert(demog.toSeq == Seq(("u1", "12", "F"), ("u2", null, "M")))
  }

  test("writeSheets emits one CSV dir per form plus the full-width join") {
    val s = spark
    val out = Files.createTempDirectory("graft_formpivot").toString
    FormPivotSink.writeSheets(entries, out)
    val demog = s.read.option("header", true).csv(s"$out/DEMOG")
    assert(demog.columns.toSeq == Seq("subject", "age", "sex"))
    assert(demog.count() == 2)
    val full = s.read.option("header", true).csv(s"$out/full_width")
    assert(full.columns.toSeq ==
      Seq("subject", "DEMOG.age", "DEMOG.sex", "VISIT.status"))
    val u2 = full.filter(full("subject") === "u2").collect().head
    assert(u2.getAs[String]("VISIT.status") == null) // left join keeps u2
  }
}
