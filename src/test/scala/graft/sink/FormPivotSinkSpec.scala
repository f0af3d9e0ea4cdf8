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

  test("writeWorkbook refuses oversized frames loudly, naming the remedy") {
    val out = Files.createTempDirectory("graft_formpivot_guard").resolve("wb.xlsx")
    val e = intercept[IllegalArgumentException] {
      FormPivotSink.writeWorkbook(entries, out.toString, maxRows = 1)
    }
    assert(e.getMessage.contains("writeSheets"), e.getMessage)
    assert(!Files.exists(out), "guard must fire before any output is written")
  }

  test("writeWorkbook round-trips through the native XLSX reader") {
    // K5's last gap: the sink emits a REAL workbook (full_width sheet
    // first, forms sorted — the reference's _ALL_FORMS_ layout) that
    // XlsxConverter reads back cell-for-cell
    val out = Files.createTempDirectory("graft_formwb").resolve("report.xlsx")
    FormPivotSink.writeWorkbook(entries, out.toString)
    val sheets = graft.sources.XlsxConverter.readWorkbook(out.toString)
    assert(sheets.map(_._1) == Seq("full_width", "DEMOG", "VISIT"))
    val byName = sheets.toMap
    assert(byName("full_width") == Seq(
      Seq("subject", "DEMOG.age", "DEMOG.sex", "VISIT.status"),
      Seq("u1", "12", "F", "alive"),
      Seq("u2", "", "M", ""))) // blanks where the left join had nulls
    assert(byName("DEMOG") == Seq(
      Seq("subject", "age", "sex"),
      Seq("u1", "12", "F"),
      Seq("u2", "", "M")))
    assert(byName("VISIT") == Seq(
      Seq("subject", "status"),
      Seq("u1", "alive")))
  }

  test("workbook scan of the emitted artifact equals the CSV-sheet frames") {
    // the emitted .xlsx is itself a valid SourceReader.workbook input —
    // write → scan round-trip across the two K5 containers
    val out = Files.createTempDirectory("graft_formwb2").resolve("report.xlsx")
    FormPivotSink.writeWorkbook(entries, out.toString)
    val tabs = graft.sources.SourceReader.workbook(spark, out.toString, audit = false)
    assert(tabs.keySet == Set("full_width", "DEMOG", "VISIT"))
    val demog = tabs("DEMOG").orderBy("subject")
      .select("subject", "age", "sex")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(demog.toSeq == Seq(("u1", "12", "F"), ("u2", null, "M")))
  }

  test("sheet names: forbidden chars sanitized, >31 chars truncated, dups skipped") {
    val grid = Seq(Seq("h"), Seq("v"))
    assert(XlsxWriter.sheetName("a/b:c*d?e[f]g\\h") == "a_b_c_d_e_f_g_h")
    val long = "FORM_" + ("X" * 40)
    assert(XlsxWriter.sheetName(long).length == 31)
    val out = Files.createTempDirectory("graft_wbnames").resolve("n.xlsx")
    // two names colliding post-truncation: later one is skipped, like the
    // reference pivoter (data_pivoter.py:159-160)
    XlsxWriter.write(out.toString, Seq(long + "A" -> grid, long + "B" -> grid))
    val sheets = graft.sources.XlsxConverter.readWorkbook(out.toString)
    assert(sheets.size == 1 && sheets.head._1 == XlsxWriter.sheetName(long))
  }
}
