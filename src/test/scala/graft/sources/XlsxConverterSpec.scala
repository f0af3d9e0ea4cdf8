package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** S3 native XLSX reader semantics against a hand-built OOXML workbook —
  * the fixture is authored part by part (workbook.xml, rels,
  * sharedStrings, worksheets) so the test exercises the format spec, not
  * a writer library's subset of it. Covered: tab order + names, shared /
  * inline / formula-string cells, `data_only` cached formula values,
  * unevaluated formulas → blank, booleans as openpyxl renders them,
  * sparse cell refs re-expanding into a dense grid, rich-text runs
  * concatenating, and the end-to-end path through
  * [[SourceReader.workbook]] with header hygiene downstream.
  */
class XlsxConverterSpec extends SparkTestBase {

  private def buildXlsx(dir: Path): String = graft.TestXlsx.writeParts(
    dir.resolve("study.xlsx"), Seq(
    // deliberately listed rId2-then-rId1 to prove tab order follows the
    // <sheets> sequence, not relationship ids
    "xl/workbook.xml" ->
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="participant" sheetId="1" r:id="rId2"/>
        |<sheet name="diagnosis" sheetId="2" r:id="rId1"/>
        |</sheets>
        |</workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin,
    // shared-string entry 2 is a rich-text string split across runs — must
    // concatenate the <r> runs but EXCLUDE the phonetic <rPh> annotation.
    // sheet1 row 3: sparse (A skipped via explicit C-column ref); row 4:
    // cached formula value (data_only) + unevaluated formula (blank)
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>participant_id</t></si>
        |<si><t xml:space="preserve"> sex </t></si>
        |<si><r><t>P</t></r><r><t>001</t></r><rPh sb="0" eb="1"><t>pii</t></rPh></si>
        |</sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>age_days</t></is></c><c r="D1" t="str"><v>enrolled</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="inlineStr"><is><t>F</t></is></c><c r="C2"><v>4015</v></c><c r="D2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>P002</t></is></c><c r="C3"><v>365</v></c><c r="D3" t="b"><v>0</v></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>P003</t></is></c><c r="B4" t="inlineStr"><is><t>M</t></is></c><c r="C4"><f>SUM(X1:X2)</f><v>730</v></c><c r="D4"><f>NEVER()</f></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>diagnosis_id</t></is></c><c r="B1" t="inlineStr"><is><t>code, note</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>D1</t></is></c><c r="B2" t="inlineStr"><is><t>C71.9 "primary"</t></is></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin))

  /** Workbook with styles.xml: style 1 = builtin date (14), style 2 =
    * custom date code, style 3 = plain decimal — only 1 and 2 convert.
    */
  private def buildDatedXlsx(dir: Path): String = graft.TestXlsx.writeParts(
    dir.resolve("dated.xlsx"), Seq(
    "xl/workbook.xml" ->
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="visits" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin,
    "xl/styles.xml" ->
      """<?xml version="1.0"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/>
        |<numFmt numFmtId="165" formatCode="0.00"/>
        |</numFmts>
        |<cellXfs count="4">
        |<xf numFmtId="0"/>
        |<xf numFmtId="14"/>
        |<xf numFmtId="164"/>
        |<xf numFmtId="165"/>
        |</cellXfs>
        |</styleSheet>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>visit_date</t></is></c><c r="B1" t="inlineStr"><is><t>visit_dt</t></is></c><c r="C1" t="inlineStr"><is><t>score</t></is></c><c r="D1" t="inlineStr"><is><t>plain</t></is></c><c r="E1" t="inlineStr"><is><t>lotus</t></is></c><c r="F1" t="inlineStr"><is><t>tod</t></is></c><c r="G1" t="inlineStr"><is><t>phantom</t></is></c><c r="H1" t="inlineStr"><is><t>emptyb</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>45292</v></c><c r="B2" s="2"><v>45292.5</v></c><c r="C2" s="3"><v>45292</v></c><c r="D2"><v>45292</v></c><c r="E2" s="1"><v>1</v></c><c r="F2" s="1"><v>0.5</v></c><c r="G2" s="1"><v>60</v></c><c r="H2" t="b"/></row>
        |</sheetData>
        |</worksheet>""".stripMargin))

  private def tmp(): Path = {
    val d = Files.createTempDirectory("xlsx")
    d.toFile.deleteOnExit()
    d
  }

  test("readWorkbook: tab order, cell types, data_only, sparse grid") {
    val grid = XlsxConverter.readWorkbook(buildXlsx(tmp()))
    assert(grid.map(_._1) == Seq("participant", "diagnosis"))
    val part = grid.head._2
    assert(part(0) == Seq("participant_id", " sex ", "age_days", "enrolled"))
    assert(part(1) == Seq("P001", "F", "4015", "True")) // run concat, rPh dropped, bool
    assert(part(2) == Seq("P002", "", "365", "False")) // skipped B stays blank
    assert(part(3) == Seq("P003", "M", "730", "")) // cached 730; NEVER() blank
  }

  test("date-styled serials convert like openpyxl; other numerics stay raw") {
    val grid = XlsxConverter.readWorkbook(buildDatedXlsx(tmp()))
    val rows = grid.head._2
    assert(rows(0) == Seq("visit_date", "visit_dt", "score", "plain",
      "lotus", "tod", "phantom", "emptyb"))
    // builtin fmt 14 → date; custom y/m/d code → datetime for .5 serial;
    // decimal fmt and unstyled stay raw serials. openpyxl quirks: serial 1
    // = 1900-01-01 (pre-60 +1-day shift), 0.5 = bare time-of-day, 60 (the
    // phantom Lotus leap day) = 1900-02-28; a boolean cell without a
    // cached value is blank
    assert(rows(1) == Seq("2024-01-01", "2024-01-01 12:00:00", "45292", "45292",
      "1900-01-01", "12:00:00", "1900-02-28", ""))
  }

  test("convert: emitted CSV round-trips commas, quotes, and blanks") {
    val d = tmp()
    val out = XlsxConverter.convert(buildXlsx(d), d.resolve("csvs").toString)
    assert(out.keySet == Set("participant", "diagnosis"))
    val diag = new String(Files.readAllBytes(Files.list(d.resolve("csvs"))
      .filter(_.getFileName.toString == "diagnosis.csv").findFirst().get()), "UTF-8")
    assert(diag == "diagnosis_id,\"code, note\"\nD1,\"C71.9 \"\"primary\"\"\"\n")
  }

  test("SourceReader.workbook: end-to-end .xlsx scan with header hygiene") {
    val d = tmp()
    val tabs = SourceReader.workbook(spark, buildXlsx(d))
    assert(tabs.keySet == Set("participant", "diagnosis"))
    val p = tabs("participant")
    // " sex " header is trimmed by the downstream hygiene pass
    assert(p.columns.contains("sex"))
    val rows = p.select(col("participant_id"), coalesce(col("sex"), lit("∅")),
        col("age_days"), coalesce(col("enrolled"), lit("∅")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("P001", "F", "4015", "True"),
      ("P002", "∅", "365", "False"),
      ("P003", "M", "730", "∅")))
  }
}
