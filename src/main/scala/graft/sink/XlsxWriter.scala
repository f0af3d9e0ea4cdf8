package graft.sink

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** K5: dependency-free OOXML workbook WRITER — the mirror image of
  * [[graft.sources.XlsxConverter]] (an `.xlsx` is a zip of XML parts, so
  * the JDK's zip + string building is all a writer needs offline).
  *
  * The reference's pivot sinks emit real multi-sheet workbooks via
  * `petl.toxlsx` (etl/mci/data_pivoter.py:115-164, json_pivoter.py); this
  * writer closes that last sink-format gap. Emitted parts:
  *
  *   - `[Content_Types].xml` with per-sheet overrides (required for any
  *     consumer stricter than our own reader — Excel refuses a package
  *     whose parts are untyped);
  *   - package + workbook relationships;
  *   - `xl/workbook.xml` with sheets in the given order;
  *   - one `xl/worksheets/sheetN.xml` per sheet, every cell an INLINE
  *     string (`t="inlineStr"`): the pivot contract is all-string cells,
  *     and inline strings need no sharedStrings table while remaining
  *     fully standard OOXML — [[graft.sources.XlsxConverter]] reads them
  *     back verbatim, so write→read round-trips bit-exactly.
  *
  * Cells with leading/trailing/multiple spaces carry
  * `xml:space="preserve"` (without it a conformant XML consumer may
  * collapse whitespace). Empty cells are omitted (sparse rows, like every
  * real producer); the reader re-densifies.
  *
  * Driver-side by design, like the converter: workbooks are MB-scale
  * REPORT artifacts (a human opens them), never the data path — at
  * 100 TB the distributed sinks are parquet/CSV, and this renders the
  * study-scale summary a clinician actually reads.
  */
object XlsxWriter {

  /** Characters Excel forbids in sheet names. */
  private val BadSheetChars = "[]:*?/\\"

  /** Sanitize a sheet name: forbidden chars → `_`, cap at 31 chars
    * (Excel's hard limit; the reference truncates long form ids the same
    * way, data_pivoter.py:152-158).
    */
  def sheetName(raw: String): String = {
    val cleaned = raw.map(c => if (BadSheetChars.indexOf(c) >= 0) '_' else c)
    if (cleaned.length <= 31) cleaned else cleaned.take(31)
  }

  /** Write `sheets` (name → row grid, first row usually the header) as a
    * real `.xlsx`. Names are sanitized; a DUPLICATE post-sanitize name
    * skips the later sheet with a warning — the reference's pivoter does
    * exactly this on truncation collisions (data_pivoter.py:159-160).
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val seen = scala.collection.mutable.LinkedHashMap[String, Seq[Seq[String]]]()
    sheets.foreach { case (raw, rows) =>
      val name = sheetName(raw)
      if (seen.contains(name))
        System.err.println(s"[graft] WARN: duplicate sheet name '$name' ($raw) — skipped")
      else seen(name) = rows
    }
    val named = seen.toSeq
    val p: Path = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val z = new ZipOutputStream(Files.newOutputStream(p))
    def part(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    try {
      val overrides = named.indices.map { i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
      }.mkString
      part("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
           |$overrides
           |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      val sheetTags = named.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${escAttr(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      part("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets>$sheetTags</sheets>
           |</workbook>""".stripMargin)
      val rels = named.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      part("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""".stripMargin)
      named.zipWithIndex.foreach { case ((_, rows), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", worksheetXml(rows))
      }
    } finally z.close()
  }

  private def worksheetXml(rows: Seq[Seq[String]]): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">")
    sb.append("<sheetData>")
    rows.zipWithIndex.foreach { case (cells, r) =>
      sb.append(s"""<row r="${r + 1}">""")
      cells.zipWithIndex.foreach { case (v, c) =>
        if (v.nonEmpty) {
          val preserve =
            if (v.head.isWhitespace || v.last.isWhitespace) """ xml:space="preserve"""" else ""
          sb.append(s"""<c r="${cellRef(c, r)}" t="inlineStr"><is><t$preserve>""")
            .append(escText(v)).append("</t></is></c>")
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Zero-based (col, row) → A1-style reference. */
  private def cellRef(c: Int, r: Int): String = colRef(c) + (r + 1)

  private def colRef(c: Int): String =
    if (c < 26) ('A' + c).toChar.toString
    else colRef(c / 26 - 1) + ('A' + c % 26).toChar

  private def escText(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def escAttr(s: String): String =
    escText(s).replace("\"", "&quot;")
}
