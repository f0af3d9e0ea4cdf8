package graft

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-fixture OOXML writer: builds a minimal real `.xlsx` (inline-string
  * cells only) so end-to-end tests can start from an actual workbook file
  * rather than the pre-converted `{tab}.csv` contract.
  */
object TestXlsx {

  /** Writes a zip of raw OOXML parts, prepending the package boilerplate
    * ([Content_Types], package rels) every workbook needs — the single
    * zip-plumbing helper all xlsx fixtures build on (the hand-authored
    * fixtures in XlsxConverterSpec supply their own xl/ parts to exercise
    * specific format features).
    */
  def writeParts(path: Path, parts: Seq[(String, String)]): String = {
    val z = new ZipOutputStream(Files.newOutputStream(path))
    val all = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""",
      "_rels/.rels" ->
        """<?xml version="1.0"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin) ++ parts
    all.foreach { case (name, body) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    path.toString
  }

  def write(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val sheetParts = sheets.zipWithIndex.map { case ((_, rows), i) =>
      val body = rows.zipWithIndex.map { case (cells, r) =>
        val cs = cells.zipWithIndex.map { case (v, c) =>
          if (v.isEmpty) ""
          else {
            val ref = s"${colRef(c)}${r + 1}"
            s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
          }
        }.mkString
        s"""<row r="${r + 1}">$cs</row>"""
      }.mkString
      s"xl/worksheets/sheet${i + 1}.xml" ->
        s"""<?xml version="1.0"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$body</sheetData>
           |</worksheet>""".stripMargin
    }
    writeParts(path, Seq(
      "xl/workbook.xml" ->
        s"""<?xml version="1.0"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
           |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets>$sheetTags</sheets>
           |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        s"""<?xml version="1.0"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""".stripMargin
    ) ++ sheetParts)
  }

  private def colRef(c: Int): String =
    if (c < 26) ('A' + c).toChar.toString
    else colRef(c / 26 - 1) + ('A' + c % 26).toChar
}
