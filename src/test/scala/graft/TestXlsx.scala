package graft

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-fixture OOXML writer: builds a minimal real `.xlsx` (inline-string
  * cells only) so end-to-end tests can start from an actual workbook file
  * rather than the pre-converted `{tab}.csv` contract.
  */
object TestXlsx {

  def write(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): String = {
    val z = new ZipOutputStream(Files.newOutputStream(path))
    def part(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    part("_rels/.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    part("xl/workbook.xml",
      s"""<?xml version="1.0"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$sheetTags</sheets>
         |</workbook>""".stripMargin)
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    part("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
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
      part(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$body</sheetData>
           |</worksheet>""".stripMargin)
    }
    z.close()
    path.toString
  }

  private def colRef(c: Int): String =
    if (c < 26) ('A' + c).toChar.toString
    else colRef(c / 26 - 1) + ('A' + c % 26).toChar
}
