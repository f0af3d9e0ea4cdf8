package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

/** Native XLSX ingest (SURVEY.md §2.1 S3/S4): a dependency-free OOXML
  * worksheet reader built on the JDK's zip + StAX — an `.xlsx` file IS a
  * zip of XML parts, so no spreadsheet library is needed for the subset
  * the reference consumes.
  *
  * Semantics mirror the reference's `petl.fromxlsx(..., data_only=True)`
  * (etl/target/c3dc_etl.py:515-537; streaming variant
  * etl/ccdi/c3dc_etl.py:385-408):
  *   - tabs appear in workbook order under their workbook names;
  *   - `data_only`: a formula cell yields its CACHED computed value (the
  *     `<v>` element) and the formula text is ignored; a formula cell the
  *     producing application never evaluated yields blank;
  *   - shared strings (`t="s"`), inline strings (`t="inlineStr"`), formula
  *     strings (`t="str"`), booleans (`t="b"` → `True`/`False`, openpyxl's
  *     Python bool rendering), and raw numeric/error text pass through;
  *   - sparse rows/cells (OOXML omits empty trailing cells and rows)
  *     re-expand into a dense grid, so downstream header alignment works;
  *   - date-STYLED numeric cells (builtin formats 14–22/45–47 or custom
  *     codes with date tokens, resolved via styles.xml cellXfs) convert
  *     from their Excel serial to the string openpyxl's datetime value
  *     renders (date for midnight, `yyyy-MM-dd HH:mm:ss` otherwise),
  *     1899-12-30 base absorbing the Lotus leap-bug exactly as openpyxl
  *     does.
  *
  * The converter is DRIVER-side by design: study workbooks are MB-scale
  * ingest edges (the reference reads them whole into petl). The
  * distributed path starts at the emitted `{tab}.csv` directory — exactly
  * the contract [[SourceReader.workbookDir]] scans, which at 100 TB would
  * be the splittable format a workbook export lands in anyway.
  */
object XlsxConverter {

  /** Workbook → (sheet name, dense row grid) in workbook tab order. */
  def readWorkbook(xlsxPath: String): Seq[(String, Seq[Seq[String]])] = {
    val zip = new ZipFile(xlsxPath)
    try {
      val rels = parseRels(zip)
      val shared = parseSharedStrings(zip)
      val dateStyles = parseDateStyles(zip)
      parseSheetList(zip).map { case (name, rid) =>
        val target = rels.getOrElse(rid,
          throw new IllegalArgumentException(s"workbook sheet '$name' has unresolved relationship $rid"))
        val part = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        name -> parseWorksheet(zip, part, shared, dateStyles)
      }
    } finally zip.close()
  }

  /** Convert a workbook into the `{tab}.csv` directory contract; returns
    * tab name → emitted csv path. Tab names are sanitized for the
    * filesystem the same way the pivot sink does (path separators → `_`).
    */
  def convert(xlsxPath: String, outDir: String): Map[String, String] = {
    Files.createDirectories(Paths.get(outDir))
    readWorkbook(xlsxPath).map { case (name, rows) =>
      val safe = name.replaceAll("[/\\\\]", "_")
      val out = Paths.get(outDir, s"$safe.csv")
      val sb = new java.lang.StringBuilder()
      rows.foreach { r =>
        sb.append(r.map(csvQuote).mkString(",")).append('\n')
      }
      Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
      name -> out.toString
    }.toMap
  }

  private def csvQuote(v: String): String =
    if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  // hardened factory: workbook XML is untrusted input — no DTDs, no
  // external entities
  private def reader(zip: ZipFile, part: String): Option[XMLStreamReader] =
    Option(zip.getEntry(part)).map { e =>
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.createXMLStreamReader(zip.getInputStream(e))
    }

  /** xl/_rels/workbook.xml.rels: relationship id → target part path. */
  private def parseRels(zip: ZipFile): Map[String, String] = {
    val r = reader(zip, "xl/_rels/workbook.xml.rels").getOrElse(
      throw new IllegalArgumentException("not an xlsx workbook: missing xl/_rels/workbook.xml.rels"))
    val out = mutable.Map[String, String]()
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
        out(attr(r, "Id").getOrElse("")) = attr(r, "Target").getOrElse("")
    } finally r.close()
    out.toMap
  }

  /** xl/workbook.xml: (sheet name, relationship id) in tab order. */
  private def parseSheetList(zip: ZipFile): Seq[(String, String)] = {
    val r = reader(zip, "xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException("not an xlsx workbook: missing xl/workbook.xml"))
    val out = mutable.ArrayBuffer[(String, String)]()
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = attr(r, "name").getOrElse("")
        // the r:id attribute lives in the officeDocument relationships
        // namespace; match by local name to stay prefix-agnostic
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue)
          .getOrElse("")
        out += name -> rid
      }
    } finally r.close()
    out.toSeq
  }

  /** xl/sharedStrings.xml: one string per `<si>`, concatenating every
    * `<t>` run (rich-text cells split one logical string across runs) —
    * EXCEPT runs inside `<rPh>`/`<phoneticPr>` (furigana annotations),
    * which are not part of the cell string (openpyxl drops them too).
    */
  private def parseSharedStrings(zip: ZipFile): IndexedSeq[String] =
    reader(zip, "xl/sharedStrings.xml").fold(IndexedSeq.empty[String]) { r =>
      val out = mutable.ArrayBuffer[String]()
      val cur = new java.lang.StringBuilder()
      var inT = false
      var inPhonetic = false
      try while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          cur.setLength(0); inPhonetic = false
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "rPh" => inPhonetic = true
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rPh" => inPhonetic = false
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" => inT = !inPhonetic
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" => inT = false
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" => out += cur.toString
        case _ => ()
      } finally r.close()
      out.toIndexedSeq
    }

  /** xl/styles.xml → the set of cellXfs style indexes whose number format
    * renders as a date/time (the `s` attribute on a cell indexes into
    * cellXfs). Builtin date formats are ids 14–22 and 45–47; a custom
    * format counts when its code contains day/month/year/hour tokens
    * outside [brackets] and "quoted" literals — the same classification
    * openpyxl applies for its `is_date_format`.
    */
  private def parseDateStyles(zip: ZipFile): Set[Int] =
    reader(zip, "xl/styles.xml").fold(Set.empty[Int]) { r =>
      val customDate = mutable.Set[Int]()
      val styleFmts = mutable.ArrayBuffer[Int]()
      var inCellXfs = false
      try while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = attr(r, "numFmtId").flatMap(_.toIntOption).getOrElse(-1)
            val code = attr(r, "formatCode").getOrElse("")
            val bare = code.replaceAll("\\[[^\\]]*\\]", "").replaceAll("\"[^\"]*\"", "")
            if (bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0) && id >= 0) customDate += id
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            styleFmts += attr(r, "numFmtId").flatMap(_.toIntOption).getOrElse(0)
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ => ()
      } finally r.close()
      def isDateFmt(id: Int): Boolean =
        (id >= 14 && id <= 22) || (id >= 45 && id <= 47) || customDate.contains(id)
      styleFmts.zipWithIndex.collect { case (fmt, i) if isDateFmt(fmt) => i }.toSet
    }

  /** Excel 1900-system serial → the string openpyxl's value renders to
    * (`str(from_excel(serial))`), matching its documented quirks:
    *  - base 1899-12-30, with serials BELOW 60 shifted +1 day (serial 1 =
    *    1900-01-01; serial 60, the phantom Lotus 1900-02-29, lands on
    *    1900-02-28 unshifted);
    *  - `0 <= serial < 1` is a bare time-of-day, not a datetime;
    *  - sub-second precision rounds to MILLISECONDS (python renders a
    *    nonzero fraction as 6-digit microseconds);
    *  - midnight-exact datetimes print as a plain date.
    * Negative serials don't occur in real date cells — left raw.
    */
  private def serialToDate(raw: String): Option[String] =
    raw.trim.toDoubleOption.filter(_ >= 0).map { serial =>
      // round the WHOLE serial to ms first so a fraction that rounds up to
      // midnight carries into the day instead of overflowing LocalTime
      val totalMs = Math.round(serial * 86400000.0)
      val dayPart = totalMs / 86400000L
      val msOfDay = totalMs % 86400000L
      def timeStr(t: java.time.LocalTime): String = {
        val base = t.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
        if (t.getNano == 0) base else base + f".${t.getNano / 1000}%06d"
      }
      if (dayPart == 0L && serial < 1)
        timeStr(java.time.LocalTime.ofNanoOfDay(msOfDay * 1000000L))
      else {
        val days = if (dayPart < 60) dayPart + 1 else dayPart
        val dt = java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
          .plusDays(days).plusNanos(msOfDay * 1000000L)
        if (dt.toLocalTime == java.time.LocalTime.MIDNIGHT) dt.toLocalDate.toString
        else dt.toLocalDate.toString + " " + timeStr(dt.toLocalTime)
      }
    }

  /** One worksheet part → dense row grid (sparse refs re-expanded, every
    * row padded to the sheet's max width).
    */
  private def parseWorksheet(
      zip: ZipFile,
      part: String,
      shared: IndexedSeq[String],
      dateStyles: Set[Int]): Seq[Seq[String]] = {
    val r = reader(zip, part).getOrElse(
      throw new IllegalArgumentException(s"workbook references missing worksheet part $part"))
    // (rowIdx, colIdx) -> value, collected sparsely then densified
    val cells = mutable.Map[(Int, Int), String]()
    var maxRow = -1
    var maxCol = -1
    var rowIdx = -1
    var colIdx = -1
    var cellType = "n"
    var cellStyle = -1
    var inV = false
    var inIs = false
    var inIsT = false
    var inPhonetic = false
    var inF = false
    val text = new java.lang.StringBuilder()
    def flushCell(): Unit = if (colIdx >= 0) {
      val raw = text.toString
      val v = cellType match {
        case "s" => raw.trim.toIntOption.flatMap(shared.lift).getOrElse("")
        case "b" if raw.nonEmpty => if (raw.trim == "1") "True" else "False"
        case "b" => "" // boolean cell without a cached value is blank
        case "n" if raw.nonEmpty && dateStyles.contains(cellStyle) =>
          // date-styled numeric: render the serial the way openpyxl's
          // datetime value stringifies (date for midnight, else datetime)
          serialToDate(raw).getOrElse(raw)
        case _ => raw // "n" numeric, "str" formula string, "inlineStr", "e" error
      }
      if (v.nonEmpty) {
        cells((rowIdx, colIdx)) = v
        if (rowIdx > maxRow) maxRow = rowIdx
        if (colIdx > maxCol) maxCol = colIdx
      }
      text.setLength(0)
    }
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          rowIdx = attr(r, "r").flatMap(_.toIntOption).map(_ - 1).getOrElse(rowIdx + 1)
          colIdx = -1
        case "c" =>
          // a missing ref means "next cell"; an explicit ref may skip columns
          colIdx = attr(r, "r").map(colOf).getOrElse(colIdx + 1)
          cellType = attr(r, "t").getOrElse("n")
          cellStyle = attr(r, "s").flatMap(_.toIntOption).getOrElse(-1)
          text.setLength(0)
        case "v" => inV = true
        case "f" => inF = true // data_only: formula text is never a value
        case "is" => inIs = true
        case "rPh" => inPhonetic = true // furigana runs are not cell text
        // only <t> runs INSIDE <is> (and outside phonetic annotations)
        // are inline cell text
        case "t" if inIs && !inF && !inPhonetic => inIsT = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV || inIsT =>
        text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "f" => inF = false
        case "t" => inIsT = false
        case "is" => inIs = false
        case "rPh" => inPhonetic = false
        case "c" => flushCell()
        case _ => ()
      }
      case _ => ()
    } finally r.close()
    (0 to maxRow).map { ri =>
      (0 to maxCol).map(ci => cells.getOrElse((ri, ci), ""))
    }
  }

  /** `"BC7"` → zero-based column index (A=0, Z=25, AA=26...). */
  private def colOf(ref: String): Int = {
    var v = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      v = v * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    v - 1
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] =
    Option(r.getAttributeValue(null, name))
}
