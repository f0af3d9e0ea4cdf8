package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** K5: the per-form pivot sink (reference etl/mci/data_pivoter.py:58-164).
  *
  * Long (subject, form, field, value) entries become one wide sheet per
  * form (a row per subject, a column per field, FIRST value wins in
  * entry order) plus a `full_width` sheet left-joining every form on the
  * subject key with form-qualified column names — exactly the reference's
  * multi-sheet workbook. Two containers:
  *
  *   - [[writeSheets]]: a directory of CSV "sheets" — the splittable
  *     format a 100 TB pivot would land in;
  *   - [[writeWorkbook]]: a real `.xlsx` via [[XlsxWriter]], full-width
  *     sheet first then forms in sorted order, mirroring the reference's
  *     `_ALL_FORMS_`-then-forms workbook layout (data_pivoter.py:133-162
  *     incl. its 31-char sheet-name truncation). Driver-side: workbooks
  *     are MB-scale human-readable report artifacts, never the data path.
  *
  * Scale: each form's pivot is one explicit-value-list aggregation (the
  * field list comes from a metadata-sized distinct), and the full-width
  * join chain joins per-form frames already reduced to one row per
  * subject.
  */
object FormPivotSink {

  /** Pivot one form's entries wide: row per subject, column per field,
    * first value per (subject, field) by `ord`.
    */
  def pivotForm(
      entries: DataFrame, subjectCol: String, fieldCol: String,
      valueCol: String, ordCol: String): DataFrame = {
    val fields = entries.select(col(fieldCol)).distinct()
      .collect().map(_.getString(0)).sorted
    entries.groupBy(col(subjectCol))
      .pivot(col(fieldCol), fields)
      .agg(min_by(col(valueCol), col(ordCol)))
  }

  /** Every form pivoted wide (sorted form order) plus the full-width
    * left-join frame with `form.field`-qualified columns — the shared
    * shape both sink containers serialize.
    */
  def pivotAll(
      entries: DataFrame, subjectCol: String, formCol: String,
      fieldCol: String, valueCol: String, ordCol: String)
      : (Seq[(String, DataFrame)], DataFrame) = {
    val forms = entries.select(col(formCol)).distinct()
      .collect().map(_.getString(0)).sorted
    val pivoted = forms.toSeq.map { f =>
      f -> pivotForm(
        entries.filter(col(formCol) === f), subjectCol, fieldCol, valueCol, ordCol)
    }
    val base = entries.select(col(subjectCol)).distinct()
    val full = pivoted.foldLeft(base) { case (acc, (f, df)) =>
      val qualified = df.columns.filterNot(_ == subjectCol)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$f.$c"))
      acc.join(qualified, Seq(subjectCol), "left")
    }
    (pivoted, full)
  }

  /** Write one CSV "sheet" per form plus the full-width left-join sheet
    * (columns `form.field`, headers sorted like the reference's pivoter).
    *
    * @param entries long frame: subject, form, field, value, ord
    */
  def writeSheets(
      entries: DataFrame, outDir: String,
      subjectCol: String = "subject", formCol: String = "form",
      fieldCol: String = "field", valueCol: String = "value",
      ordCol: String = "ord"): Unit = {
    val (pivoted, full) = pivotAll(entries, subjectCol, formCol, fieldCol, valueCol, ordCol)
    pivoted.foreach { case (f, df) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", true).csv(s"$outDir/$f")
    }
    full.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", true).csv(s"$outDir/full_width")
  }

  /** Write the same pivot as ONE real `.xlsx` workbook: `full_width`
    * first (the reference writes its `_ALL_FORMS_` join as the first
    * sheet), then each form sorted. Rows are ordered by the subject key
    * so the emitted artifact is deterministic; nulls render as blank
    * cells. Collects to the driver — the workbook container is for
    * study-scale report output (the reference's pivoter is fully
    * in-memory petl for the same reason).
    */
  /** Hard ceiling on subjects (= workbook rows per sheet) before
    * [[writeWorkbook]] refuses to collect: past this the artifact is no
    * longer a study-scale report and belongs in [[writeSheets]]. 2^20 is
    * also XLSX's own row limit per sheet (ECMA-376 §18.3.1.73), so a
    * workbook above it would be malformed anyway.
    */
  val MaxWorkbookRows: Long = 1L << 20

  def writeWorkbook(
      entries: DataFrame, outPath: String,
      subjectCol: String = "subject", formCol: String = "form",
      fieldCol: String = "field", valueCol: String = "value",
      ordCol: String = "ord", maxRows: Long = MaxWorkbookRows): Unit = {
    // LOUD driver-OOM guard: one metadata-cheap count before any collect —
    // a distributed frame pointed here by mistake must fail with the
    // remedy, not take down the driver
    val subjects = entries.select(col(subjectCol)).distinct().count()
    require(subjects <= maxRows,
      s"writeWorkbook collects to the driver and the frame has $subjects subjects " +
        s"(> $maxRows; the hard default is the XLSX per-sheet row limit) — " +
        "use writeSheets for a distributed CSV-sheet pivot instead")
    val (pivoted, full) = pivotAll(entries, subjectCol, formCol, fieldCol, valueCol, ordCol)
    def grid(df: DataFrame): Seq[Seq[String]] = {
      val cols = df.columns.toIndexedSeq
      cols +: df.orderBy(col(subjectCol)).collect().toSeq.map { r =>
        cols.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse(""))
      }
    }
    XlsxWriter.write(outPath,
      ("full_width" -> grid(full)) +: pivoted.map { case (f, df) => f -> grid(df) })
  }
}
