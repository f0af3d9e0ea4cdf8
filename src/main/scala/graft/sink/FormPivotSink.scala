package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** K5: the per-form pivot sink (reference etl/mci/data_pivoter.py:58-164).
  *
  * Long (subject, form, field, value) entries become one wide CSV per
  * form (a row per subject, a column per field, FIRST value wins in
  * entry order) plus a `full_width` sheet left-joining every form on the
  * subject key with form-qualified column names — exactly the reference's
  * multi-sheet workbook, as a directory of CSV "sheets" (the XLSX
  * container stays out of scope offline, SURVEY §7.4).
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
    val forms = entries.select(col(formCol)).distinct()
      .collect().map(_.getString(0)).sorted
    val pivoted = forms.map { f =>
      f -> pivotForm(
        entries.filter(col(formCol) === f), subjectCol, fieldCol, valueCol, ordCol)
    }
    pivoted.foreach { case (f, df) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", true).csv(s"$outDir/$f")
    }
    val base = entries.select(col(subjectCol)).distinct()
    val full = pivoted.foldLeft(base) { case (acc, (f, df)) =>
      val qualified = df.columns.filterNot(_ == subjectCol)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$f.$c"))
      acc.join(qualified, Seq(subjectCol), "left")
    }
    full.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", true).csv(s"$outDir/full_width")
  }
}
