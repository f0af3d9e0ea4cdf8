package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A5: primary-form selection among a subject's duplicate follow-up forms
  * (reference etl/mci/c3dc_etl.py:811-901).
  *
  * The reference's rule, exactly: if any form reports the subject DEAD,
  * the primary is the EARLIEST dead form (min visit date — the moment of
  * the status change); otherwise the LATEST alive form (max date — most
  * recent confirmation); otherwise the latest form overall. Duplicate
  * forms of any OTHER type that carry mapped fields are a hard error in
  * the reference — surfaced here as a conflicts frame (the engine's
  * warn/error channel design, SURVEY §7.5.6) instead of an abort.
  *
  * One window over the subject key — the same single-shuffle top-1 shape
  * as A4 (latest-survival), so skew and scale behavior are identical.
  */
object FormSelection {

  /** @param status column holding the vital status ('DEAD'/'ALIVE'/other)
    * @param visitDate orderable visit date (integer day offsets in the
    *                  reference's encoding)
    * @param tieBreak deterministic final ordering column (e.g. a form id)
    * @return one primary form row per subject
    */
  def primaryFollowUp(
      forms: DataFrame, subject: Column,
      status: Column, visitDate: Column, tieBreak: Column): DataFrame = {
    val statusNorm = upper(trim(status))
    val prio = when(statusNorm === "DEAD", lit(0))
      .when(statusNorm === "ALIVE", lit(1))
      .otherwise(lit(2))
    // DEAD → earliest (ascending date); ALIVE / other → latest (descending)
    val dateOrd = when(prio === 0, visitDate).otherwise(-visitDate)
    val w = Window.partitionBy(subject).orderBy(prio, dateOrd, tieBreak)
    forms.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate non-primary-eligible forms (reference hard-errors when a
    * form type other than FOLLOW_UP occurs twice for a subject with
    * mapped fields, :949-1022). Empty result = valid.
    */
  def duplicateFormConflicts(
      forms: DataFrame, subject: Column, formType: Column,
      primaryEligibleType: String): DataFrame =
    forms.groupBy(subject.as("subject"), formType.as("form_type"))
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") > 1 && col("form_type") =!= primaryEligibleType)
}
