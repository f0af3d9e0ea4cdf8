package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** A5 value table from the reference's primary-follow-up rule
  * (etl/mci/c3dc_etl.py:811-901): any DEAD → earliest dead; else latest
  * ALIVE; else latest overall; non-FOLLOW_UP duplicates → conflict.
  */
class FormSelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def pick(rows: Seq[(String, String, Int, Long)]): (String, Int, Long) = {
    val df = rows.toDF("upi", "status", "begdt", "form_id")
    val r = FormSelection.primaryFollowUp(
      df, col("upi"), col("status"), col("begdt"), col("form_id"))
      .select("status", "begdt", "form_id").as[(String, Int, Long)].collect()
    assert(r.length == 1)
    r.head
  }

  test("any DEAD wins with the EARLIEST visit date") {
    assert(pick(Seq(
      ("u", "ALIVE", 300, 1L), ("u", "DEAD", 200, 2L), ("u", "DEAD", 100, 3L)))
      == ("DEAD", 100, 3L))
  }

  test("no DEAD: latest ALIVE wins") {
    assert(pick(Seq(
      ("u", "ALIVE", 100, 1L), ("u", "alive", 300, 2L), ("u", "UNKNOWN", 400, 3L)))
      == ("alive", 300, 2L))
  }

  test("neither DEAD nor ALIVE: latest overall wins") {
    assert(pick(Seq(
      ("u", "UNKNOWN", 100, 1L), ("u", "LOST", 250, 2L)))
      == ("LOST", 250, 2L))
  }

  test("status matching is case-insensitive and trimmed") {
    assert(pick(Seq(
      ("u", " dead ", 500, 1L), ("u", "ALIVE", 100, 2L)))
      == (" dead ", 500, 1L))
  }

  test("duplicate non-FOLLOW_UP forms are conflicts; FOLLOW_UP dupes are not") {
    val forms = Seq(
      ("u1", "FOLLOW_UP"), ("u1", "FOLLOW_UP"),
      ("u1", "DEMOGRAPHY"), ("u1", "DEMOGRAPHY"),
      ("u2", "DEMOGRAPHY")).toDF("upi", "form_id")
    val conflicts = FormSelection.duplicateFormConflicts(
      forms, col("upi"), col("form_id"), "FOLLOW_UP")
      .as[(String, String, Long)].collect().toSeq
    assert(conflicts == Seq(("u1", "DEMOGRAPHY", 2L)))
  }
}
