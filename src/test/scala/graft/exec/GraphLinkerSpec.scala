package graft.exec

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class GraphLinkerSpec extends SparkTestBase {
  import spark.implicits._

  test("observation rollups: sorted id lists, childless parents get empty lists") {
    val part = Seq("P1", "P2").toDF("participant_id")
    val surv = Seq(("S2", "P1"), ("S1", "P1"))
      .toDF("survival_id", "participant.participant_id")
    val diag = Seq(("D1", "P1")).toDF("diagnosis_id", "participant.participant_id")
    val linked = GraphLinker.linkObservationsToParticipant(
      part, Map("survival" -> surv, "diagnosis" -> diag))
      .orderBy("participant_id")
      .select(col("participant_id"), col("`survival.survival_id`"), col("`diagnosis.diagnosis_id`"))
      .as[(String, Seq[String], Seq[String])].collect().toSeq
    assert(linked == Seq(
      ("P1", Seq("S1", "S2"), Seq("D1")), // sorted, not arrival order
      ("P2", Seq.empty, Seq.empty)))      // childless → empty list, kept
  }

  test("rollupChildren aggregates arbitrary child frames with broadcast") {
    val study = Seq("ST1").toDF("study_id")
    val cg = Seq(("CG1", "ST1"), ("CG2", "ST1"))
      .toDF("consent_group_id", "study.study_id")
    val out = GraphLinker.rollupChildren(
      study, "study_id", cg, "study.study_id", "consent_group_id",
      "consent_group.consent_group_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
    assert(out.select(col("`consent_group.consent_group_id`"))
      .as[Seq[String]].collect().head == Seq("CG1", "CG2"))
  }
}
