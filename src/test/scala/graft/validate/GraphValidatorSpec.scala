package graft.validate

import graft.SparkTestBase

class GraphValidatorSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicateIds flags ids seen twice") {
    val df = Seq("a", "b", "a", "c").toDF("id")
    val dup = GraphValidator.duplicateIds(df, "id")
      .as[(String, Long)].collect().toSeq
    assert(dup == Seq(("a", 2L)))
  }

  test("orphanObservations finds unresolved back-pointers") {
    val obs = Seq(("s1", "p1"), ("s2", "p9")).toDF("survival_id", "participant.participant_id")
    val part = Seq("p1", "p2").toDF("participant_id")
    val orphans = GraphValidator.orphanObservations(obs, part)
      .select("survival_id").as[String].collect().toSeq
    assert(orphans == Seq("s2"))
  }

  test("singletonViolation fires on zero and on many, not on one") {
    val one = Seq("s").toDF("study_id")
    val two = Seq("s", "t").toDF("study_id")
    assert(GraphValidator.singletonViolation(one, "study").isEmpty)
    val v = GraphValidator.singletonViolation(two, "study")
      .as[(String, Long)].collect().toSeq
    assert(v == Seq(("study", 2L)))
  }

  test("idListMismatch reports both directions") {
    val parent = Seq(Seq("d1", "d2", "d3")).toDF("diagnosis.diagnosis_id")
    val child = Seq("d1", "d2", "d4").toDF("diagnosis_id")
    val (listedNotActual, actualNotListed) =
      GraphValidator.idListMismatch(parent, "diagnosis.diagnosis_id", child, "diagnosis_id")
    assert(listedNotActual.as[String].collect().toSeq == Seq("d3"))
    assert(actualNotListed.as[String].collect().toSeq == Seq("d4"))
  }
}
