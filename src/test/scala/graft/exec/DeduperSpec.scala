package graft.exec

import graft.SparkTestBase

/** A7/K2/K3: cross-file dedup — identical records from different
  * transformations (differing only in generated ids) are suppressed
  * (reference etl/target/c3dc_etl.py:1926-2124).
  */
class DeduperSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(ids: Seq[(String, String, String)]) =
    ids.toDF("diagnosis_id", "diagnosis", "participant.participant_id")

  test("identical records with different generated ids dedupe; first transformation wins") {
    val t1 = frame(Seq(("uuid-a", "Neuroblastoma", "P1"), ("uuid-b", "Glioma", "P2")))
    val t2 = frame(Seq(("uuid-c", "Neuroblastoma", "P1"), ("uuid-d", "Astrocytoma", "P3")))
    val (deduped, report) = Deduper.dedupe(
      "diagnosis",
      Seq(("xform1", 0, t1), ("xform2", 1, t2)),
      Some("participant.participant_id"))
    val rows = deduped.orderBy("diagnosis").collect()
    assert(rows.length == 3)
    // the survivor of the duplicate pair is xform1's record
    val nb = rows.find(_.getAs[String]("diagnosis") == "Neuroblastoma").get
    assert(nb.getAs[String]("diagnosis_id") == "uuid-a")
    val rep = report.collect()
    assert(rep.length == 1)
    assert(rep(0).getAs[Long]("occurrences") == 2)
    assert(rep(0).getAs[scala.collection.Seq[String]]("transformations") ==
      Seq("xform1", "xform2"))
  }

  test("same content for different participants is NOT deduped") {
    val t1 = frame(Seq(("u1", "Glioma", "P1"), ("u2", "Glioma", "P2")))
    val (deduped, report) = Deduper.dedupe(
      "diagnosis", Seq(("x", 0, t1)), Some("participant.participant_id"))
    assert(deduped.count() == 2)
    assert(report.isEmpty)
  }
}
