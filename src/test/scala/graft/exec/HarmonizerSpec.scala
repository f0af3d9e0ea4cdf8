package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dsl.TransformationSpec
import graft.model.SchemaLoader
import graft.sink.HarmonizedJsonSink
import graft.validate.{GraphValidator, OutputValidator}

/** SURVEY.md §7.3 minimum slice: harmonize a TARGET-style study end-to-end
  * and validate the linked graph + schema conformance.
  */
class HarmonizerSpec extends SparkTestBase {
  import spark.implicits._

  lazy val schema = SchemaLoader.fromJson(fixture("schema.json"))
  lazy val xform = TransformationSpec.fromJson(fixture("target_transformation.json")).head
  lazy val harmonizer = new Harmonizer(schema, xform)

  private def source = Seq(
    ("TARGET-30-PAAAAA", "Female", "White;Other", "Not Hispanic or Latino", "3661", "1200", "Alive", "C74.9", 1L),
    ("TARGET-30-PABBBB", "Male", "Unknown", "Hispanic or Latino", "250", "", "Dead", "C71.9", 2L)
  ).toDF("TARGET USI", "Gender", "Race", "Ethnicity", "Age at Diagnosis in Days",
    "Overall Survival Time in Days", "Vital Status", "ICDO", "source_file_row_num")

  lazy val nodes = harmonizer.harmonize(source, col("source_file_row_num"))

  test("harmonize produces all mapped node types with linked graph") {
    assert(nodes.keySet == Set("participant", "survival", "diagnosis", "study",
      "reference_file"))
    val part = nodes("participant").orderBy("participant_id").collect()
    assert(part.length == 2)
    // A1: observation rollups materialized
    assert(part(0).getAs[scala.collection.Seq[String]]("survival.survival_id").length == 1)
    assert(part(0).getAs[scala.collection.Seq[String]]("diagnosis.diagnosis_id").length == 1)
    val study = nodes("study").collect()
    assert(study.length == 1)
    assert(study(0).getAs[scala.collection.Seq[String]]("reference_file.reference_file_id").length == 2)
  }

  test("A2: no duplicate ids in any node") {
    nodes.foreach { case (n, df) =>
      assert(GraphValidator.duplicateIds(df, graft.model.NodeType.idProperty(n)).isEmpty,
        s"duplicate ids in $n")
    }
  }

  test("C3: observation back-pointers resolve") {
    assert(GraphValidator.orphanObservations(nodes("survival"), nodes("participant")).isEmpty)
    assert(GraphValidator.orphanObservations(nodes("diagnosis"), nodes("participant")).isEmpty)
    val (missing, extra) = GraphValidator.idListMismatch(
      nodes("participant"), "survival.survival_id", nodes("survival"), "survival_id")
    assert(missing.isEmpty && extra.isEmpty)
  }

  test("C2: harmonized output passes schema validation") {
    val violations = OutputValidator.validateAll(schema, nodes)
    assert(violations.isEmpty, violations.collect().mkString("\n"))
  }

  test("C2 detects violations on corrupted data") {
    val bad = nodes("survival")
      .withColumn("last_known_survival_status", lit("Zombie"))
      .withColumn("age_at_last_known_survival_status", lit(99999L))
    val v = OutputValidator.validateNode(schema, "survival", bad).collect()
    assert(v.exists(_.getAs[String]("violation") == "value not in enum domain"))
    assert(v.exists(_.getAs[String]("violation").startsWith("above maximum")))
  }

  test("K1: document sink emits pluralized node arrays") {
    val doc = HarmonizedJsonSink.document(nodes)
    assert(doc.contains("\"participants\": ["))
    assert(doc.contains("\"studies\": ["))
    assert(doc.contains("\"reference_files\": ["))
    assert(doc.contains("\"survivals\": ["))
    // nulls serialized, arrays sorted, ids deterministic
    assert(doc.contains("TARGET-30-PAAAAA"))
  }

  test("reference row-skip: a row whose participant build yields != 1 record " +
      "contributes no observations (c3dc_etl.py:1549-1558)") {
    // row 3's participant id is blank → participant build yields 0 records
    // → the reference EXCLUDES the row whole; its survival record (whose
    // own {uuid} id would otherwise survive the required filter) must not
    // emit as an orphan
    val withBlank = source.unionByName(Seq(
      ("", "Male", "White", "Not Hispanic or Latino", "100", "200", "Alive", "C71.9", 3L)
    ).toDF("TARGET USI", "Gender", "Race", "Ethnicity", "Age at Diagnosis in Days",
      "Overall Survival Time in Days", "Vital Status", "ICDO", "source_file_row_num"))
    val built = harmonizer.harmonize(withBlank, col("source_file_row_num"))
    assert(built("participant").count() == 2)
    assert(built("survival").count() == 2,
      "blank-participant row must contribute no survival record")
    assert(GraphValidator.orphanObservations(
      built("survival"), built("participant")).isEmpty)
  }

  test("P9: multi-valued enum source explodes into sub-source records") {
    // first_event isn't enum in fixture schema; use diagnosis with two codes
    val src = Seq(("T-1", "C71.9;C74.9", 1L))
      .toDF("TARGET USI", "ICDO", "source_file_row_num")
    val exploded = SubSourceExploder.explode(src, "ICDO", "TARGET USI")
    val rows = exploded.orderBy("ICDO").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("TARGET USI")).toSeq == Seq("T-1_1", "T-1_2"))
    assert(rows.map(_.getAs[String]("ICDO")).toSeq == Seq("C71.9", "C74.9"))
    // single-valued rows pass through with original id
    val single = SubSourceExploder.explode(
      Seq(("T-2", "C71.9", 1L)).toDF("TARGET USI", "ICDO", "source_file_row_num"),
      "ICDO", "TARGET USI").collect()
    assert(single.length == 1 && single(0).getAs[String]("TARGET USI") == "T-2")
  }
}
