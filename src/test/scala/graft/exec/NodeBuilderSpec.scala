package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dsl.TransformationSpec
import graft.model.SchemaLoader

class NodeBuilderSpec extends SparkTestBase {
  import spark.implicits._

  lazy val schema = SchemaLoader.fromJson(fixture("schema.json"))
  lazy val xform = TransformationSpec.fromJson(fixture("target_transformation.json")).head
  lazy val builder = new NodeBuilder(schema, xform)

  private def source = Seq(
    ("TARGET-30-PAAAAA", "Female", "White;Other", "Not Hispanic or Latino", "3661", "1200", "Alive", "C74.9", 1L),
    ("TARGET-30-PABBBB", "Male", "Unknown", "Hispanic or Latino", "250", "", "Dead", "C71.9", 2L),
    ("", "", "", "", "", "", "", "", 3L) // all-blank row (C5)
  ).toDF("TARGET USI", "Gender", "Race", "Ethnicity", "Age at Diagnosis in Days",
    "Overall Survival Time in Days", "Vital Status", "ICDO", "source_file_row_num")

  test("participant node builds with required-field filtering (P7/C5)") {
    val df = builder.build("participant", source, col("source_file_row_num"))
    val rows = df.orderBy("participant_id").collect()
    // blank row dropped: participant_id required and empty
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("participant_id") == "TARGET-30-PAAAAA")
    assert(rows(0).getAs[scala.collection.Seq[String]]("race") == Seq("Other", "White"))
    assert(rows(1).getAs[scala.collection.Seq[String]]("race") == Seq("Hispanic or Latino"))
    assert(rows(0).getAs[String]("sex_at_birth") == "Female")
  }

  test("P8 type groups: one reference_file record per group, uuid distinct per group") {
    val one = Seq(Tuple1(1L)).toDF("source_file_row_num")
    val df = builder.build("reference_file", one, col("source_file_row_num"))
    val rows = df.orderBy("file_name").collect()
    assert(rows.map(_.getAs[String]("file_name")).toSeq == Seq("c3dc_etl.py", "schema.json"))
    // '*' base mapping replicated into both groups
    assert(rows.forall(_.getAs[String]("file_category") == "programmatic source code"))
    // ids differ across groups (groupIndex feeds the uuid)
    assert(rows.map(_.getAs[String]("reference_file_id")).distinct.length == 2)
  }

  test("survival node: sum macro + enum canonicalization end-to-end") {
    val df = builder.build("survival", source, col("source_file_row_num"))
    val byId = df.collect().map(r =>
      r.getAs[String]("participant.participant_id") ->
        r.getAs[Any]("age_at_last_known_survival_status")).toMap
    assert(byId("TARGET-30-PAAAAA") == 4861L)
    assert(byId("TARGET-30-PABBBB") == -999L) // blank addend → default
  }

  test("deterministic ids: rebuilding yields identical uuids") {
    val a = builder.build("survival", source, col("source_file_row_num"))
      .select("survival_id").orderBy("survival_id").collect().map(_.getString(0))
    val b = builder.build("survival", source, col("source_file_row_num"))
      .select("survival_id").orderBy("survival_id").collect().map(_.getString(0))
    assert(a.sameElements(b))
    assert(a.distinct.length == a.length)
  }
}
