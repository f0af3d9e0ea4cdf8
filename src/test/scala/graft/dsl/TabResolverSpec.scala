package graft.dsl

import graft.SparkTestBase
import graft.model.SchemaLoader

/** CCDI-mode tab resolution: per-node tab inference from `tab.field`
  * qualified source names, mapping dequalification, blank-id row drop —
  * against in-memory "workbook" frames (the workbookDir reader itself is
  * covered by SourceReaderSpec).
  */
class TabResolverSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = SchemaLoader.fromJson("""
  {"$defs": {
    "profile": {"type": "object", "required": ["profile_id"], "properties": {
      "profile_id": {"type": "string"},
      "status": {"type": "string"}
    }},
    "visit": {"type": "object", "required": ["visit_id"], "properties": {
      "visit_id": {"type": "string"},
      "score": {"type": "integer"}
    }}
  }}""")

  private val xform = TransformationSpec.fromJson("""
  {"name": "ccdi1", "uuid_seed": "s", "mappings": [
    {"output_field": "profile.profile_id", "source_field": "patient.patient_id"},
    {"output_field": "profile.status", "source_field": "status"},
    {"output_field": "visit.visit_id", "source_field": "encounter.encounter_id"},
    {"output_field": "visit.score", "source_field": "encounter.points"}
  ]}""").head

  private def workbook = Map(
    "patient" -> Seq(("P1", "active"), ("P2", "closed"), ("", "orphan"))
      .toDF("patient_id", "status"),
    "encounter" -> Seq(("E1", "7"), ("", "9")).toDF("encounter_id", "points"))

  test("tab inference picks the qualified tab per node") {
    val tabs = workbook.keySet
    assert(TabResolver.tabForNode(xform, "profile", tabs).contains("patient"))
    assert(TabResolver.tabForNode(xform, "visit", tabs).contains("encounter"))
  }

  test("dequalify strips known-tab prefixes, keeps bare names") {
    val dq = TabResolver.dequalify(xform, "profile", workbook.keySet)
    val srcs = dq.mappingsFor("profile").map(_.sourceField)
    assert(srcs == Seq("patient_id", "status"))
    // other nodes untouched
    assert(dq.mappingsFor("visit").map(_.sourceField) ==
      Seq("encounter.encounter_id", "encounter.points"))
  }

  test("buildNode resolves the tab, drops blank-id rows, builds records") {
    val profiles = TabResolver.buildNode(schema, xform, "profile", workbook)
      .select("profile_id", "status").as[(String, String)].collect().toSet
    assert(profiles == Set(("P1", "active"), ("P2", "closed")))

    val visits = TabResolver.buildNode(schema, xform, "visit", workbook)
      .select("visit_id", "score").as[(String, Long)].collect().toSet
    assert(visits == Set(("E1", 7L)))
  }
}
