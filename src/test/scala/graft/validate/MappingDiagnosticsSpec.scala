package graft.validate

import graft.SparkTestBase
import graft.dsl.TransformationSpec
import graft.model.SchemaLoader

/** Warn-channel semantics: exactly the values the P5 gate nulls are
  * reported, with counts; ungated (macro / wildcard-only) mappings are
  * silent; admitted values never appear.
  */
class MappingDiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = SchemaLoader.fromJson("""
  {"$defs": {"profile": {"type": "object", "properties": {
    "profile_id": {"type": "string"},
    "segment": {"type": "string", "enum": ["Auto", "Other"]},
    "free": {"type": "string"}
  }}}}""")

  private val xform = TransformationSpec.fromJson("""
  {"name": "x", "uuid_seed": "s", "mappings": [
    {"output_field": "profile.profile_id", "source_field": "id"},
    {"output_field": "profile.segment", "source_field": "seg",
     "replacement_values": [
       {"old_value": "AUTOMOBILE", "new_value": "Auto"},
       {"old_value": "+", "new_value": "Other"}]},
    {"output_field": "profile.free", "source_field": "note",
     "replacement_values": [{"old_value": "*", "new_value": "{field:note}"}]}
  ]}""").head

  test("gate rejections report exactly the nulled values with counts") {
    val src = Seq(
      ("P1", "AUTOMOBILE", "a"),
      ("P2", "BUILDING", "b"),   // unlisted → rejected
      ("P3", "building", "c"),   // casefolds to the same rejected value? no — reported as its defaulted source
      ("P4", "BUILDING", "d"))
      .toDF("id", "seg", "note")
    val rej = MappingDiagnostics.gateRejections(schema, xform, src)
      .select("output_field", "value", "occurrences")
      .as[(String, String, Long)].collect().toSet
    // only the gated segment mapping reports; id (no replacements) and the
    // macro mapping are silent; counts keep raw (pre-casefold) values apart
    assert(rej == Set(
      ("profile.segment", "BUILDING", 2L),
      ("profile.segment", "building", 1L)))
  }

  test("nothing gated -> empty frame with the report schema") {
    val noGate = TransformationSpec.fromJson("""
    {"name": "x", "uuid_seed": "s", "mappings": [
      {"output_field": "profile.profile_id", "source_field": "id"}
    ]}""").head
    val rej = MappingDiagnostics.gateRejections(
      schema, noGate, Seq(("P1", "s", "n")).toDF("id", "seg", "note"))
    assert(rej.columns.toSeq ==
      Seq("output_field", "source_field", "value", "occurrences"))
    assert(rej.isEmpty)
  }
}
