package graft.dsl

import graft.SparkTestBase
import graft.model.SchemaLoader
import MappingUnpivoter.SheetRow

/** V3 unpivoter semantics (mapping_unpivoter.py:221-305,463-500): rows
  * merge per (output_field, tgi) appending replacements in sheet order,
  * single source field and consistent defaults enforced, target vars
  * validated against the schema, JSON round-trips through the loader.
  */
class MappingUnpivoterSpec extends SparkTestBase {

  private val schema = SchemaLoader.fromJson("""
  {"$defs": {
    "profile": {"type": "object", "required": ["profile_id"], "properties": {
      "profile_id": {"type": "string"},
      "segment": {"type": "string", "enum": ["Auto", "Other"]}
    }}
  }}""")

  test("rows merge per (field, tgi) appending replacement pairs in order") {
    val rows = Seq(
      SheetRow("profile.profile_id", sourceVariable = "id"),
      SheetRow("profile.segment", sourceVariable = "seg",
        sourcePvTerm = "AUTOMOBILE", targetPvTerm = "Auto"),
      SheetRow("profile.segment", sourceVariable = "seg",
        replacementValuesJson = """[{"old_value": "+", "new_value": "Other"}]"""))
    val ms = MappingUnpivoter.unpivot(rows, schema)
    assert(ms.map(_.outputField) == Seq("profile.profile_id", "profile.segment"))
    val seg = ms(1)
    assert(seg.sourceField == "seg")
    assert(seg.replacements == Seq(
      Replacement("AUTOMOBILE", ReplacementValue.Scalar("Auto")),
      Replacement("+", ReplacementValue.Scalar("Other"))))
  }

  test("conflicting source fields or defaults are rejected") {
    intercept[IllegalArgumentException] {
      MappingUnpivoter.unpivot(Seq(
        SheetRow("profile.segment", sourceVariable = "a"),
        SheetRow("profile.segment", sourceVariable = "b")), schema)
    }
    intercept[IllegalArgumentException] {
      MappingUnpivoter.unpivot(Seq(
        SheetRow("profile.segment", sourceVariable = "a", defaultValue = "x"),
        SheetRow("profile.segment", sourceVariable = "a", defaultValue = "y")), schema)
    }
  }

  test("unknown target variables are rejected against the schema") {
    intercept[IllegalArgumentException] {
      MappingUnpivoter.unpivot(Seq(SheetRow("profile.nope", "s")), schema)
    }
    intercept[IllegalArgumentException] {
      MappingUnpivoter.unpivot(Seq(SheetRow("noprefix", "s")), schema)
    }
  }

  test("generated JSON round-trips through TransformationSpec") {
    val rows = Seq(
      SheetRow("profile.profile_id", sourceVariable = "id"),
      SheetRow("profile.segment", sourceVariable = "seg", defaultValue = "Other",
        typeGroupIndex = "1",
        replacementValuesJson =
          """[{"old_value": "AUTOMOBILE", "new_value": "Auto"}]"""))
    val ms = MappingUnpivoter.unpivot(rows, schema)
    val json = MappingUnpivoter.toTransformationJson("x1", "seed", ms)
    val loaded = TransformationSpec.fromJson(json).head
    assert(loaded.name == "x1" && loaded.uuidSeed == "seed")
    assert(loaded.mappings == ms)
  }
}
