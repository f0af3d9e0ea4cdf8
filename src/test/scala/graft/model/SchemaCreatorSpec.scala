package graft.model

import graft.SparkTestBase

/** Schema-compiler semantics from the reference (schema/schema_creator.py):
  * type mapping, enum/PV handling with section-header filtering, integer
  * bounds, relationship id props for both multiplicities, required
  * collation, pluralization — all round-tripped through SchemaLoader.
  */
class SchemaCreatorSpec extends SparkTestBase {

  private val nodesYaml = """
Nodes:
  participant:
    Props:
      - participant_id
      - race
      - age_at_enrollment
  study:
    Props:
      - study_id
  reference_file:
    Props:
      - reference_file_id
      - file_size
Relationships:
  participant_of_study:
    Mul: many_to_one
    Ends:
      - Src: participant
        Dst: study
  file_of_study:
    Mul: many_to_one
    Ends:
      - Src: reference_file
        Dst: study
"""

  private val propsYaml = """
PropDefinitions:
  participant_id:
    Type: string
    Req: true
  race:
    Type:
      value_type: list
      item_type:
        - '[---- race section ----]'
        - White
        - Asian
  age_at_enrollment:
    Type: integer
  study_id:
    Type: string
    Req: true
  reference_file_id:
    Type: string
    Req: true
  file_size:
    Type: integer
"""

  private lazy val schema = SchemaCreator.create(nodesYaml, propsYaml)

  test("types, enums, and section-header filtering") {
    val race = schema.node("participant").byName("race")
    assert(race.typ == PropType.ArrStr)
    assert(race.enumValues == Seq("White", "Asian")) // header entry dropped
  }

  test("integer bounds: age max 54750; file_size min 0 (reference misspells the key)") {
    val age = schema.node("participant").byName("age_at_enrollment")
    assert(age.maximum.contains(54750L))
    val size = schema.node("reference_file").byName("file_size")
    assert(size.minimum.contains(0L))
  }

  test("relationships become id props with the right multiplicity on both ends") {
    // many participants to one study: participant holds a to-one string,
    // study holds a to-many array
    val p = schema.node("participant").byName("study.study_id")
    assert(p.typ == PropType.Str)
    val s = schema.node("study").byName("participant.participant_id")
    assert(s.typ == PropType.ArrStr)
  }

  test("required props collate from Req flags") {
    assert(schema.node("participant").requiredProps == Seq("participant_id"))
    assert(schema.node("reference_file").requiredProps == Seq("reference_file_id"))
  }

  test("pluralization: y->ies, sis->ses, else +s") {
    assert(SchemaCreator.pluralize("study") == "studies")
    assert(SchemaCreator.pluralize("diagnosis") == "diagnoses")
    assert(SchemaCreator.pluralize("participant") == "participants")
  }

  test("non-ascii permissible values are rejected") {
    val bad = propsYaml.replace("- Asian", "- Asián")
    intercept[IllegalArgumentException] {
      SchemaCreator.create(nodesYaml, bad)
    }
  }
}
