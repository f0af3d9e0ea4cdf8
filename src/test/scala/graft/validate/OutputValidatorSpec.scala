package graft.validate

import graft.SparkTestBase
import graft.model.SchemaLoader

/** C2 violation types, each asserted directly: required blanks (scalar and
  * array forms), enum domain (scalar and array element), integer bounds
  * both directions, uniqueItems — and that VALID rows produce nothing.
  */
class OutputValidatorSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = SchemaLoader.fromJson("""
  {"$defs": {"profile": {"type": "object",
    "required": ["profile_id", "tags"],
    "properties": {
      "profile_id": {"type": "string"},
      "segment": {"type": "string", "enum": ["Auto", "Other"]},
      "age": {"type": "integer", "minimum": 0, "maximum": 100},
      "tags": {"type": "array",
        "items": {"type": "string", "enum": ["x", "y", "z"]},
        "uniqueItems": true}
    }}}}""")

  private def violations(rows: Seq[(String, String, java.lang.Long, Seq[String])]) =
    OutputValidator.validateNode(schema, "profile",
      rows.toDF("profile_id", "segment", "age", "tags"))
      .select("record_id", "property", "violation")
      .as[(String, String, String)].collect().toSet

  test("valid rows produce no violations") {
    assert(violations(Seq(("P1", "Auto", 30L, Seq("x", "y")))).isEmpty)
  }

  test("required: blank scalar id and empty/blank array both fire") {
    assert(violations(Seq(("", "Auto", 1L, Seq("x")))) ==
      Set(("", "profile_id", "required property blank")))
    assert(violations(Seq(("P1", "Auto", 1L, Seq.empty[String]))) ==
      Set(("P1", "tags", "required property blank")))
    // [""] is blank for the required rule AND out of the enum domain —
    // both fire, like a jsonschema validator would report both
    assert(violations(Seq(("P1", "Auto", 1L, Seq("")))) ==
      Set(("P1", "tags", "required property blank"),
        ("P1", "tags", "value not in enum domain")))
  }

  test("enum: scalar out-of-domain and array element out-of-domain fire") {
    assert(violations(Seq(("P1", "NOPE", 1L, Seq("x")))) ==
      Set(("P1", "segment", "value not in enum domain")))
    assert(violations(Seq(("P1", "Auto", 1L, Seq("x", "bad")))) ==
      Set(("P1", "tags", "value not in enum domain")))
  }

  test("integer bounds fire in both directions; boundary values pass") {
    assert(violations(Seq(("P1", "Auto", -1L, Seq("x")))) ==
      Set(("P1", "age", "below minimum 0")))
    assert(violations(Seq(("P1", "Auto", 101L, Seq("x")))) ==
      Set(("P1", "age", "above maximum 100")))
    assert(violations(Seq(("P1", "Auto", 0L, Seq("x")))).isEmpty)
    assert(violations(Seq(("P1", "Auto", 100L, Seq("x")))).isEmpty)
  }

  test("uniqueItems fires on duplicate array elements") {
    assert(violations(Seq(("P1", "Auto", 1L, Seq("x", "x")))) ==
      Set(("P1", "tags", "array items not unique")))
  }

  test("one bad record can carry several violations at once") {
    val v = violations(Seq(("", "NOPE", 200L, Seq("x", "x"))))
    assert(v == Set(
      ("", "profile_id", "required property blank"),
      ("", "segment", "value not in enum domain"),
      ("", "age", "above maximum 100"),
      ("", "tags", "array items not unique")))
  }

  test("null scalar values are absent, not violations (warn-don't-fail)") {
    assert(violations(Seq(("P1", null, null, Seq("x")))).isEmpty)
  }

  test("unknown property: undeclared column flags every record (additionalProperties false)") {
    val v = OutputValidator.validateNode(schema, "profile",
      Seq(("P1", "stale"), ("P2", "stale")).toDF("profile_id", "mystery"))
      .select("record_id", "property", "violation")
      .as[(String, String, String)].collect().toSet
    assert(v == Set(
      ("P1", "mystery", "property not permitted by schema"),
      ("P2", "mystery", "property not permitted by schema")))
    // provenance/audit passthrough columns are exempt
    val clean = OutputValidator.validateNode(schema, "profile",
      Seq(("P1", "f.csv")).toDF("profile_id", graft.sources.SourceReader.FileCol))
    assert(clean.count() == 0)
  }

  test("container shape: unknown node container and missing id column flag") {
    val good = Seq(Tuple1("P1")).toDF("profile_id")
    val headless = Seq(Tuple1("x")).toDF("segment")
    val v = OutputValidator.validateContainers(schema,
      Map("profile" -> good, "mystery_node" -> good, "broken" -> headless))
      .select("node", "property", "violation")
      .as[(String, String, String)].collect().toSet
    assert(v == Set(
      ("mystery_node", null, "node container not defined by schema"),
      ("broken", null, "node container not defined by schema")))
    val v2 = OutputValidator.validateContainers(schema, Map("profile" -> headless))
      .select("node", "property", "violation")
      .as[(String, String, String)].collect().toSet
    assert(v2 == Set(("profile", "profile_id", "container missing identifier property")))
    // validateAll surfaces container violations alongside record ones
    val all = OutputValidator.validateAll(schema,
      Map("profile" -> good, "mystery_node" -> good))
    assert(all.filter($"violation" === "node container not defined by schema").count() == 1)
  }
}
