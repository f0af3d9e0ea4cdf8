package graft.validate

import graft.SparkTestBase
import graft.model.SchemaLoader

/** Golden text for the reference-style validator log lines (the opt-in
  * log-diff parity layer): each common violation type renders the exact
  * jsonschema Draft-2020-12 message idiom the reference logs via
  * `{json_path}: {message}` (c3dc_etl.py:625-628).
  */
class ReferenceMessagesSpec extends SparkTestBase {
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

  private def lines(rows: Seq[(String, String, java.lang.Long, Seq[String])]) =
    ReferenceMessages.forNode(schema, "profile",
      rows.toDF("profile_id", "segment", "age", "tags"))

  test("scalar enum violation: python repr of value and domain list") {
    assert(lines(Seq(("P1", "Unknown", 30L, Seq("x")))) ==
      Seq("$.profiles[0].segment: 'Unknown' is not one of ['Auto', 'Other']"))
  }

  test("required: record-level path, quoted property") {
    assert(lines(Seq(("", "Auto", 30L, Seq("x")))) ==
      Seq("$.profiles[0]: 'profile_id' is a required property"))
  }

  test("array enum: one line per offending element with its index") {
    assert(lines(Seq(("P1", "Auto", 30L, Seq("x", "bad", "y", "worse")))) ==
      Seq(
        "$.profiles[0].tags[1]: 'bad' is not one of ['x', 'y', 'z']",
        "$.profiles[0].tags[3]: 'worse' is not one of ['x', 'y', 'z']"))
  }

  test("integer bounds: bare numeric repr, jsonschema phrasing") {
    assert(lines(Seq(("P1", "Auto", -5L, Seq("x")))) ==
      Seq("$.profiles[0].age: -5 is less than the minimum of 0"))
    assert(lines(Seq(("P1", "Auto", 101L, Seq("x")))) ==
      Seq("$.profiles[0].age: 101 is greater than the maximum of 100"))
  }

  test("uniqueItems: python list repr") {
    assert(lines(Seq(("P1", "Auto", 30L, Seq("x", "x")))) ==
      Seq("$.profiles[0].tags: ['x', 'x'] has non-unique elements"))
  }

  test("unknown property: additionalProperties message at the record") {
    val df = Seq(("P1", "Auto", 30L, Seq("x"), "oops"))
      .toDF("profile_id", "segment", "age", "tags", "extra")
    assert(ReferenceMessages.forNode(schema, "profile", df) ==
      Seq("$.profiles[0]: Additional properties are not allowed ('extra' was unexpected)"))
  }

  test("multi-record: document array indexes, record-major ordering") {
    val got = lines(Seq(
      ("P1", "Auto", 30L, Seq("x")),     // clean
      ("P2", "NOPE", 101L, Seq("x")),    // two violations, spec prop order
      ("P3", "Auto", 30L, Seq("bad"))))
    assert(got == Seq(
      "$.profiles[1].segment: 'NOPE' is not one of ['Auto', 'Other']",
      "$.profiles[1].age: 101 is greater than the maximum of 100",
      "$.profiles[2].tags[0]: 'bad' is not one of ['x', 'y', 'z']"))
  }

  test("undefined node container: root additionalProperties line") {
    val got = ReferenceMessages.forDocument(schema,
      Map("mystery" -> Seq("A").toDF("mystery_id")))
    assert(got ==
      Seq("$: Additional properties are not allowed ('mysteries' was unexpected)"))
  }

  test("pyRepr: embedded quotes follow python's quote preference") {
    assert(ReferenceMessages.pyRepr("plain") == "'plain'")
    assert(ReferenceMessages.pyRepr("it's") == "\"it's\"")
    assert(ReferenceMessages.pyRepr("say \"hi\"") == "'say \"hi\"'")
    assert(ReferenceMessages.pyRepr("both'\"") == "'both\\'\"'")
  }
}
