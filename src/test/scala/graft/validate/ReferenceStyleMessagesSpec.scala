package graft.validate

import graft.SparkTestBase
import graft.model.{C3dcSchema, NodeSpec, PropSpec, PropType}

/** Golden-text parity with the reference's validation log lines
  * (etl/target/c3dc_etl.py:627): the expected strings below were generated
  * by running python-jsonschema 4.26 `Draft202012Validator.iter_errors`
  * over the EXACT document this fixture's frames render to (all columns
  * kept, nulls included, record order = id ASC NULLS FIRST) and formatting
  * each error as `json_path: message`. The Scala formatter must reproduce
  * them byte-for-byte (compared as sorted sets — iter_errors' keyword
  * iteration order is an implementation detail).
  */
class ReferenceStyleMessagesSpec extends SparkTestBase {

  private val schema = C3dcSchema(Map(
    "participant" -> NodeSpec("participant", Seq(
      PropSpec("participant_id", PropType.Str, required = true),
      PropSpec("sex_at_birth", PropType.Str,
        enumValues = Seq("Male", "Female", "Not Reported"), required = true),
      PropSpec("race", PropType.ArrStr, enumValues = Seq("White", "Asian")),
      PropSpec("age_at_enrollment", PropType.Int,
        minimum = Some(0L), maximum = Some(54750L)))),
    "study" -> NodeSpec("study", Seq(
      PropSpec("study_id", PropType.Str, required = true),
      PropSpec("study_name", PropType.Str, required = true)))))

  private val golden = Seq(
    "$.participants[0].age_at_enrollment: 99999 is greater than the maximum of 54750",
    "$.participants[0].participant_id: None is not of type 'string'",
    "$.participants[0].race[1]: 'Orange' is not one of ['White', 'Asian']",
    "$.participants[0].sex_at_birth: None is not of type 'string'",
    "$.participants[0].sex_at_birth: None is not one of ['Male', 'Female', 'Not Reported']",
    "$.participants[0]: Additional properties are not allowed ('extra_col' was unexpected)",
    "$.participants[1]: Additional properties are not allowed ('extra_col' was unexpected)",
    "$.participants[2].age_at_enrollment: -3 is less than the minimum of 0",
    "$.participants[2].race: ['White', 'White'] has non-unique elements",
    "$.participants[2].sex_at_birth: 'Banana' is not one of ['Male', 'Female', 'Not Reported']",
    "$.participants[2]: Additional properties are not allowed ('extra_col' was unexpected)",
    "$.participants[3].age_at_enrollment: None is not of type 'integer'",
    "$.participants[3].race: None is not of type 'array'",
    "$.participants[3]: Additional properties are not allowed ('extra_col' was unexpected)",
    "$.studies[0]: 'study_name' is a required property",
    "$.studies[0]: Additional properties are not allowed ('who_knows' was unexpected)",
    "$: Additional properties are not allowed ('bogus_nodes' was unexpected)").sorted

  test("formatter reproduces python-jsonschema's log lines byte-for-byte") {
    import spark.implicits._
    val participants = Seq(
      (Option.empty[String], Option.empty[String], Option(Seq("White", "Orange")), Option(99999L), "e0"),
      (Option("P1"), Option("Male"), Option(Seq("White")), Option(10L), "e1"),
      (Option("P2"), Option("Banana"), Option(Seq("White", "White")), Option(-3L), "e2"),
      (Option("P4"), Option("Female"), Option.empty[Seq[String]], Option.empty[Long], "e3"))
      .toDF("participant_id", "sex_at_birth", "race", "age_at_enrollment", "extra_col")
    val studies = Seq(("S1", "x")).toDF("study_id", "who_knows")
    val bogus = Seq(Tuple1("b")).toDF("bogus_node_id")

    val lines = ReferenceStyleMessages
      .render(schema, Map("participant" -> participants, "study" -> studies,
        "bogus_node" -> bogus))
      .as[String].collect().sorted.toSeq
    assert(lines == golden)
  }

  test("a clean node emits zero lines") {
    import spark.implicits._
    val ok = Seq(("P9", "Male", Seq("Asian"), 12L))
      .toDF("participant_id", "sex_at_birth", "race", "age_at_enrollment")
    assert(ReferenceStyleMessages.nodeLines(schema, "participant", ok).count() == 0)
  }

  test("python string repr: quote choice and escapes match repr()") {
    import spark.implicits._
    // repr("it's") = "it's" (double quotes); repr("a\"b") = 'a"b';
    // repr("a'b\"c") = 'a\'b"c'; repr("x\\y\n") = 'x\\y\n'
    val df = Seq(
      ("i1", "it's"), ("i2", "a\"b"), ("i3", "a'b\"c"), ("i4", "x\\y\n"))
      .toDF("participant_id", "sex_at_birth")
    val lines = ReferenceStyleMessages.nodeLines(schema, "participant", df)
      .as[String].collect().sorted.toSeq
    val expectReprs = Seq("\"it's\"", "'a\"b'", "'a\\'b\"c'", "'x\\\\y\\n'")
    val got = lines.filter(_.contains("is not one of"))
    assert(got.size == 4)
    expectReprs.foreach { r =>
      assert(got.exists(_.contains(r + " is not one of")), s"missing repr $r in $got")
    }
  }
}
