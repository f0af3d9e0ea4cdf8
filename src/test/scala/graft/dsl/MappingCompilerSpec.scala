package graft.dsl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.SchemaLoader

/** Semantics tables lifted from the reference's (skipped) unit tests
  * (etl/target/test/test_c3dc_etl.py:94-191) plus macro value tables.
  */
class MappingCompilerSpec extends SparkTestBase {
  import spark.implicits._

  lazy val schema = SchemaLoader.fromJson(fixture("schema.json"))
  lazy val xform = TransformationSpec.fromJson(fixture("target_transformation.json")).head
  lazy val compiler = new MappingCompiler(schema)

  private def ctx = CompileCtx("seed", "participant", "0", lit("rk"), 0)

  private def evalOne(m: Mapping, cols: Map[String, String]): Any = {
    val df = Seq(1).toDF("__one")
    val withCols = cols.foldLeft(df) { case (d, (k, v)) =>
      d.withColumn(k, if (v == null) lit(null).cast("string") else lit(v))
    }
    withCols.select(compiler.compile(m, ctx).as("v")).head.get(0)
  }

  test("P1 literal replacement: casefolded trimmed equality, first match wins") {
    val m = xform.mappings.find(_.outputField == "participant.sex_at_birth").get
    assert(evalOne(m, Map("Gender" -> " MALE ")) == "Male")
    assert(evalOne(m, Map("Gender" -> "female")) == "Female")
    // unlisted value: allowed-value gate skips the field even though '*'
    // would match (reference etl/target/c3dc_etl.py:1313-1322)
    assert(evalOne(m, Map("Gender" -> "x")) == null)
    // blank source: default substitutes, is enum-allowed, '*' catch-all fires
    assert(evalOne(m, Map("Gender" -> null)) == "Not Reported")
  }

  test("'+' wildcard matches only nonblank; gating still applies to unlisted values") {
    val m = xform.mappings.find(_.outputField == "survival.last_known_survival_status").get
    assert(evalOne(m, Map("Vital Status" -> "ALIVE")) == "Alive")
    // value not among literal old_values (or enum default) → field skipped
    // even though '+' would match (reference etl/target/c3dc_etl.py:1313-1322)
    assert(evalOne(m, Map("Vital Status" -> "lost to follow-up")) == null)
    // blank: no entry matches; fallback converts the default, canonicalized
    assert(evalOne(m, Map("Vital Status" -> "")) == "Not Reported")
    assert(evalOne(m, Map("Vital Status" -> null)) == "Not Reported")
  }

  test("F3 {sum}: blank addend → default; non-numeric → default; else sum") {
    val m = xform.mappings
      .find(_.outputField == "survival.age_at_last_known_survival_status").get
    assert(evalOne(m, Map("Age at Diagnosis in Days" -> "3661",
      "Overall Survival Time in Days" -> "1200")) == 4861L)
    assert(evalOne(m, Map("Age at Diagnosis in Days" -> "3661",
      "Overall Survival Time in Days" -> "")) == -999L)
    assert(evalOne(m, Map("Age at Diagnosis in Days" -> "3661",
      "Overall Survival Time in Days" -> "n/a")) == -999L)
    // Excel float noise rounds (python round semantics → bround)
    assert(evalOne(m, Map("Age at Diagnosis in Days" -> "3660.9999999999995",
      "Overall Survival Time in Days" -> "0")) == 3661L)
  }

  test("F5 {race}: ethnicity merge, indeterminate filtering, sort, canonicalization") {
    val m = xform.mappings.find(_.outputField == "participant.race").get
    def races(r: String, e: String): Seq[String] =
      Option(evalOne(m, Map("Race" -> r, "Ethnicity" -> e)))
        .map(_.asInstanceOf[scala.collection.Seq[String]].toSeq).getOrElse(null)
    // determinate ethnicity keeps it and drops indeterminate races
    assert(races("White;Unknown", "Hispanic or Latino") ==
      Seq("Hispanic or Latino", "White"))
    // no (allowed) ethnicity: all races kept, sorted distinct
    assert(races("White;Other;White", "Not Hispanic or Latino") == Seq("Other", "White"))
    assert(races("unknown", null) == Seq("Unknown"))
    // nothing valid → default
    assert(races("", "") == Seq("Not Reported"))
    // invalid race values are dropped with a warning, valid ones survive
    assert(races("White;Martian", "") == Seq("White"))
  }

  test("F6 {find_enum_value}: code lookup with miss fall-through to literal entry") {
    val m = xform.mappings.find(_.outputField == "diagnosis.diagnosis").get
    val dm = m // diagnosis mapping: '+' → find_enum_value, then 0001/0 → 8000/0 PV
    assert(evalOne(dm, Map("ICDO" -> "9380/3")) == "9380/3 : Glioma, malignant")
    // miss falls through to the manual replacement entry
    assert(evalOne(dm, Map("ICDO" -> "0001/0")) == "8000/0 : Neoplasm, benign")
    // blank source: '+' doesn't match, literal doesn't match → null
    assert(evalOne(dm, Map("ICDO" -> "")) == null)
    // unknown code, no fallback match → null
    assert(evalOne(dm, Map("ICDO" -> "1234/9")) == null)
  }

  test("F1 {uuid}: deterministic, distinct per mapping ordinal and row key") {
    val m = Mapping("survival.survival_id", "[string_literal]",
      replacements = Seq(Replacement("*", ReplacementValue.Scalar("{uuid}"))))
    val a = evalOne(m, Map.empty).toString
    val b = evalOne(m, Map.empty).toString
    assert(a == b, "same context → same uuid")
    assert(a.matches("[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}"))
    val c2 = CompileCtx("seed", "participant", "0", lit("rk"), 1)
    val df = Seq(1).toDF("__one")
    val b2 = df.select(compiler.compile(m, c2).as("v")).head.getString(0)
    assert(a != b2, "different mapping ordinal → different uuid")
  }

  test("F2 {field:NAME} splices source column with prefix/suffix") {
    val m = Mapping("participant.participant_id", "TARGET USI",
      replacements = Seq(Replacement("*",
        ReplacementValue.Scalar("{field:TARGET USI}-suffix"))))
    // reference only macro-expands new_values wrapped in braces end-to-end;
    // this one starts '{' and ends 'x' → literal passthrough
    assert(evalOne(m, Map("TARGET USI" -> "T-1")) == "{field:TARGET USI}-suffix")
    val m2 = Mapping("participant.participant_id", "TARGET USI",
      replacements = Seq(Replacement("*", ReplacementValue.Scalar("{field:TARGET USI}"))))
    assert(evalOne(m2, Map("TARGET USI" -> "T-1")) == "T-1")
  }

  test("P2 compound-field ordinal match") {
    val m = Mapping("participant.sex_at_birth", "[A, B]",
      defaultValue = Some(ReplacementValue.Scalar("Not Reported")),
      replacements = Seq(
        Replacement("m;1", ReplacementValue.Scalar("Male")),
        Replacement("f;+", ReplacementValue.Scalar("Female")),
        Replacement("*", ReplacementValue.Scalar("Unknown"))))
    assert(evalOne(m, Map("A" -> "M", "B" -> "1")) == "Male")
    assert(evalOne(m, Map("A" -> "f", "B" -> "anything")) == "Female")
    assert(evalOne(m, Map("A" -> "f", "B" -> "")) == "Unknown")
    assert(evalOne(m, Map("A" -> "x", "B" -> "y")) == "Unknown")
  }

  test("P5 allowed-value gating nulls out unmapped literals") {
    val m = Mapping("participant.sex_at_birth", "Gender",
      replacements = Seq(
        Replacement("male", ReplacementValue.Scalar("Male")),
        Replacement("female", ReplacementValue.Scalar("Female"))))
    assert(evalOne(m, Map("Gender" -> "male")) == "Male")
    // 'other' not in allowed set {male, female} → field skipped → null
    assert(evalOne(m, Map("Gender" -> "other")) == null)
  }

  test("P6 integer conversion: banker's rounding like python round()") {
    val m = Mapping("diagnosis.age_at_diagnosis", "Age",
      replacements = Seq(Replacement("*", ReplacementValue.Scalar("{field:Age}"))))
    assert(evalOne(m, Map("Age" -> "3660.9999999999995")) == 3661L)
    assert(evalOne(m, Map("Age" -> "0.5")) == 0L)
    assert(evalOne(m, Map("Age" -> "1.5")) == 2L)
    assert(evalOne(m, Map("Age" -> "abc")) == null)
  }
}
