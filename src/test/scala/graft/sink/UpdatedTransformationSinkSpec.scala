package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.dsl.{Mapping, Replacement, ReplacementValue, Transformation, TransformationSpec}
import graft.sink.UpdatedTransformationSink.RefFile

/** K6: transformation write-back round-trips through the reference's JSON
  * shape, and reference-file mapping synthesis numbers new type groups
  * after the existing ones.
  */
class UpdatedTransformationSinkSpec extends AnyFunSuite {

  private val t = Transformation(
    name = "phs_test",
    uuidSeed = "seed-1",
    mappings = Seq(
      Mapping("participant.participant_id", "Subject ID", "*",
        None, Seq(Replacement("*", ReplacementValue.Scalar("{uuid}")))),
      Mapping("participant.race", "Race", "*",
        Some(ReplacementValue.Arr(Seq("Not Reported"))),
        Seq(Replacement("+", ReplacementValue.Scalar("{race}")))),
      Mapping("reference_file.file_name", "[string_literal]", "2",
        None, Seq(Replacement("*", ReplacementValue.Scalar("old.json"))))))

  test("toJson -> fromJson round-trips the transformation exactly") {
    val back = TransformationSpec.fromJson(UpdatedTransformationSink.toJson(Seq(t)))
    assert(back == Seq(t))
  }

  test("appendReferenceFiles adds one group per file after the max index") {
    val out = UpdatedTransformationSink.appendReferenceFiles(
      t, Seq(
        RefFile("SUBJ1.json", "d41d8cd98f00b204e9800998ecf8427e", 123L, "s3://b/SUBJ1.json"),
        RefFile("SUBJ2.json", "900150983cd24fb0d6963f7d28e17f72", 456L, "s3://b/SUBJ2.json")))
    val added = out.mappings.drop(t.mappings.size)
    assert(added.size == 14)
    assert(added.map(_.typeGroupIndex).distinct == Seq("3", "4"))
    assert(added.forall(_.nodeType == "reference_file"))
    val sizes = added.filter(_.property == "file_size")
      .map(_.replacements.head.newValue)
    assert(sizes == Seq(ReplacementValue.Scalar("123"), ReplacementValue.Scalar("456")))
    // still serializable + parseable
    val back = TransformationSpec.fromJson(UpdatedTransformationSink.toJson(Seq(out)))
    assert(back == Seq(out))
  }
}
