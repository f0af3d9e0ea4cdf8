package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** S5/S6 semantics: mapped-field pruning, FORM.FIELD qualification,
  * first-value-wins in document order — against real JSON document files
  * read through SourceReader.jsonDocs, plus the MCI-mode end-to-end run.
  */
class FormFlattenerSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(): String = {
    val dir = Files.createTempDirectory("graft_docs")
    Files.writeString(dir.resolve("u1.json"), """
      {"upi": "u1", "forms": [
        {"form_id": "DEMOGRAPHY", "data": [
          {"form_field_id": "DM_SEX", "value": "F"},
          {"form_field_id": "DM_SEX", "value": "LATER-IGNORED"},
          {"form_field_id": "STATUS", "value": "demography-status"}]},
        {"form_id": "FOLLOW_UP", "data": [
          {"form_field_id": "STATUS", "value": "followup-status"},
          {"form_field_id": "PT_AGE", "value": "12"}]}
      ]}""")
    Files.writeString(dir.resolve("u2.json"), """
      {"upi": "u2", "forms": [
        {"form_id": "FOLLOW_UP", "data": [
          {"form_field_id": "PT_AGE", "value": "9"}]}
      ]}""")
    dir.toString
  }

  test("flatten: pruned fields, qualified form wins its form, first value wins") {
    val docs = SourceReader.jsonDocs(spark, writeDocs(), FormFlattener.DocSchema)
    val wide = FormFlattener.flatten(docs,
      Seq("DM_SEX", "FOLLOW_UP.STATUS", "STATUS", "PT_AGE"))
      .orderBy("upi")
      .select($"upi", $"DM_SEX", $"`FOLLOW_UP.STATUS`", $"STATUS", $"PT_AGE")
      .as[(String, String, String, String, String)].collect().toSeq
    assert(wide == Seq(
      // DM_SEX first value wins; qualified STATUS reads only FOLLOW_UP;
      // bare STATUS takes the document-order first (DEMOGRAPHY's)
      ("u1", "F", "followup-status", "demography-status", "12"),
      ("u2", null, null, null, "9")))
  }

  test("MCI-mode EtlRunner run over a document directory") {
    import graft.engine.EtlRunner
    val docsDir = writeDocs()
    val dir = Files.createTempDirectory("graft_mci")
    def write(name: String, content: String): String = {
      val p = dir.resolve(name); Files.writeString(p, content); p.toString
    }
    val schemaPath = write("schema.json", """
      {"$defs": {"participant": {"type": "object",
        "required": ["participant_id"],
        "properties": {
          "participant_id": {"type": "string"},
          "age": {"type": "integer"}}}}}""")
    val xformPath = write("transformations.json", """
      {"name": "mci1", "uuid_seed": "s", "mappings": [
        {"output_field": "participant.participant_id", "source_field": "upi"},
        {"output_field": "participant.age", "source_field": "PT_AGE"}
      ]}""")
    val out = dir.resolve("out").toString
    val result = EtlRunner.run(spark, EtlRunner.Config(
      schemaPath, xformPath, docsDir, rowKeyColumn = "upi", outDir = out,
      sourceFormat = "jsondocs"))
    assert(result.recordCounts(("mci1", "participant")) == 2)
    assert(result.violations == 0)
    val doc = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(java.nio.file.Paths.get(s"$out/mci1.harmonized.json")))
    val ages = doc.get("participants").elements()
    val byId = Iterator.continually(ages).takeWhile(_.hasNext).map(_.next())
      .map(n => n.get("participant_id").asText() -> n.get("age").asLong()).toMap
    assert(byId == Map("u1" -> 12L, "u2" -> 9L))
  }

  test("CCDI-mode EtlRunner run over a workbook directory") {
    import graft.engine.EtlRunner
    val dir = Files.createTempDirectory("graft_ccdi")
    def write(name: String, content: String): String = {
      val p = dir.resolve(name); Files.writeString(p, content); p.toString
    }
    val wb = Files.createDirectory(dir.resolve("workbook"))
    Files.writeString(wb.resolve("patient.csv"),
      "patient_id,seg\nP1,AUTOMOBILE\nP2,OTHER\n,ORPHAN\n")
    Files.writeString(wb.resolve("visit.csv"),
      "visit_id,points,patient_ref\nV1,7,P1\n")
    val schemaPath = write("schema.json", """
      {"$defs": {
        "participant": {"type": "object", "required": ["participant_id"],
          "properties": {
            "participant_id": {"type": "string"},
            "segment": {"type": "string", "enum": ["Auto", "Other"]}}},
        "laboratory_test": {"type": "object", "required": ["laboratory_test_id"],
          "properties": {
            "laboratory_test_id": {"type": "string"},
            "score": {"type": "integer"}}}
      }}""")
    val xformPath = write("transformations.json", """
      {"name": "ccdi1", "uuid_seed": "s", "mappings": [
        {"output_field": "participant.participant_id", "source_field": "patient.patient_id"},
        {"output_field": "participant.segment", "source_field": "patient.seg",
         "replacement_values": [
           {"old_value": "AUTOMOBILE", "new_value": "Auto"},
           {"old_value": "OTHER", "new_value": "Other"}]},
        {"output_field": "laboratory_test.laboratory_test_id", "source_field": "visit.visit_id"},
        {"output_field": "laboratory_test.score", "source_field": "visit.points"}
      ]}""")
    val out = dir.resolve("out").toString
    val result = EtlRunner.run(spark, EtlRunner.Config(
      schemaPath, xformPath, wb.toString, rowKeyColumn = "unused",
      outDir = out, sourceFormat = "workbook"))
    // blank-id patient row dropped by the per-tab filter
    assert(result.recordCounts(("ccdi1", "participant")) == 2)
    assert(result.recordCounts(("ccdi1", "laboratory_test")) == 1)
    assert(result.violations == 0)
  }

  test("CCDI-mode EtlRunner run over a REAL .xlsx workbook file") {
    import graft.engine.EtlRunner
    val dir = Files.createTempDirectory("graft_ccdi_xlsx")
    def write(name: String, content: String): String = {
      val p = dir.resolve(name); Files.writeString(p, content); p.toString
    }
    // identical study as the directory-mode test, but shipped as a real
    // workbook — the path a reference user hits first
    val xlsx = graft.TestXlsx.write(dir.resolve("study.xlsx"), Seq(
      "patient" -> Seq(
        Seq("patient_id", "seg"),
        Seq("P1", "AUTOMOBILE"),
        Seq("P2", "OTHER"),
        Seq("", "ORPHAN")),
      "visit" -> Seq(
        Seq("visit_id", "points", "patient_ref"),
        Seq("V1", "7", "P1"))))
    val schemaPath = write("schema.json", """
      {"$defs": {
        "participant": {"type": "object", "required": ["participant_id"],
          "properties": {
            "participant_id": {"type": "string"},
            "segment": {"type": "string", "enum": ["Auto", "Other"]}}},
        "laboratory_test": {"type": "object", "required": ["laboratory_test_id"],
          "properties": {
            "laboratory_test_id": {"type": "string"},
            "score": {"type": "integer"}}}
      }}""")
    val xformPath = write("transformations.json", """
      {"name": "ccdi1", "uuid_seed": "s", "mappings": [
        {"output_field": "participant.participant_id", "source_field": "patient.patient_id"},
        {"output_field": "participant.segment", "source_field": "patient.seg",
         "replacement_values": [
           {"old_value": "AUTOMOBILE", "new_value": "Auto"},
           {"old_value": "OTHER", "new_value": "Other"}]},
        {"output_field": "laboratory_test.laboratory_test_id", "source_field": "visit.visit_id"},
        {"output_field": "laboratory_test.score", "source_field": "visit.points"}
      ]}""")
    val out = dir.resolve("out").toString
    val result = EtlRunner.run(spark, EtlRunner.Config(
      schemaPath, xformPath, xlsx, rowKeyColumn = "unused",
      outDir = out, sourceFormat = "workbook"))
    assert(result.recordCounts(("ccdi1", "participant")) == 2)
    assert(result.recordCounts(("ccdi1", "laboratory_test")) == 1)
    assert(result.violations == 0)
  }
}
