package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.{Transformation, TransformationSpec}
import graft.exec.{Deduper, Harmonizer}
import graft.model.{C3dcSchema, SchemaLoader}
import graft.sink.HarmonizedJsonSink
import graft.sources.SourceReader
import graft.validate.{GraphValidator, OutputValidator}

/** The config-driven pipeline entry (SURVEY §3.1 / §7.1 `engine/`): the
  * Spark analogue of running the reference's `c3dc_etl.py` against a
  * `.env` — schema compile, transformation load, source scan, per-
  * transformation harmonization, duplicate-id + schema + graph
  * validation, per-transformation harmonized JSON docs, and the merged
  * cross-transformation output with first-wins dedup + duplicate report.
  *
  * Orchestration only — every step is a library component with its own
  * spec; this class owns sequencing and file layout, not semantics.
  */
object EtlRunner {

  /** @param sourceFormat "csv" | "tsv" (TARGET mode) | "workbook" (CCDI:
    *                      directory of per-tab CSVs, tabs resolved from
    *                      tab-qualified mapping fields) | "jsondocs" (MCI:
    *                      directory of per-subject form documents)
    * @param rowKeyColumn source column providing each row's natural key
    *                     (feeds deterministic {uuid}s); "upi" for
    *                     jsondocs, unused in workbook mode (per-tab ids)
    */
  final case class Config(
      schemaPath: String,
      transformationsPath: String,
      sourcePath: String,
      rowKeyColumn: String,
      outDir: String,
      sourceFormat: String = "csv")

  /** @param recordCounts (transformation, node) → records written
    * @param duplicateIds per-node duplicate-id frame rows (must be 0 for
    *                     a valid run — the reference aborts, we report)
    * @param violations   schema-violation rows across all nodes
    * @param duplicates   suppressed cross-transformation duplicate-record
    *                     rows (observation/study/reference_file content
    *                     dedup — what the reference counts in
    *                     `_duplicate_harmonized_records`)
    * @param mergeUpdates participant ids contributed by more than one
    *                     transformation (the reference handles these via
    *                     `_update_participant_in_merged_data_set` and only
    *                     LOGS them — they are merge updates, not
    *                     suppressed duplicates, so they stay out of
    *                     `duplicates`)
    */
  final case class Result(
      recordCounts: Map[(String, String), Long],
      duplicateIds: Long,
      violations: Long,
      duplicates: Long,
      mergeUpdates: Long)

  def run(spark: SparkSession, config: Config): Result = {
    val schema: C3dcSchema = SchemaLoader.fromFile(config.schemaPath)
    val xforms: Seq[Transformation] = TransformationSpec.fromFile(config.transformationsPath)
    // lazy: CCDI "workbook" mode resolves per-node tabs inside
    // harmonizeWorkbook and never evaluates a shared source frame
    lazy val source: DataFrame = config.sourceFormat match {
      case "csv" => SourceReader.csv(spark, config.sourcePath)
      case "tsv" => SourceReader.tsv(spark, config.sourcePath)
      case "workbook" => throw new IllegalStateException(
        "workbook mode has no shared source frame")
      case "jsondocs" =>
        // MCI mode: per-subject form documents, flattened to one wide row
        // per upi over exactly the mapping programs' source fields (S6's
        // projection pushdown)
        val mapped = xforms.flatMap(_.mappings)
          .filterNot(_.isStringLiteralSource)
          .flatMap(_.sourceFields).distinct
        graft.sources.FormFlattener.flatten(
          SourceReader.jsonDocs(spark, config.sourcePath,
            graft.sources.FormFlattener.DocSchema),
          mapped)
      case other => throw new IllegalArgumentException(s"unsupported source format $other")
    }
    new java.io.File(config.outDir).mkdirs()

    // per-transformation harmonize + validate + K1 doc
    val perXform: Seq[(Transformation, Map[String, DataFrame])] = xforms.map { x =>
      val h = new Harmonizer(schema, x)
      val nodes0 =
        if (config.sourceFormat == "workbook")
          // accepts a real .xlsx (native reader) or a {tab}.csv directory
          h.harmonizeWorkbook(SourceReader.workbook(spark, config.sourcePath))
        else h.harmonize(source, col("`" + config.rowKeyColumn + "`").cast("string"))
      val nodes = nodes0
        .view.mapValues(_.localCheckpoint(false)).toMap // consumed by doc+validate+merge
      HarmonizedJsonSink.writeDocument(nodes, s"${config.outDir}/${x.name}.harmonized.json")
      (x, nodes)
    }

    val recordCounts: Map[(String, String), Long] = perXform.flatMap {
      case (x, nodes) => nodes.map { case (n, df) => (x.name, n) -> df.count() }
    }.toMap

    val duplicateIds: Long = perXform.map { case (_, nodes) =>
      nodes.map { case (n, df) =>
        GraphValidator.duplicateIds(df, graft.model.NodeType.idProperty(n)).count()
      }.sum
    }.sum

    // C2 violations persisted per transformation (reference writes its
    // validation results; empty CSVs are cheap and make "no violations"
    // an artifact, not an absence)
    val violations: Long = perXform.map { case (x, nodes) =>
      val v = OutputValidator.validateAll(schema, nodes).localCheckpoint(false)
      v.coalesce(1).write.mode("overwrite")
        .option("header", true).csv(s"${config.outDir}/violations_${x.name}")
      v.count()
    }.sum

    // warn channel: P5 gate rejections per transformation (tabular modes;
    // workbook/jsondocs evaluate against per-node/flattened frames that
    // the diagnostics API takes directly when wanted)
    if (config.sourceFormat == "csv" || config.sourceFormat == "tsv")
      xforms.foreach { x =>
        graft.validate.MappingDiagnostics.gateRejections(schema, x, source)
          .coalesce(1).write.mode("overwrite")
          .option("header", true).csv(s"${config.outDir}/gate_rejections_${x.name}")
      }

    // merged output (A7/K2/K3, reference _create_merged_json_etl_file):
    // participants keep ONE record per id — first transformation wins
    // whole — while observation nodes dedupe on (content, participant)
    // so identical observations are suppressed only WITHIN a participant,
    // never across participants (reference get_cache_key includes the
    // participant id). Other nodes (study, reference_file) dedupe on
    // content alone.
    val nodeNames = perXform.flatMap(_._2.keys).distinct
    var duplicates = 0L
    var mergeUpdates = 0L
    val merged: Map[String, DataFrame] = nodeNames.map { n =>
      val frames = perXform.zipWithIndex.collect {
        case ((x, nodes), i) if nodes.contains(n) => (x.name, i, nodes(n))
      }
      val (deduped, report) =
        if (n == "participant") Deduper.dedupeById(n, frames, "participant_id")
        else {
          val pidCol =
            if (frames.exists(_._3.columns.contains("participant.participant_id")))
              Some("participant.participant_id")
            else None
          Deduper.dedupe(n, frames, pidCol)
        }
      val rep = report.withColumn("transformations",
        array_join(col("transformations"), ";"))
      // participant rows are MERGE UPDATES (reference
      // `_update_participant_in_merged_data_set` logs them), not
      // suppressed duplicate records — they don't belong in the K3
      // duplicate total and land in their own report file
      if (n == "participant") {
        mergeUpdates += rep.count()
        rep.coalesce(1).write.mode("overwrite")
          .option("header", true).csv(s"${config.outDir}/merge_updates_$n")
      } else {
        duplicates += rep.count()
        rep.coalesce(1).write.mode("overwrite")
          .option("header", true).csv(s"${config.outDir}/duplicates_$n")
      }
      n -> deduped
    }.toMap
    HarmonizedJsonSink.writeDocument(merged, s"${config.outDir}/merged.harmonized.json")

    Result(recordCounts, duplicateIds, violations, duplicates, mergeUpdates)
  }
}
