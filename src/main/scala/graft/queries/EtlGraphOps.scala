package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.TransformationSpec
import graft.exec.{Deduper, Harmonizer}
import graft.model.SchemaLoader
import graft.validate.OutputValidator
import Tables.t

/** End-to-end harmonization-graph operators: the full reference pipeline
  * shape (SURVEY.md §3.1 step 5–7) — singleton study, per-row participant +
  * observations, id-list graph linking, cross-file dedup with provenance
  * report, and row-level schema validation — run through the REAL
  * Harmonizer / Deduper / OutputValidator against synthetic tables.
  *
  * Scale: the only shuffles are the per-relationship `collect_list`
  * rollups (map-side combined) and the dedup window; singleton ids are
  * driver literals, never a cluster join (J2).
  */
object EtlGraphOps {

  private val SchemaJson = """
  {"$defs": {
    "study": {"type": "object", "required": ["study_id"], "properties": {
      "study_id": {"type": "string"},
      "consent_group.consent_group_id": {"type": "array", "items": {"type": "string"}},
      "reference_file.reference_file_id": {"type": "array", "items": {"type": "string"}}
    }},
    "participant": {"type": "object", "required": ["participant_id"], "properties": {
      "participant_id": {"type": "string"},
      "segment": {"type": "string"},
      "survival.survival_id": {"type": "array", "items": {"type": "string"}},
      "diagnosis.diagnosis_id": {"type": "array", "items": {"type": "string"}},
      "study.study_id": {"type": "string"}
    }},
    "survival": {"type": "object", "required": ["survival_id"], "properties": {
      "survival_id": {"type": "string"},
      "participant.participant_id": {"type": "string"},
      "status": {"type": "string"}
    }},
    "diagnosis": {"type": "object", "required": ["diagnosis_id"], "properties": {
      "diagnosis_id": {"type": "string"},
      "participant.participant_id": {"type": "string"},
      "site": {"type": "string"}
    }},
    "profile": {"type": "object", "required": ["profile_id"], "properties": {
      "profile_id": {"type": "string"},
      "segment": {"type": "string", "enum": ["AUTOMOBILE", "BUILDING",
        "FURNITURE", "HOUSEHOLD", "MACHINERY"]},
      "age": {"type": "integer", "maximum": 100},
      "tags": {"type": "array", "items": {"type": "string"}}
    }}
  }}"""

  private lazy val schema = SchemaLoader.fromJson(SchemaJson)

  private val HarmonizeXform = """{"name": "h1", "uuid_seed": "hseed", "mappings": [
    {"output_field": "study.study_id", "source_field": "[string_literal]",
     "replacement_values": [{"old_value": "*", "new_value": "STUDY01"}]},
    {"output_field": "participant.participant_id", "source_field": "c_custkey",
     "replacement_values": [{"old_value": "*", "new_value": "{field:c_custkey}"}]},
    {"output_field": "participant.segment", "source_field": "c_mktsegment"},
    {"output_field": "survival.survival_id", "source_field": "c_custkey",
     "replacement_values": [{"old_value": "*", "new_value": "{field:c_custkey}"}]},
    {"output_field": "survival.participant.participant_id", "source_field": "c_custkey",
     "replacement_values": [{"old_value": "*", "new_value": "{field:c_custkey}"}]},
    {"output_field": "survival.status", "source_field": "c_mktsegment",
     "replacement_values": [
       {"old_value": "AUTOMOBILE", "new_value": "Alive"},
       {"old_value": "*", "new_value": "Unknown"}]},
    {"output_field": "diagnosis.diagnosis_id", "source_field": "c_custkey",
     "replacement_values": [{"old_value": "*", "new_value": "{field:c_custkey}"}]},
    {"output_field": "diagnosis.participant.participant_id", "source_field": "c_custkey",
     "replacement_values": [{"old_value": "*", "new_value": "{field:c_custkey}"}]},
    {"output_field": "diagnosis.site", "source_field": "n_name"}
  ]}"""

  /** Harmonized node frames for the synthetic "study": one participant per
    * customer, one survival + one diagnosis observation each.
    * Ids are natural-key-derived ("P<custkey>") via prefixed {field:}
    * new-values below so the graph joins are oracle-checkable.
    */
  private def harmonized(s: SparkSession, dir: String): Map[String, DataFrame] = {
    // prefix ids at the source level: the mapping DSL splices {field:...}
    val src = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
    val xform = TransformationSpec.fromJson(HarmonizeXform).head
    new Harmonizer(schema, xform).harmonize(src, col("c_custkey").cast("string"))
  }

  def qs: Seq[Q] = Seq(
    Q(
      "etl1_harmonize_participants",
      (s, dir) => {
        val nodes = harmonized(s, dir)
        // id-lists joined to ';' strings at the query boundary (driver's
        // pandas compare can't hash array cells; K3 report parity anyway)
        nodes("participant").select(
          col("participant_id"),
          col("segment"),
          array_join(col("`survival.survival_id`"), ";").as("survival_ids"),
          array_join(col("`diagnosis.diagnosis_id`"), ";").as("diagnosis_ids"),
          col("`study.study_id`").as("study_id"))
      },
      Some("""SELECT c_custkey::VARCHAR AS participant_id,
              c_mktsegment AS segment,
              c_custkey::VARCHAR AS survival_ids,
              c_custkey::VARCHAR AS diagnosis_ids,
              'STUDY01' AS study_id
              FROM customer"""),
      doc = "Harmonizer end-to-end: participant frame with linked id-lists"),

    Q(
      "etl2_harmonize_observations",
      (s, dir) => {
        val nodes = harmonized(s, dir)
        // rename the common-lineage join keys to avoid ambiguous-self-join
        // attribute resolution (both frames descend from one source scan)
        val sv = nodes("survival").select(
          col("survival_id"), col("status"),
          col("`participant.participant_id`").as("sv_pid"))
        val dg = nodes("diagnosis").select(
          col("diagnosis_id"), col("site"),
          col("`participant.participant_id`").as("dg_pid"))
        sv.join(dg, col("sv_pid") === col("dg_pid"))
          .select(col("survival_id"), col("status"), col("diagnosis_id"), col("site"))
      },
      Some("""SELECT c_custkey::VARCHAR AS survival_id,
              -- the literal AUTOMOBILE old_value makes the allowed-value
              -- gate live (P5): the '*' fallback arm cannot fire for
              -- unlisted source values, which null out instead
              CASE WHEN lower(trim(c_mktsegment)) = 'automobile'
                   THEN 'Alive' END AS status,
              c_custkey::VARCHAR AS diagnosis_id,
              n_name AS site
              FROM customer JOIN nation ON c_nationkey = n_nationkey"""),
      doc = "Harmonizer observations: mapped fields + back-pointer join"),

    Q(
      "etl3_dedup_report",
      (s, dir) => {
        // A7/K3: two overlapping per-transformation extracts; identical
        // normalized content (own id blanked) dedupes with provenance
        val c = t(s, dir, "customer")
        def profiles(lo: Long, hi: Long): DataFrame =
          c.filter(col("c_custkey").between(lo, hi))
            .select(
              col("c_custkey").cast("string").as("profile_id"),
              col("c_mktsegment").as("segment"))
        val (_, report) = Deduper.dedupe(
          "profile",
          Seq(("xform_a", 1, profiles(1, 100)), ("xform_b", 2, profiles(50, 150))),
          participantCol = Some("profile_id"))
        report.withColumn("transformations", array_join(col("transformations"), ";"))
      },
      Some("""SELECT c_custkey::VARCHAR AS participant_id, 'profile' AS node,
              2::BIGINT AS occurrences,
              'xform_a;xform_b' AS transformations
              FROM customer WHERE c_custkey BETWEEN 50 AND 100"""),
      doc = "A7/K3: cross-transformation dedup duplicate report with provenance"),

    Q(
      "etl4_output_validation",
      (s, dir) => {
        // C2: deliberately-dirty records → distributed violations frame
        val dirty = t(s, dir, "customer").select(
          when(col("c_custkey") % 10 === 0, lit("")).otherwise(col("c_custkey").cast("string"))
            .as("profile_id"),
          when(col("c_custkey") % 7 === 0, lit("UNLISTED")).otherwise(col("c_mktsegment"))
            .as("segment"),
          (col("c_custkey") % 120).cast("long").as("age"),
          when(col("c_custkey") % 9 === 0, typedlit(Seq("x", "x")))
            .otherwise(typedlit(Seq("x", "y"))).as("tags"),
          // a column the schema does not declare: additionalProperties is
          // false, so every record carrying the key is a violation
          concat(lit("L"), (col("c_custkey") % 3).cast("string")).as("legacy_flag"))
        OutputValidator.validateNode(schema, "profile", dirty)
      },
      Some("""WITH dirty AS (SELECT
                CASE WHEN c_custkey % 10 = 0 THEN '' ELSE c_custkey::VARCHAR END AS profile_id,
                CASE WHEN c_custkey % 7 = 0 THEN 'UNLISTED' ELSE c_mktsegment END AS segment,
                c_custkey % 120 AS age,
                CASE WHEN c_custkey % 9 = 0 THEN ['x','x'] ELSE ['x','y'] END AS tags,
                'L' || (c_custkey % 3)::VARCHAR AS legacy_flag
              FROM customer)
              SELECT 'profile' AS node, profile_id AS record_id, 'profile_id' AS property,
                     'required property blank' AS violation, profile_id AS value
              FROM dirty WHERE profile_id = ''
              UNION ALL
              SELECT 'profile', profile_id, 'segment', 'value not in enum domain', segment
              FROM dirty WHERE segment = 'UNLISTED'
              UNION ALL
              SELECT 'profile', profile_id, 'age', 'above maximum 100', age::VARCHAR
              FROM dirty WHERE age > 100
              UNION ALL
              SELECT 'profile', profile_id, 'tags', 'array items not unique', to_json(tags)::VARCHAR
              FROM dirty WHERE tags = ['x','x']
              UNION ALL
              SELECT 'profile', profile_id, 'legacy_flag', 'property not permitted by schema', legacy_flag
              FROM dirty"""),
      doc = "C2: schema enforcement as a distributed violations frame")
  )
}
