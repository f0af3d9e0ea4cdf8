package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.TransformationSpec
import graft.exec.{NodeBuilder, SubSourceExploder}
import graft.model.SchemaLoader
import Tables.t

/** The mapping-DSL operators (SURVEY.md §2.3 P1–P9, §2.4 F1–F6) driven
  * through the REAL engine stack — SchemaLoader → TransformationSpec →
  * MappingCompiler → NodeBuilder — against the synthetic tables, each with
  * a DuckDB oracle that re-states the reference semantics in plain SQL.
  *
  * The compiled plan is pure `when`-chain / built-in-function Column trees:
  * one narrow projection per type group, no UDFs, no shuffles — at 100 TB
  * a mapping program compiles to a single whole-stage-codegen'd pass.
  */
object DslOps {

  /** Schema for the synthetic "profile"/"orderinfo" nodes (same JSON-Schema
    * dialect the reference's schema compiler emits).
    */
  private val SchemaJson = """
  {"$defs": {
    "profile": {"type": "object", "required": ["profile_id"], "properties": {
      "profile_id": {"type": "string"},
      "segment": {"type": "string", "enum": ["Auto", "Construction", "Other"]},
      "tier": {"type": "string", "enum": ["Premium", "Standard"]},
      "nation_label": {"type": "string"},
      "balance_total": {"type": "number"},
      "balance_int": {"type": "integer", "maximum": 100000},
      "region_pv": {"type": "string",
        "enum": ["0 : Africa", "1 : America", "2 : Asia", "3 : Europe",
                 "4 : Middle East", "No Region"]},
      "races": {"type": "array", "items": {"type": "string",
        "enum": ["Asian", "Black or African American", "White",
                 "Hispanic or Latino", "Not Reported", "Unknown"]}},
      "priorities": {"type": "array", "items": {"type": "string"}}
    }},
    "orderinfo": {"type": "object", "required": ["order_id"], "properties": {
      "order_id": {"type": "string"},
      "urgency": {"type": "string"},
      "urgency_class": {"type": "string",
        "enum": ["closed-urgent", "open-live", "pending", "other"]}
    }}
  }}"""

  private lazy val schema = SchemaLoader.fromJson(SchemaJson)

  private def build(s: SparkSession, xformJson: String, node: String,
      source: DataFrame, rowKey: org.apache.spark.sql.Column): DataFrame = {
    val xform = TransformationSpec.fromJson(xformJson).head
    new NodeBuilder(schema, xform).build(node, source, rowKey)
  }

  /** customer ⋈ nation with the synthesized race/ethnicity/region columns
    * the DSL mappings read.
    */
  private def profileSource(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .withColumn("bad_region", col("n_regionkey") + lit(3))
      .withColumn("race_src",
        element_at(typedlit(Seq("White;Asian", "white ; unknown", "Unknown", "",
          "Black or African American")), (col("c_custkey") % 5).cast("int") + 1))
      .withColumn("eth_src",
        element_at(typedlit(Seq("Hispanic or Latino", "Not Reported", "")),
          (col("c_custkey") % 3).cast("int") + 1))

  /** Oracle fragment for the deterministic {uuid} macro
    * (GraftFunctions.deterministicUuid parity).
    */
  private def uuidSql(seed: String, name: String): String = {
    val h = s"md5('$seed' || ':' || $name)"
    s"""substr($h,1,8) || '-' || substr($h,9,4) || '-3' || substr($h,14,3) ||
        '-8' || substr($h,18,3) || '-' || substr($h,21,12)"""
  }

  def qs: Seq[Q] = Seq(
    Q(
      "dsl_p1_field_mapping",
      (s, dir) => {
        val xform = """{"name": "x1", "uuid_seed": "seed1", "mappings": [
          {"output_field": "profile.profile_id", "source_field": "c_custkey",
           "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
          {"output_field": "profile.segment", "source_field": "c_mktsegment",
           "replacement_values": [
             {"old_value": "AUTOMOBILE", "new_value": "Auto"},
             {"old_value": "BUILDING", "new_value": "Construction"},
             {"old_value": "+", "new_value": "Other"}]},
          {"output_field": "profile.tier", "source_field": "c_mktsegment",
           "default_value": "Standard",
           "replacement_values": [{"old_value": "FURNITURE", "new_value": "Premium"}]},
          {"output_field": "profile.nation_label", "source_field": "n_name",
           "replacement_values": [{"old_value": "+", "new_value": "{field:n_name}-{field:n_name}"}]},
          {"output_field": "profile.balance_total", "source_field": "[c_acctbal, c_custkey]",
           "replacement_values": [{"old_value": "*", "new_value": "{sum}"}]},
          {"output_field": "profile.balance_int", "source_field": "c_acctbal"},
          {"output_field": "profile.region_pv", "source_field": "bad_region",
           "replacement_values": [
             {"old_value": "*", "new_value": "{find_enum_value}"},
             {"old_value": "*", "new_value": "No Region"}]},
          {"output_field": "profile.races", "source_field": "[race_src, eth_src]",
           "default_value": "Not Reported",
           "replacement_values": [{"old_value": "*", "new_value": "{race}"}]}
        ]}"""
        // the array-typed races column is joined to a ';' string at the
        // query boundary (driver's pandas compare can't hash array cells)
        build(s, xform, "profile", profileSource(s, dir), col("c_custkey").cast("string"))
          .withColumn("races", array_join(col("races"), ";"))
      },
      Some(s"""WITH src AS (
           SELECT c.*, n.n_name, n.n_regionkey + 3 AS bad_region,
             (['White;Asian', 'white ; unknown', 'Unknown', '',
               'Black or African American'])[(c_custkey % 5)::INT + 1] AS race_src,
             (['Hispanic or Latino', 'Not Reported', ''])[(c_custkey % 3)::INT + 1] AS eth_src
           FROM customer c JOIN nation n ON c_nationkey = n_nationkey),
         race AS (
           SELECT c_custkey,
             list_filter(list_transform(string_split(eth_src, ';'), x -> trim(x)),
               x -> x <> '' AND lower(x) = 'hispanic or latino') AS eths,
             list_filter(list_transform(string_split(race_src, ';'), x -> trim(x)),
               x -> x <> '') AS races
           FROM src),
         race2 AS (
           SELECT c_custkey,
             list_distinct(list_concat(eths,
               CASE WHEN len(eths) > 0
                 THEN list_filter(races, r -> NOT list_contains(
                   ['not allowed to collect','not reported','unknown'], lower(r)))
                 ELSE races END)) AS merged
           FROM race),
         race3 AS (
           SELECT c_custkey, list_sort(list_distinct(list_filter(
             list_transform(merged, r -> CASE lower(r)
               WHEN 'asian' THEN 'Asian'
               WHEN 'black or african american' THEN 'Black or African American'
               WHEN 'white' THEN 'White'
               WHEN 'hispanic or latino' THEN 'Hispanic or Latino'
               WHEN 'not reported' THEN 'Not Reported'
               WHEN 'unknown' THEN 'Unknown' END),
             x -> x IS NOT NULL))) AS canon
           FROM race2)
         SELECT
           ${uuidSql("seed1", "'profile|*|0|' || src.c_custkey")} AS profile_id,
           -- literal old_values make the allowed-value gate live: the '+'
           -- arm can only fire for listed values, so others null out (P5)
           CASE WHEN lower(trim(c_mktsegment)) = 'automobile' THEN 'Auto'
                WHEN lower(trim(c_mktsegment)) = 'building' THEN 'Construction'
                END AS segment,
           CASE WHEN lower(trim(c_mktsegment)) = 'furniture' THEN 'Premium'
                END AS tier,
           n_name || '-' || n_name AS nation_label,
           c_acctbal + c_custkey AS balance_total,
           round_even(c_acctbal, 0)::BIGINT AS balance_int,
           CASE WHEN bad_region <= 4
                THEN bad_region || ' : ' ||
                     (['Africa','America','Asia','Europe','Middle East'])[bad_region + 1]
                ELSE 'No Region' END AS region_pv,
           array_to_string(CASE WHEN len(race3.canon) > 0 THEN race3.canon
                ELSE ['Not Reported'] END, ';') AS races
         FROM src JOIN race3 USING (c_custkey)"""),
      doc = "P1-P6/F1-F6: replacement chains, defaults, gating, macros, enum codes"),

    Q(
      "dsl_p2_compound_match",
      (s, dir) => {
        val xform = """{"name": "x2", "uuid_seed": "s", "mappings": [
          {"output_field": "orderinfo.order_id", "source_field": "o_orderkey"},
          {"output_field": "orderinfo.urgency_class",
           "source_field": "[o_orderstatus, o_orderpriority]",
           "default_value": "other",
           "replacement_values": [
             {"old_value": "F;1-URGENT", "new_value": "closed-urgent"},
             {"old_value": "O;+", "new_value": "open-live"},
             {"old_value": "P;*", "new_value": "pending"},
             {"old_value": "*", "new_value": "other"}]}
        ]}"""
        // enum output + in-enum default: the P5 gate probes a compound
        // mapping's DEFAULT (reference semantics — the '[a, b]' record key
        // never exists), so live compound chains need the default allowed
        build(s, xform, "orderinfo", t(s, dir, "orders"), col("o_orderkey").cast("string"))
          .withColumnRenamed("urgency_class", "urgency")
      },
      Some("""SELECT o_orderkey::VARCHAR AS order_id,
           CASE WHEN lower(trim(o_orderstatus)) = 'f'
                     AND lower(trim(o_orderpriority)) = '1-urgent' THEN 'closed-urgent'
                WHEN lower(trim(o_orderstatus)) = 'o'
                     AND coalesce(lower(trim(o_orderpriority)), '') <> '' THEN 'open-live'
                WHEN lower(trim(o_orderstatus)) = 'p' THEN 'pending'
                ELSE 'other' END AS urgency
           FROM orders"""),
      doc = "P2: compound-source per-ordinal match with wildcard positions"),

    Q(
      "dsl_p8_type_groups",
      (s, dir) => {
        // '*'-group base mapping replicated into groups 1 and 2 → two
        // output records per source row, each group adding its own fields
        val xform = """{"name": "x3", "uuid_seed": "s", "mappings": [
          {"output_field": "orderinfo.order_id", "source_field": "o_orderkey",
           "type_group_index": "*"},
          {"output_field": "orderinfo.urgency", "source_field": "o_orderstatus",
           "type_group_index": "1",
           "replacement_values": [{"old_value": "+", "new_value": "{field:o_orderstatus}"}]},
          {"output_field": "orderinfo.urgency", "source_field": "o_orderpriority",
           "type_group_index": "2",
           "replacement_values": [{"old_value": "+", "new_value": "{field:o_orderpriority}"}]}
        ]}"""
        build(s, xform, "orderinfo", t(s, dir, "orders"), col("o_orderkey").cast("string"))
      },
      Some("""SELECT o_orderkey::VARCHAR AS order_id, o_orderstatus AS urgency
              FROM orders
              UNION ALL
              SELECT o_orderkey::VARCHAR, o_orderpriority FROM orders"""),
      doc = "P8: type-group multi-record projection with '*' base replication"),

    Q(
      "dsl_p9_subsource_explode",
      (s, dir) => {
        // multi-value source "1;URGENT" → one cloned row per distinct
        // sorted value with derived ids okey_1..okey_n
        val src = t(s, dir, "orders")
          .withColumn("prio_multi", translate(col("o_orderpriority"), "-", ";"))
          .withColumn("okey_str", col("o_orderkey").cast("string"))
        SubSourceExploder.explode(src, "prio_multi", "okey_str")
          .select(col("o_orderkey"), col("okey_str").as("sub_id"),
            col("prio_multi").as("value"))
      },
      Some("""WITH v AS (SELECT o_orderkey,
                list_sort(list_distinct(list_filter(
                  list_transform(string_split(replace(o_orderpriority, '-', ';'), ';'),
                    x -> trim(x)), x -> x <> ''))) AS vals
              FROM orders)
              SELECT o_orderkey,
                CASE WHEN len(vals) > 1 THEN o_orderkey || '_' || i ELSE o_orderkey::VARCHAR END AS sub_id,
                vals[i] AS value
              FROM v, unnest(range(1, len(vals) + 1)) AS u(i)"""),
      doc = "P9: multi-value sub-source explode with derived {id}_{n} ids"),

    Q(
      "dsl_f3_sum_null_gate",
      (s, dir) => {
        // {sum}: any blank addend → fall back to mapping default; any
        // non-numeric addend → macro default; else the numeric sum
        val src = t(s, dir, "customer")
          .withColumn("maybe_bal",
            when(col("c_custkey") % 4 === 0, lit(null)).otherwise(col("c_acctbal")))
          .withColumn("numstr",
            when(col("c_custkey") % 7 === 0, lit("abc"))
              .otherwise(col("c_custkey").cast("string")))
        val xform = """{"name": "x4", "uuid_seed": "s", "mappings": [
          {"output_field": "profile.profile_id", "source_field": "c_custkey"},
          {"output_field": "profile.balance_total", "source_field": "[maybe_bal, numstr]",
           "default_value": "-999",
           "replacement_values": [{"old_value": "*", "new_value": "{sum}"}]}
        ]}"""
        build(s, xform, "profile", src, col("c_custkey").cast("string"))
      },
      Some("""SELECT c_custkey::VARCHAR AS profile_id,
              CASE WHEN c_custkey % 4 = 0 THEN -999.0
                   WHEN c_custkey % 7 = 0 THEN -999.0
                   ELSE c_acctbal + c_custkey END AS balance_total
              FROM customer"""),
      doc = "F3: null-gated horizontal {sum} with default fallbacks")
  )
}
