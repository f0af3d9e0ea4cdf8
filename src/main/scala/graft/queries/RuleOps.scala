package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables.t

/** Rule-table and policy operators closing out SURVEY.md §2's inventory:
  * V4 row-mapped rule evaluation (`etl/mci/c3dc_row_mapped_builder.py:195-252`),
  * A8 duplicate-source-field policy (`etl/mci/c3dc_etl.py:949-1022`),
  * F9 laterality single-populated coalesce (`etl/mci/c3dc_etl.py:1647-1686`),
  * K4 record-count report (`harmonized_data_reporter.py:96-125`),
  * S6/V1 form pivot with deterministic-first (`etl/mci/c3dc_etl.py:961-1025`).
  *
  * Scale notes: the rule table is tiny and constant → `broadcast` nested-loop
  * join, fact side never shuffles; A8/S6 group by the natural subject key
  * (one shuffle, map-side combined); K4 is metadata-size output produced by
  * per-node partial counts.
  */
object RuleOps {

  /** Reference match semantics (V4): '*' always matches, '+' matches any
    * nonblank, literal matches casefolded-trimmed equality.
    */
  private def ruleMatch(src: Column, pat: Column): Column = {
    val norm = lower(trim(src))
    when(pat === "*", lit(true))
      .when(pat === "+", src.isNotNull && trim(src) =!= "")
      .otherwise(norm === lower(trim(pat)))
  }

  /** The committed rule sheet for v4 — literal, like the reference's XLSX
    * rule rows; mirrored verbatim into the DuckDB oracle VALUES list.
    */
  private val V4Rules: Seq[(Int, String, String, String)] = Seq(
    (1, "1-URGENT", "F", "urgent_completed"),
    (2, "1-URGENT", "*", "urgent_any"),
    (3, "*", "P", "pending_review"),
    (4, "+", "O", "open_prioritized"))

  private def v4RulesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    V4Rules.toDF("rule_id", "m_priority", "m_status", "outcome")
  }

  private val V4RulesValues =
    V4Rules.map { case (id, p, st, o) => s"($id, '$p', '$st', '$o')" }.mkString(", ")

  def qs: Seq[Q] = Seq(
    Q(
      "v4_row_mapped_rules",
      (s, dir) => {
        // V4: every rule row whose 2-field conjunction matches the source
        // row emits one output record (the reference emits per matching
        // rule, not first-match). Tiny constant rule table → broadcast
        // nested-loop join; the orders fact never shuffles. Normalization
        // (lower/trim, blank tests) is projected BEFORE the join on both
        // sides so the per-(row,rule) inner loop only compares.
        val rules = broadcast(v4RulesDf(s)
          .withColumn("p_norm", lower(trim(col("m_priority"))))
          .withColumn("s_norm", lower(trim(col("m_status")))))
        val o = t(s, dir, "orders")
          .withColumn("op_norm", lower(trim(col("o_orderpriority"))))
          .withColumn("op_blank", col("o_orderpriority").isNull ||
            trim(col("o_orderpriority")) === "")
          .withColumn("os_norm", lower(trim(col("o_orderstatus"))))
          .withColumn("os_blank", col("o_orderstatus").isNull ||
            trim(col("o_orderstatus")) === "")
        def m(pat: Column, norm: Column, srcNorm: Column, srcBlank: Column): Column =
          when(pat === "*", lit(true))
            .when(pat === "+", !srcBlank)
            .otherwise(srcNorm === norm)
        o.join(
            rules,
            m(col("m_priority"), col("p_norm"), col("op_norm"), col("op_blank")) &&
              m(col("m_status"), col("s_norm"), col("os_norm"), col("os_blank")))
          .select(col("o_orderkey"), col("rule_id"), col("outcome"))
      },
      Some(s"""SELECT o_orderkey, rule_id, outcome
              FROM orders
              JOIN (VALUES $V4RulesValues) r(rule_id, m_priority, m_status, outcome)
              ON (m_priority = '*' OR (m_priority = '+' AND trim(o_orderpriority) <> '')
                  OR lower(trim(o_orderpriority)) = lower(trim(m_priority)))
              AND (m_status = '*' OR (m_status = '+' AND trim(o_orderstatus) <> '')
                   OR lower(trim(o_orderstatus)) = lower(trim(m_status)))"""),
      doc = "V4: row-mapped rule table via broadcast join, wildcard/conjunction match"),

    Q(
      "a8_dup_field_policy",
      (s, dir) => {
        // A8: duplicate source-field occurrences per (subject, field) with a
        // per-field exception policy — the 'purchase' field keeps the MIN
        // value (the reference's DM_BRTHDAT most-negative rule); any other
        // duplicated field is a conflict surfaced on the error channel
        // (kept=null) rather than a hard abort.
        t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("occurrences"), min(col("value")).as("min_v"),
            max(col("value")).as("max_v"))
          .select(
            col("user_id"), col("event_type"), col("occurrences"),
            when(col("event_type") === "purchase", col("min_v"))
              .when(col("occurrences") === 1, col("min_v"))
              .otherwise(lit(null).cast("double")).as("kept"),
            (col("occurrences") > 1 && col("event_type") =!= "purchase")
              .as("conflict"))
      },
      Some("""SELECT user_id, event_type, count(*) AS occurrences,
              CASE WHEN event_type = 'purchase' THEN min(value)
                   WHEN count(*) = 1 THEN min(value)
                   ELSE NULL END AS kept,
              (count(*) > 1 AND event_type <> 'purchase') AS conflict
              FROM events GROUP BY user_id, event_type"""),
      doc = "A8: per-(subject,field) duplicate policy — min-value exception, conflict channel"),

    Q(
      "f9_laterality",
      (s, dir) => {
        // F9: two candidate source fields resolve through an enum lookup;
        // exactly one populated → its value; both → conflict marker (the
        // reference hard-errors; we surface it as a value on the error
        // channel); none → default. Lookups are literal maps → pure
        // codegen'd when-chains, no join at all.
        val prioEnum = when(lower(trim(col("o_orderpriority"))) === "1-urgent", lit("Urgent"))
          .when(lower(trim(col("o_orderpriority"))) === "2-high", lit("High"))
        val statEnum = when(lower(trim(col("o_orderstatus"))) === "p", lit("Pending"))
        val nPop = prioEnum.isNotNull.cast("int") + statEnum.isNotNull.cast("int")
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            when(nPop > 1, lit("Conflict"))
              .otherwise(coalesce(prioEnum, statEnum, lit("Not Reported")))
              .as("resolved"),
            (nPop > 1).as("multi_populated"))
      },
      Some("""SELECT o_orderkey,
              CASE WHEN (CASE WHEN lower(trim(o_orderpriority)) IN ('1-urgent','2-high') THEN 1 ELSE 0 END
                       + CASE WHEN lower(trim(o_orderstatus)) = 'p' THEN 1 ELSE 0 END) > 1
                   THEN 'Conflict'
                   ELSE COALESCE(
                     CASE WHEN lower(trim(o_orderpriority)) = '1-urgent' THEN 'Urgent'
                          WHEN lower(trim(o_orderpriority)) = '2-high' THEN 'High' END,
                     CASE WHEN lower(trim(o_orderstatus)) = 'p' THEN 'Pending' END,
                     'Not Reported') END AS resolved,
              (CASE WHEN lower(trim(o_orderpriority)) IN ('1-urgent','2-high') THEN 1 ELSE 0 END
             + CASE WHEN lower(trim(o_orderstatus)) = 'p' THEN 1 ELSE 0 END) > 1 AS multi_populated
              FROM orders"""),
      doc = "F9: single-populated-field coalesce with conflict channel (no join)"),

    Q(
      "k4_record_counts",
      (s, dir) => {
        // K4: record-count report — metadata-size output. The aggregate
        // sits DIRECTLY on each scan (the node name is tagged above it),
        // so column pruning empties the read schema (`ReadSchema:
        // struct<>` — row counts come from batch metadata, no data pages
        // decoded) and, on the DSv2 scan path, parquet aggregate pushdown
        // could answer entirely from row-group footers. (r15 A/B: a
        // single grouped aggregate over a tagged union measured 1.35×
        // SLOWER at sf0.1 — the keyless per-table counts use the tight
        // no-hash count path while groupBy(node) pays a per-row hash
        // probe on a string key; the 10 independent two-stage subtrees
        // schedule concurrently under one action, so the extra exchanges
        // are not on the critical path. Kept the per-table form.)
        val names = Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
        names.map { n =>
          t(s, dir, n).agg(count(lit(1)).as("records"))
            .select(lit(n).as("node"), col("records"))
        }.reduce(_.unionByName(_))
      },
      Some("""SELECT 'region' AS node, count(*) AS records FROM region
              UNION ALL SELECT 'nation', count(*) FROM nation
              UNION ALL SELECT 'customer', count(*) FROM customer
              UNION ALL SELECT 'supplier', count(*) FROM supplier
              UNION ALL SELECT 'part', count(*) FROM part
              UNION ALL SELECT 'orders', count(*) FROM orders
              UNION ALL SELECT 'lineitem', count(*) FROM lineitem
              UNION ALL SELECT 'events', count(*) FROM events
              UNION ALL SELECT 'documents', count(*) FROM documents
              UNION ALL SELECT 'embeddings', count(*) FROM embeddings"""),
      doc = "K4: per-node record-count report (harmonized_data_reporter shape)"),

    Q(
      "s6_form_pivot_first",
      (s, dir) => {
        // S6/V1: form flattening — long (subject, field, value) entries to
        // one wide row per subject, FIRST occurrence wins in (ts, event_id)
        // arrival order, exactly the reference's first-value-per-form-field
        // rule. min_by with a LONG ordering key (event timestamps are
        // unique, so no tie-break needed — a struct key would demote the
        // aggregate to interpreted ordering): partial-aggregates map-side,
        // ONE shuffle on the subject key, no per-partition sort; explicit
        // value list so no distinct pre-scan.
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot(col("event_type"), types)
          .agg(min_by(col("value"), unix_micros(col("ts"))))
          .select(col("user_id") +: types.map(tp => col("`" + tp + "`").as(s"first_$tp")): _*)
      },
      Some("""SELECT user_id,
              max(value) FILTER (event_type = 'click')    AS first_click,
              max(value) FILTER (event_type = 'error')    AS first_error,
              max(value) FILTER (event_type = 'purchase') AS first_purchase,
              max(value) FILTER (event_type = 'signup')   AS first_signup,
              max(value) FILTER (event_type = 'view')     AS first_view
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) AS rn FROM events)
              WHERE rn = 1 GROUP BY user_id"""),
      doc = "S6/V1: first-wins form flatten — window top-1 then explicit pivot")
  )
}
