package graft.queries

import org.apache.spark.sql.functions._

import Tables.t

/** Pivot / unpivot / JSON-flatten / full-width-join / time-window shapes
  * (SURVEY.md §2.8 V1–V4, J6; §2.10 time windows in batch form).
  *
  * Scale notes: pivots use an EXPLICIT value list (no distinct-values
  * pre-scan job, and stable output schema); the full-width join keeps each
  * per-type aggregate partial-aggregated before its join; the tumbling
  * window is a plain hash aggregation over a derived bucket column —
  * identical plan to the streaming version's state update.
  */
object ShapeOps {
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Gaps-and-islands session CTEs shared by the w2 and w4 oracles. The
    * break comparator is the one semantic difference between the custom
    * sessionizer (`>` gap) and Spark's native session_window (`>=` gap).
    */
  private def sessionIslandsCte(breakOp: String): String =
    s"""o AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w $breakOp 1800000000
                 THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sx AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM o)"""

  def qs: Seq[Q] = Seq(
    Q(
      "v1_pivot_events",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot(col("event_type"), EventTypes)
          .agg(sum(dec(col("value"))).cast("double"))
          .select(col("user_id") +: EventTypes.map(e => col("`" + e + "`").as(e)): _*),
      Some("""SELECT user_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'click')    AS DOUBLE) AS click,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'error')    AS DOUBLE) AS error,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'signup')   AS DOUBLE) AS signup,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view')     AS DOUBLE) AS view
              FROM events GROUP BY user_id"""),
      doc = "V1: long→wide pivot with explicit value list (no pre-scan)"),

    Q(
      "v3_unpivot_lineitem",
      (s, dir) =>
        t(s, dir, "lineitem")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "measure", "value"),
      Some("""SELECT l_orderkey, l_linenumber, measure, value
              FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
                    FROM lineitem)
              UNPIVOT (value FOR measure IN (l_quantity, l_discount, l_tax))"""),
      doc = "V3: wide→long unpivot (mapping-sheet melt shape)"),

    Q(
      "v2_json_flatten",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            count(col("k")).as("n"),
            max(col("k")).as("max_k")),
      Some("""SELECT event_type,
              -- ::BIGINT: DuckDB SUM(BIGINT) yields HUGEINT → float64 via
              -- the driver's pandas bridge → hash mismatch vs Spark int64
              SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
              COUNT(json_extract_string(props, '$.k')) AS n,
              MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
              FROM events GROUP BY event_type"""),
      doc = "V2/S5: semi-structured JSON field extraction + aggregation"),

    Q(
      "j6_full_width",
      (s, dir) => {
        // J6: iterative left join of per-form frames on the subject key
        // (data_pivoter full-width sheet). Each per-type aggregate is tiny
        // after partial aggregation; joins co-locate on user_id.
        val e = t(s, dir, "events")
        val base = e.select(col("user_id")).distinct()
        EventTypes.foldLeft(base) { (acc, et) =>
          val agg = e.filter(col("event_type") === et)
            .groupBy(col("user_id"))
            .agg(count(lit(1)).as(s"n_$et"))
          acc.join(agg, Seq("user_id"), "left")
        }.na.fill(0L, EventTypes.map(et => s"n_$et"))
      },
      Some("""SELECT user_id,
              COUNT(*) FILTER (event_type = 'click')    AS n_click,
              COUNT(*) FILTER (event_type = 'error')    AS n_error,
              COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
              COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
              COUNT(*) FILTER (event_type = 'view')     AS n_view
              FROM events GROUP BY user_id"""),
      doc = "J6: full-width iterative left join on the subject key"),

    Q(
      "j6b_full_width_agg",
      (s, dir) => {
        // the SCALE-SHAPED form of j6: identical output from ONE
        // conditional aggregation — a single shuffle and a single pass
        // over events instead of one filtered aggregate + join per form
        // (j6 keeps the reference's iterative-join shape deliberately;
        // this is what the engine would actually run at 100 TB)
        val e = t(s, dir, "events")
        val counts = EventTypes.map(et =>
          sum(when(col("event_type") === et, 1L).otherwise(0L)).as(s"n_$et"))
        e.groupBy(col("user_id")).agg(counts.head, counts.tail: _*)
      },
      Some("""SELECT user_id,
              COUNT(*) FILTER (event_type = 'click')    AS n_click,
              COUNT(*) FILTER (event_type = 'error')    AS n_error,
              COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
              COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
              COUNT(*) FILTER (event_type = 'view')     AS n_view
              FROM events GROUP BY user_id"""),
      doc = "J6 alt: full-width sheet as one conditional aggregation (single shuffle)"),

    Q(
      "w2_sessionize",
      (s, dir) => {
        // gap-and-island sessionization (batch form of the streaming
        // sessionizer; EventStreamingSpec asserts the two paths agree).
        // value is pre-cast to DECIMAL so the per-session sum is exact —
        // double addition order would differ between engines.
        val e = t(s, dir, "events")
          .withColumn("value", dec(col("value")))
        graft.streaming.EventStreaming.sessionizeBatch(e, "30 minutes")
          .select(
            col("user_id"),
            col("session_idx").cast("long").as("session_idx"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
            col("n_events"),
            col("sum_value").cast("double").as("sum_value"))
      },
      Some(s"""WITH ${sessionIslandsCte(">")}
              SELECT user_id, session_idx::BIGINT AS session_idx,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                count(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM sx GROUP BY user_id, session_idx"""),
      doc = "Sessionization: 30-min gap-and-island windows (batch = streaming semantics)"),

    Q(
      "w4_native_session",
      (s, dir) => {
        // the BUILT-IN operator for the same semantics: Spark's
        // session_window merges events within the gap into one window
        // whose end = last event + gap. w2 keeps the custom gap-and-island
        // form (it carries a session ordinal the built-in doesn't expose);
        // this is the plain-Spark path a user reaches for first, and the
        // two are cross-checked by sharing the events table and oracle
        // family. One shuffle on user_id, session merge inside the
        // aggregation — same profile as the streaming form.
        val e = t(s, dir, "events").withColumn("value", dec(col("value")))
        e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value")).as("sv"))
          .select(
            col("user_id"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
            col("n_events"),
            col("sv").cast("double").as("sum_value"))
      },
      // native session_window breaks at diff >= gap (an event landing
      // exactly on the window end opens a NEW session), unlike w2's
      // custom > gap contract — hence the comparator parameter
      Some(s"""WITH ${sessionIslandsCte(">=")}
              SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                count(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM sx GROUP BY user_id, session_idx"""),
      doc = "Sessionization 2: Spark's native session_window (end = last event + gap)"),

    Q(
      "w3_click_attribution",
      (s, dir) =>
        // interval self-join (batch form of the stream-stream join; the
        // range condition is what bounds streaming state). The purchase
        // and click sides filter one scan; Spark plans the equi-part on
        // user_id and evaluates the interval as a join residual.
        graft.streaming.EventStreaming.clickAttribution(
          t(s, dir, "events"), "30 minutes", "1 hour"),
      Some("""SELECT p.user_id, p.event_id AS purchase_id,
              c.event_id AS click_id, p.value AS amount
              FROM events p JOIN events c
              ON p.event_type = 'purchase' AND c.event_type = 'click'
              AND p.user_id = c.user_id
              AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts"""),
      doc = "Interval join: click->purchase attribution (stream-stream join, batch form)"),

    Q(
      "w1_tumbling_window",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec(col("value"))).cast("double").as("sum_value")),
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2"""),
      doc = "Tumbling time-window aggregation (batch form of the streaming op)")
  )
}
