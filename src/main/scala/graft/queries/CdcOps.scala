package graft.queries

import org.apache.spark.sql.functions._

import graft.exec.Scd2
import Tables.t

/** Change-data-capture operators over the `events` change log: SCD2
  * history build and incremental history merge (exec/Scd2).
  *
  * The "tier" attribute is a deterministic bucketing of the event value so
  * both engines derive the identical change stream from the raw log.
  */
object CdcOps {

  private def tierExpr = when(col("value") < 5, "bronze")
    .when(col("value") < 15, "silver").otherwise(lit("gold"))

  private val TierSql =
    "CASE WHEN value < 5 THEN 'bronze' WHEN value < 15 THEN 'silver' ELSE 'gold' END"

  def qs: Seq[Q] = Seq(
    Q(
      "cdc1_scd2_history",
      (s, dir) => {
        // SCD2 HISTORY BUILD: each user's signup-tier timeline as
        // versioned [valid_from, valid_to) rows. One hash exchange on the
        // natural key; both windows share its partitioning. See exec/Scd2.
        val changes = t(s, dir, "events")
          .filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id"), tierExpr.as("tier"))
        Scd2.history(changes, "user_id", "ts", "event_id", "tier")
      },
      Some(s"""WITH chg AS (SELECT user_id, ts, event_id, $TierSql AS tier
                FROM events WHERE event_type = 'signup'),
              dedup AS (SELECT user_id, ts, event_id, tier FROM (
                SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM chg) WHERE prev IS NULL OR prev <> tier)
              SELECT user_id,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
                event_id, tier, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
                (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
              FROM dedup"""),
      doc = "CDC: SCD2 versioned history from a change log (no-op collapse, one exchange)"),

    Q(
      "cdc2_scd2_merge",
      (s, dir) => {
        // INCREMENTAL SCD2 MERGE: apply the late slice of the log to the
        // history built from the early slice. The existing history is
        // touched only through key joins — untouched keys pass through
        // byte-identical without re-windowing — so merge cost follows the
        // batch, not the dimension. Oracle = the from-scratch build over
        // the whole log, which the merge must equal exactly.
        val all = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"), tierExpr.as("tier"))
        val cut = to_timestamp(lit("2024-01-20 00:00:00"))
        val hist = Scd2.history(all.filter(col("ts") < cut),
          "user_id", "ts", "event_id", "tier")
        Scd2.merge(hist, all.filter(col("ts") >= cut),
          "user_id", "ts", "event_id", "tier")
      },
      Some(s"""WITH chg AS (SELECT user_id, ts, event_id, $TierSql AS tier
                FROM events WHERE event_type = 'click'),
              dedup AS (SELECT user_id, ts, event_id, tier FROM (
                SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM chg) WHERE prev IS NULL OR prev <> tier)
              SELECT user_id,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
                event_id, tier, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
                (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
              FROM dedup"""),
      doc = "CDC: incremental SCD2 merge == from-scratch rebuild (key-join-bounded)"))
}
