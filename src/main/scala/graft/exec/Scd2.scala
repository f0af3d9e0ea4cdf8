package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from a change log — the
  * warehouse-side primitive a training-data pipeline needs the moment any
  * input table is mutable (entity metadata, licensing status, quality
  * labels): every key's attribute timeline as versioned rows with
  * `[valid_from, valid_to)` intervals and a current flag, so any past
  * corpus snapshot can be reproduced with a point-in-time predicate.
  *
  * Input: one row per observed change `(key, ts, tie, attr)`; `tie` breaks
  * equal timestamps (an event id in a raw log, a version number when
  * replaying an existing history). Consecutive no-op changes (same `attr`
  * as the key's previous row) are collapsed first — re-stating a value
  * does not open a new version.
  *
  * Scale shape: everything is windows over the SAME `(key; ts, tie)`
  * partitioning, so the whole build is ONE hash exchange on the natural
  * key; per-key streams are independent (no global sort), key cardinality
  * grows with the data (no fixed-parallelism window), and the second
  * window reuses the first's sort order. Verified by `cdc1_scd2_history`'s
  * checked-in plan fingerprint.
  */
object Scd2 {

  /** Build the SCD2 history frame:
    * `(key, version, tie, attr, valid_from, valid_to, is_current)` with
    * `version` 1-based per key in time order and `valid_to` null on the
    * open (current) version. The opening change's `tie` (its event id)
    * is kept on each version row: it is the provenance pointer back to
    * the raw log AND what lets `merge` replay a version with the exact
    * sort key the from-scratch build would use — replaying with a
    * synthetic tie (e.g. the version number) would let a batch row at
    * the same timestamp order against the synthetic value instead of
    * the original event's.
    */
  def history(changes: DataFrame, key: String, ts: String, tie: String,
      attr: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val collapsed = changes
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .drop("__prev")
    collapsed
      .select(
        col(key),
        row_number().over(w).cast("long").as("version"),
        col(tie),
        col(attr),
        col(ts).as("valid_from"),
        lead(col(ts), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incrementally merge a batch of new changes into an existing history —
    * the 100 TB path: the history is only touched through key joins (an
    * anti-join passes untouched keys through byte-identical; a semi-join
    * selects the touched keys' versions for rebuild), so merge cost scales
    * with the BATCH's key set, not the dimension's size. Requires every
    * batch change to be at-or-after the touched keys' last `valid_from`
    * (the append-only arrival order a change-data feed guarantees).
    *
    * The touched keys' existing versions replay as pseudo-changes
    * (`ts = valid_from`, `tie` = the version's ORIGINAL tie value, which
    * `history` carries precisely for this) unioned with the batch —
    * so a batch change landing at the same timestamp as an existing
    * version orders against that version's real event id, exactly as
    * the from-scratch build would order the two raw events. Because the
    * history is already no-op-collapsed, rebuilding from it is
    * equivalent to rebuilding from the raw log — `Scd2Spec` asserts the
    * merged result set-equals the from-scratch build, including the
    * equal-timestamp batch case.
    */
  def merge(history: DataFrame, batch: DataFrame, key: String, ts: String,
      tie: String, attr: String): DataFrame = {
    val touched = batch.select(col(key)).distinct()
    val untouched = history.join(touched, Seq(key), "left_anti")
    val replay = history.join(touched, Seq(key), "left_semi")
      .select(col(key), col("valid_from").as(ts), col(tie), col(attr))
    val rebuilt = Scd2.history(
      replay.unionByName(batch.select(col(key), col(ts), col(tie), col(attr))),
      key, ts, tie, attr)
    untouched.unionByName(rebuilt)
  }
}
