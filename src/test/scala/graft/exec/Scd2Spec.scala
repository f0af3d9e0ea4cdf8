package graft.exec

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkTestBase {
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changes(rows: (Long, String, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.map { case (k, t, tie, a) => (k, ts(t), tie, a) }
      .toDF("user_id", "ts", "event_id", "tier")
  }

  test("no-op changes collapse: re-stating a value opens no version") {
    val h = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 1L, "bronze"),
      (1L, "2024-01-02 00:00:00", 2L, "bronze"), // no-op
      (1L, "2024-01-03 00:00:00", 3L, "silver"),
      (1L, "2024-01-04 00:00:00", 4L, "silver"), // no-op
      (1L, "2024-01-05 00:00:00", 5L, "bronze")),
      "user_id", "ts", "event_id", "tier")
      .orderBy("version").collect()
    assert(h.map(_.getAs[String]("tier")).toSeq == Seq("bronze", "silver", "bronze"))
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    assert(h.count(_.getAs[Boolean]("is_current")) == 1)
    // intervals chain: each valid_to equals the next valid_from
    assert(h(0).getAs[Timestamp]("valid_to") == h(1).getAs[Timestamp]("valid_from"))
    assert(h(1).getAs[Timestamp]("valid_to") == h(2).getAs[Timestamp]("valid_from"))
    assert(h(2).getAs[Timestamp]("valid_to") == null)
  }

  test("ties on ts break by tie column") {
    val h = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 2L, "silver"),
      (1L, "2024-01-01 00:00:00", 1L, "bronze")),
      "user_id", "ts", "event_id", "tier").orderBy("version").collect()
    assert(h.map(_.getAs[String]("tier")).toSeq == Seq("bronze", "silver"))
  }

  test("incremental merge set-equals the from-scratch rebuild (real log)") {
    val all = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("value") < 5, "bronze").when(col("value") < 15, "silver")
          .otherwise(lit("gold")).as("tier"))
    val cut = to_timestamp(lit("2024-01-20 00:00:00"))
    val full = Scd2.history(all, "user_id", "ts", "event_id", "tier")
    val merged = Scd2.merge(
      Scd2.history(all.filter(col("ts") < cut), "user_id", "ts", "event_id", "tier"),
      all.filter(col("ts") >= cut), "user_id", "ts", "event_id", "tier")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("merge orders an equal-timestamp batch change by real event id") {
    // batch event 5 lands at the SAME ts as the key's last version
    // (opened by event 10): event-id order puts the batch's gold BEFORE
    // silver, so the true timeline is bronze→gold→silver. A replay that
    // substituted version numbers for ties would compare 2 (silver's
    // version) against 5 (the batch event id), order silver first, and
    // yield bronze→silver→gold — diverging from the from-scratch build.
    val hist = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 1L, "bronze"),
      (1L, "2024-01-05 00:00:00", 10L, "silver")),
      "user_id", "ts", "event_id", "tier")
    val batch = changes((1L, "2024-01-05 00:00:00", 5L, "gold"))
    val merged = Scd2.merge(hist, batch, "user_id", "ts", "event_id", "tier")
    val scratch = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 1L, "bronze"),
      (1L, "2024-01-05 00:00:00", 10L, "silver"),
      (1L, "2024-01-05 00:00:00", 5L, "gold")),
      "user_id", "ts", "event_id", "tier")
    assert(merged.exceptAll(scratch).isEmpty && scratch.exceptAll(merged).isEmpty)
    assert(merged.orderBy("version").collect().map(_.getAs[String]("tier")).toSeq
      == Seq("bronze", "gold", "silver"))
  }

  test("history carries each version's opening event id") {
    val h = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 3L, "bronze"),
      (1L, "2024-01-02 00:00:00", 7L, "bronze"), // no-op: version keeps 3
      (1L, "2024-01-03 00:00:00", 9L, "silver")),
      "user_id", "ts", "event_id", "tier").orderBy("version").collect()
    assert(h.map(_.getAs[Long]("event_id")).toSeq == Seq(3L, 9L))
  }

  test("merge collapses a batch change that re-states the current value") {
    val hist = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 1L, "bronze")),
      "user_id", "ts", "event_id", "tier")
    val batch = changes((1L, "2024-02-01 00:00:00", 9L, "bronze"))
    val m = Scd2.merge(hist, batch, "user_id", "ts", "event_id", "tier").collect()
    assert(m.length == 1 && m.head.getAs[Long]("version") == 1L)
  }

  test("merge leaves untouched keys byte-identical and rebuilds touched ones") {
    val hist = Scd2.history(changes(
      (1L, "2024-01-01 00:00:00", 1L, "bronze"),
      (2L, "2024-01-01 00:00:00", 2L, "gold")),
      "user_id", "ts", "event_id", "tier")
    val batch = changes((2L, "2024-02-01 00:00:00", 9L, "silver"))
    val m = Scd2.merge(hist, batch, "user_id", "ts", "event_id", "tier")
    val k1 = m.filter(col("user_id") === 1).collect()
    assert(k1.length == 1 && k1.head.getAs[Boolean]("is_current"))
    val k2 = m.filter(col("user_id") === 2).orderBy("version").collect()
    assert(k2.map(_.getAs[String]("tier")).toSeq == Seq("gold", "silver"))
    assert(!k2(0).getAs[Boolean]("is_current") && k2(1).getAs[Boolean]("is_current"))
  }
}
