package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Scan / projection / filter / aggregation basics (SURVEY.md §2.1, §2.6).
  *
  * Numeric policy for oracle parity: money-like double columns are cast to
  * DECIMAL(18,2) BEFORE aggregation (exact arithmetic, partition-order
  * independent) and the final value is cast back to DOUBLE — bit-stable on
  * both Spark and DuckDB regardless of partitioning / AQE.
  */
object CoreOps {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  def qs: Seq[Q] = Seq(
    Q(
      "s1_scan_prune",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 45)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date")),
      Some("""SELECT l_orderkey, l_linenumber,
              strftime(l_shipdate, '%Y-%m-%d') AS ship_date
              FROM lineitem WHERE l_quantity > 45"""),
      doc = "S1: parquet scan with filter+projection pushdown"),

    Q(
      "q1_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
              COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus"""),
      doc = "A3/A6-style pricing summary (TPC-H Q1 shape); exact decimal agg"),

    Q(
      "dl1_zorder_curve",
      (s, dir) => {
        // Z-ORDER CLUSTERING KEY (sink/TableLayout.zorderValue): the
        // Morton interleave of (customer, order-day) that writeZOrdered
        // clusters files on, so 2-D box predicates prune on BOTH axes.
        // Pure constant-folded long arithmetic inside the scan's codegen
        // span; the oracle evaluates the identical 32-term sum. ZOrderSpec
        // measures the file-pruning payoff of the layout itself.
        val x = col("o_custkey")
        // o_orderdate is parquet NTZ micros; the UTC-pinned session makes
        // the TIMESTAMP cast value-preserving (same contract as Tables.t).
        // `div` = exact integer floor division, like the oracle's `//`.
        val y = expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        t(s, dir, "orders").select(
          col("o_orderkey"),
          x.as("x"),
          y.as("y"),
          graft.sink.TableLayout.zorderValue(x, y).as("z"))
      },
      Some {
        val terms = (0 until 16).map(i =>
          s"(((x >> $i) & 1) * ${1L << (2 * i)}) + (((y >> $i) & 1) * ${1L << (2 * i + 1)})")
          .mkString(" + ")
        s"""WITH d AS (SELECT o_orderkey, o_custkey AS x,
                epoch(o_orderdate)::BIGINT // 86400 AS y
              FROM orders)
            SELECT o_orderkey, x, y, ($terms)::BIGINT AS z FROM d"""
      },
      doc = "Layout: Morton/Z-order clustering value, bit-identical to the SQL oracle")
  )
}
