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
      doc = "A3/A6-style pricing summary (TPC-H Q1 shape); exact decimal agg")
  )
}
