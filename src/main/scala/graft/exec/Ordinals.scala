package graft.exec

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Global 0-based ordinals consistent with an ORDER BY, without collapsing
  * to a single partition.
  *
  * A `row_number()` window with no PARTITION BY moves every row through one
  * task — the exact shape the plan-regression harness exists to reject. The
  * scalable equivalent is the classic two-pass zip-with-index: range-
  * repartition on the sort key, sort within partitions, count rows per
  * partition (one lightweight job), then attach `partitionOffset + localIdx`
  * in a single per-partition pass. `RDD.zipWithIndex` implements exactly
  * that two-pass contract; this is one of the rare genuinely per-partition
  * imperative steps where the RDD API is the right tool (builder prompt's
  * clause (d)).
  */
object Ordinals {

  /** `df` plus an `out` column holding the row's global position under
    * ORDER BY `key` ASC NULLS FIRST, then `tiebreak` columns. Without a
    * total order (unique key, or tiebreaks covering the row) ties fall
    * to the range partitioner's internal order and the ordinal is NOT
    * stable across runs — callers that promise reproducible output must
    * pass one.
    */
  def withOrdinal(df: DataFrame, key: String, out: String,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    val k: Column = col("`" + key + "`").asc_nulls_first
    val ks = k +: tiebreak.map(_.asc_nulls_first)
    val sorted = df.repartitionByRange(ks: _*).sortWithinPartitions(ks: _*)
    val schema2 = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema2)
  }
}
