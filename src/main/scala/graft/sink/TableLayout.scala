package graft.sink

import org.apache.spark.sql.DataFrame

/** Physical table layout for scale: bucketing (co-located joins) and
  * hive-style partitioning (pruned scans).
  *
  * - Writing both sides of a repeated equi-join bucketed (and in-bucket
  *   sorted) by the join key makes every subsequent join on that key
  *   EXCHANGE-FREE: each task merge-joins bucket i with bucket i, no
  *   shuffle of either side, no sort at read time. At 100 TB this
  *   converts the single largest network cost of a repeated pipeline
  *   (fact↔fact linkage like J1 observation↔participant) into a one-time
  *   write-layout cost.
  * - Writing partitioned by a low-cardinality filter column turns
  *   predicate pushdown into DIRECTORY pruning: a filtered read lists and
  *   scans only the matching partition dirs — at 100 TB, the difference
  *   between scanning a shard and scanning the lake.
  *
  * TableLayoutSpec machine-checks both plan shapes (no Exchange for the
  * bucketed join; partition-filter pruning for the partitioned scan).
  */
object TableLayout {

  /** Persist `df` as a parquet table bucketed + sorted by `key`.
    * `buckets` should approximate (table size / healthy partition size)
    * and MUST match on both sides of the intended join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Persist `df` as parquet partitioned by `partCol` (hive layout:
    * one directory per value). Choose a column that (a) appears in most
    * filters and (b) has bounded cardinality — high-cardinality partition
    * columns produce a small-files explosion instead of pruning.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
}
