package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) value of two 16-bit dimension keys: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Pure long arithmetic —
    * 32 constant-folded shift/mask terms, fully codegen'd, and exactly
    * reproducible in ANSI SQL (the `dl1_zorder_curve` oracle evaluates
    * the identical term sum in DuckDB).
    *
    * Inputs must already be bucketed into [0, 65536) — callers map raw
    * keys with `% 65536`, a day-number, a range bucket, etc.
    */
  def zorderValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Persist `df` clustered on the Z-curve of two dimension keys: range-
    * partition + sort by the interleaved value, so each output file covers
    * a compact RECTANGLE of (x, y) space instead of a stripe of one
    * dimension. Parquet min/max stats on BOTH columns then prune files/
    * row groups for 2-D box predicates — a linear sort layout can only
    * ever prune its leading column, and a predicate on the other dimension
    * touches every file. At 100 TB this is the difference between reading
    * a tile and reading the lake for queries that slice on two axes
    * (entity × time being the canonical pair). `ZOrderSpec` measures the
    * file-level pruning on both layouts.
    */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
      x: Column, y: Column): Unit = {
    val zc = zorderValue(x, y).as("__z")
    df.withColumn("__z", zc)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction — the table-maintenance pass every streaming
    * or highly-parallel writer eventually needs: thousands of KB-sized
    * parquet files turn each scan into a footer-listing storm and starve
    * the row-group machinery. Rewrites the dataset into
    * ceil(bytes / targetFileBytes) files (size from the filesystem
    * listing, no data pass), staged then swapped in via two renames.
    *
    * The swap is NOT atomic for concurrent readers: between the two
    * renames there is a moment with no data directory, and a reader
    * that listed files before the swap can lose them after it — a
    * plain-directory layout fundamentally cannot do better (true
    * reader-transparent compaction needs a manifest/table format, e.g.
    * the HarmonizedJsonSink doc-pointer pattern). What IS guaranteed:
    * a crash mid-swap never loses data — the failed second rename is
    * rolled back in-process, and a crash that defeats even the
    * rollback leaves the full pre-image under `__compact_old`, which
    * the next compact() restores before doing anything else.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long): (Int, Int) = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(new java.net.URI(path match {
      case p if p.contains("://") => p
      case p => s"file://$p"
    }), spark.sparkContext.hadoopConfiguration)
    val target = new HPath(path)
    val old = new HPath(path + "__compact_old")
    // repair a previous run's torn swap before touching anything: if the
    // dataset dir is gone but the pre-image survives, restore it; if
    // both exist the old swap completed and the pre-image is debris
    if (fs.exists(old)) {
      if (!fs.exists(target))
        require(fs.rename(old, target), s"compact: cannot restore $old")
      else {
        // both present: treat __compact_old as debris ONLY if the target
        // really holds a parquet dataset — a torn swap whose rollback
        // also failed can leave a half-written stage at target, and
        // deleting old there would destroy the only pre-image
        val targetHasData = fs.listStatus(target).exists(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet") && s.getLen > 0)
        require(targetHasData,
          s"compact: both $target and $old exist but $target has no parquet " +
            s"files — refusing to delete the pre-image; repair manually")
        fs.delete(old, true)
      }
    }
    val parts = fs.listStatus(target).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val stage = new HPath(path + "__compact_stage")
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(stage.toString)
    require(fs.rename(target, old), s"compact: cannot stage out $path")
    try require(fs.rename(stage, target), s"compact: cannot swap in $stage")
    catch {
      case e: Throwable =>
        // put the pre-image back so an in-process failure never leaves
        // the dataset path empty. If the swap-in failed because something
        // now occupies target, this rollback fails too — that must be
        // LOUD (the pre-image survives under __compact_old and the next
        // compact()'s repair branch needs to see an intact target before
        // it treats old as debris), not a silent boolean drop.
        if (!fs.rename(old, target))
          System.err.println(
            s"[TableLayout] rollback rename $old -> $target FAILED; " +
              s"pre-image remains at $old for the next compact()'s repair")
        throw e
    }
    fs.delete(old, true)
    (parts.length, nOut)
  }
}
