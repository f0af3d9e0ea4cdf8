package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format sources (SURVEY.md §2.1).
  *
  * S1/S2 — header-row CSV / TSV scans with the reference's header hygiene
  * (trim header cells, drop unnamed columns; reference
  * etl/target/c3dc_etl.py:509-514,540-544) and the synthetic audit column
  * `source_file_row_num` (reference :646).
  *
  * S3/S4 — XLSX ingest contract: offline build has no POI, so a workbook
  * is a directory of per-tab CSVs named `{tab}.csv` (exactly what the
  * reference's own data_pivoter emits for JSON; SURVEY.md §7.4). S4's
  * blank-id row drop (reference etl/ccdi/c3dc_etl.py:513) is
  * [[dropBlankId]].
  *
  * S5 — JSON document-directory scan: one `{upi}.json` per subject read
  * with an explicit nested schema (never inference — a 100 TB directory
  * cannot be sampled), file provenance from the `_metadata` column
  * (reference etl/mci/c3dc_etl.py:903-1032).
  *
  * C5 — all-blank row drop (reference etl/target/c3dc_etl.py:1542-1545).
  *
  * Scale notes: CSV/TSV/JSON scans are splittable native Spark sources —
  * filters and column pruning push down, partitioning follows
  * `spark.sql.files.maxPartitionBytes`. The audit row number is a per-file
  * window (files are the reference's unit of provenance); study-scale
  * sources are thousands of rows, so each window partition is tiny. For
  * scans where per-file ordinals are not needed, pass `audit = false` and
  * no shuffle happens at all.
  */
object SourceReader {

  val AuditCol = "source_file_row_num"
  val FileCol = "source_file"

  /** S1: header-row CSV → DataFrame with header hygiene + provenance. */
  def csv(
      spark: SparkSession,
      path: String,
      sep: String = ",",
      schema: Option[StructType] = None,
      audit: Boolean = true): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("sep", sep)
    val read = schema.fold(base.option("inferSchema", "false"))(base.schema)
      .csv(path)
    withProvenance(hygiene(read), audit)
  }

  /** S2: tab-delimited scan. */
  def tsv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      audit: Boolean = true): DataFrame =
    csv(spark, path, sep = "\t", schema = schema, audit = audit)

  /** S3/S4: a "workbook" directory of `{tab}.csv` files → tab name → frame.
    * Driver-side listing (plan-time catalog work, like the reference's tab
    * inference); each tab is its own splittable CSV scan.
    */
  def workbookDir(spark: SparkSession, dir: String, audit: Boolean = true): Map[String, DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tabs = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".csv"))
      .map(_.getPath)
      .sortBy(_.getName)
    tabs.map { tp =>
      tp.getName.stripSuffix(".csv") -> csv(spark, tp.toString, audit = audit)
    }.toMap
  }

  /** S3/S4 native XLSX entry point: a path ending in `.xlsx` is converted
    * driver-side ([[XlsxConverter]], `data_only` semantics) into a scratch
    * `{tab}.csv` directory and scanned through [[workbookDir]]; anything
    * else is assumed to already BE such a directory. Study workbooks are
    * MB-scale ingest edges — the distributed scan starts at the CSVs.
    *
    * A REMOTE workbook (`http(s)://`, `hdfs://`, `s3a://`, `file://`) is
    * fetched whole to a local temp file first — `java.util.zip.ZipFile`
    * needs a local seekable file — mirroring the reference's file manager,
    * which downloads remote workbooks before opening them
    * (file_manager/c3dc_file_manager.py:210-225).
    *
    * Scratch hygiene: each tab frame is eagerly materialized
    * (`localCheckpoint`) so the scratch CSVs and the fetched copy can be
    * deleted BEFORE returning — a long-lived JVM running many studies must
    * not accumulate scratch dirs until exit. Tabs are MB-scale, so the
    * materialization is a per-tab block write, not a data-scale cost.
    */
  def workbook(spark: SparkSession, path: String, audit: Boolean = true): Map[String, DataFrame] =
    if (path.toLowerCase.endsWith(".xlsx")) {
      val fetched =
        if (path.contains("://")) {
          val f = java.nio.file.Files.createTempFile("graft_wb_", ".xlsx")
          java.nio.file.Files.write(f, FileFetcher.fetchBytes(path))
          Some(f)
        } else None
      val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx_")
      try {
        XlsxConverter.convert(fetched.map(_.toString).getOrElse(path), tmp.toString)
        workbookDir(spark, tmp.toString, audit)
          .map { case (tab, df) => tab -> df.localCheckpoint(true) }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        fetched.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    } else workbookDir(spark, path, audit)

  /** S4: drop rows whose `{tab}_id` is blank (CCDI per-tab filter). */
  def dropBlankId(df: DataFrame, tab: String): DataFrame =
    df.filter(nonBlank(col(s"${tab}_id")))

  /** S5: JSON document directory with an EXPLICIT schema + provenance.
    * `multiLine = true` because each document is one pretty-printed JSON
    * object, not JSON-lines.
    */
  def jsonDocs(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    withProvenance(
      spark.read.schema(schema).option("multiLine", "true").json(dir),
      audit = false)

  /** C5: drop rows where every (string-typed) source column is blank. */
  def dropBlankRows(df: DataFrame): DataFrame = {
    val cols = df.columns.filterNot(c => c == AuditCol || c == FileCol)
    if (cols.isEmpty) df
    else df.filter(cols.map(c => nonBlank(col(c))).reduce(_ || _))
  }

  private def nonBlank(c: Column): Column = c.isNotNull && trim(c.cast("string")) =!= ""

  /** Header hygiene: trim header-cell whitespace; drop columns the header
    * did not name (Spark materializes blank header cells as `_cN`).
    */
  private def hygiene(df: DataFrame): DataFrame = {
    val keep = df.columns.filterNot(_.matches("_c\\d+"))
    df.select(keep.map(c => col(s"`$c`").as(c.trim)).toIndexedSeq: _*)
  }

  /** File provenance + per-file audit row number. The ordinal follows the
    * physical read order within each file (monotonically_increasing_id is
    * ascending within and across a file's split partitions), matching the
    * reference's row numbering of sequential file reads.
    */
  private def withProvenance(df: DataFrame, audit: Boolean): DataFrame = {
    val withFile = df.withColumn(FileCol, col("_metadata.file_path"))
    if (!audit) withFile
    else withFile.withColumn(
      AuditCol,
      row_number().over(
        Window.partitionBy(col(FileCol)).orderBy(monotonically_increasing_id())))
  }
}
