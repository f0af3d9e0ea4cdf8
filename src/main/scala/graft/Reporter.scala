package graft

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.FileFetcher

/** Standalone harmonized-data reporter CLI — the delivery-report tool
  * (reference etl/harmonized_data_reporter/harmonized_data_reporter.py:96-125):
  * for each configured (study → harmonized JSON doc), one report row of
  * per-node record counts; the rows become a CSV whose header is `study`
  * plus the union of node names in first-seen order (csv.DictWriter
  * semantics: missing cells empty, `\r\n` row terminator, minimal quoting).
  *
  * Two input shapes per file entry:
  *  - a harmonized JSON DOCUMENT (K1 `document` mode / the reference's
  *    output): parsed driver-side, count = each top-level array's length,
  *    node order = document key order — study-scale artifacts, same
  *    in-memory read the reference does;
  *  - a DIRECTORY (K1 `writeDistributed` mode — the 100 TB path): each
  *    child directory is a node's JSON-lines dataset and its count is a
  *    distributed `spark.read.textFile(...).count()` — the report stays
  *    cheap even when the harmonized output no longer fits on the driver.
  *
  * Usage (either form):
  *   runMain graft.Reporter <config.env>
  *   runMain graft.Reporter <out.csv> <study>=<path> [<study>=<path> ...]
  * The config form mirrors the reference's `.env` contract:
  * `HARMONIZED_DATA_FILES` = JSON object of study → path,
  * `REPORT_OUTPUT_PATH` = CSV destination (default
  * `./harmonized_data_report.csv`). Paths resolve through the Hadoop
  * FileSystem / http(s) fetch (S8), so `s3a://` works unchanged.
  */
object Reporter {

  private val mapper = new ObjectMapper()

  /** Per-node counts of one harmonized JSON document, document key order;
    * non-array top-level values count like the reference's `len(...)`
    * would fail — we count only arrays and objects (len of a dict), the
    * shapes the harmonized doc contract allows.
    */
  def documentCounts(json: String): Seq[(String, Long)] = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject,
      "harmonized data file must be a JSON object of node -> records")
    root.properties().asScala.toSeq.map { e =>
      e.getKey -> e.getValue.size().toLong
    }
  }

  /** Per-node counts of a `writeDistributed` output dir: child dir name →
    * distributed line count, name-sorted for determinism.
    */
  def directoryCounts(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
      .map { nodeDir =>
        nodeDir.getName -> spark.read.textFile(nodeDir.toString).count()
      }.toSeq
  }

  /** One report row per (study, path), reference row shape:
    * `study` column first, then that file's node counts.
    */
  def reportRows(spark: SparkSession, files: Seq[(String, String)]): Seq[Seq[(String, String)]] =
    files.map { case (study, path) =>
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val counts =
        if (!path.toLowerCase.startsWith("http") && fs.exists(p) &&
            fs.getFileStatus(p).isDirectory)
          directoryCounts(spark, path)
        else documentCounts(FileFetcher.fetchString(path))
      ("study" -> study) +: counts.map { case (n, c) => n -> c.toString }
    }

  /** csv.DictWriter rendering: header = union of keys in first-seen order,
    * missing cells empty, minimal quoting, CRLF row terminator.
    */
  def toCsv(rows: Seq[Seq[(String, String)]]): String = {
    val header = rows.foldLeft(Vector.empty[String]) { (acc, row) =>
      row.map(_._1).foldLeft(acc)((a, k) => if (a.contains(k)) a else a :+ k)
    }
    def cell(v: String): String =
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    val lines = header.map(cell).mkString(",") +:
      rows.map { row =>
        val m = row.toMap
        header.map(k => cell(m.getOrElse(k, ""))).mkString(",")
      }
    lines.mkString("", "\r\n", "\r\n")
  }

  def writeReport(spark: SparkSession, files: Seq[(String, String)], outPath: String): Unit = {
    val csv = toCsv(reportRows(spark, files))
    val p = new Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, /* overwrite = */ true)
    try out.write(csv.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Minimal `.env` parse (KEY=VALUE lines, `#` comments, optional
    * single/double quotes around the value) — enough for the reference's
    * two keys; values may contain `=`.
    */
  private[graft] def parseEnv(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        val k = l.take(i).trim
        val raw = l.drop(i + 1).trim
        val v =
          if (raw.length >= 2 &&
              ((raw.head == '"' && raw.last == '"') || (raw.head == '\'' && raw.last == '\'')))
            raw.substring(1, raw.length - 1)
          else raw
        k -> v
      }.toMap

  private[graft] def filesFromJson(json: String): Seq[(String, String)] = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "HARMONIZED_DATA_FILES must be a JSON object")
    root.properties().asScala.toSeq.map(e => e.getKey -> e.getValue.asText())
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-reporter")
    try {
      val (files, outPath) = args match {
        case Array(cfgPath) =>
          val cfg = parseEnv(FileFetcher.fetchString(cfgPath))
          val files = filesFromJson(cfg.getOrElse("HARMONIZED_DATA_FILES", "{}"))
          require(files.nonEmpty,
            "No harmonized data files specified for inclusion in report")
          (files, cfg.getOrElse("REPORT_OUTPUT_PATH", "./harmonized_data_report.csv"))
        case a if a.length >= 2 =>
          val files = a.tail.toSeq.map { s =>
            val i = s.indexOf('=')
            require(i > 0, s"expected <study>=<path>, got: $s")
            s.take(i) -> s.drop(i + 1)
          }
          (files, a.head)
        case _ =>
          throw new IllegalArgumentException(
            "usage: graft.Reporter <config.env> | graft.Reporter <out.csv> <study>=<path> ...")
      }
      writeReport(spark, files, outPath)
      println(s"[reporter] wrote ${outPath} (${files.size} studies)")
    } finally spark.stop()
  }
}
