package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** S1/S2/S4/S5/C5 source-scan semantics (SURVEY.md §2.1): header hygiene,
  * audit row numbers, per-tab workbook dirs with blank-id drops, explicit-
  * schema JSON document directories, all-blank row filtering.
  */
class SourceReaderSpec extends SparkTestBase {

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes("UTF-8"))

  test("S1 csv: trimmed headers, unnamed column dropped, audit row numbers per file") {
    val d = tmpDir("s1")
    write(d, "a.csv", " Subject ID ,Gender,\nP1,F,x\nP2,M,y\n")
    write(d, "b.csv", " Subject ID ,Gender,\nP3,F,z\n")
    val df = SourceReader.csv(spark, d.toString)
    assert(df.columns.toSet ==
      Set("Subject ID", "Gender", SourceReader.FileCol, SourceReader.AuditCol))
    val rows = df.select(col("Subject ID"), col(SourceReader.AuditCol),
      element_at(split(col(SourceReader.FileCol), "/"), -1).as("f"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set(("P1", 1, "a.csv"), ("P2", 2, "a.csv"), ("P3", 1, "b.csv")))
  }

  test("S2 tsv: tab separator handled") {
    val d = tmpDir("s2")
    write(d, "t.tsv", "id\tval\n1\ta b\n")
    val df = SourceReader.tsv(spark, d.toString)
    assert(df.select("val").collect().map(_.getString(0)).toSeq == Seq("a b"))
  }

  test("S3/S4 workbookDir: one frame per {tab}.csv; blank-id rows dropped") {
    val d = tmpDir("s4")
    write(d, "participant.csv", "participant_id,sex\nP1,F\n ,M\nP2,M\n")
    write(d, "diagnosis.csv", "diagnosis_id,code\nD1,C71.9\n")
    write(d, "notes.txt", "not a tab")
    val tabs = SourceReader.workbookDir(spark, d.toString)
    assert(tabs.keySet == Set("participant", "diagnosis"))
    val part = SourceReader.dropBlankId(tabs("participant"), "participant")
    assert(part.select("participant_id").collect().map(_.getString(0)).toSet == Set("P1", "P2"))
  }

  test("S5 jsonDocs: explicit nested schema, multiLine docs, file provenance") {
    val d = tmpDir("s5")
    write(d, "SUBJ1.json",
      """{ "upi": "SUBJ1",
            "forms": [ { "form_id": "DEMOGRAPHY",
                         "data": [ { "form_field_id": "DM_BRTHDAT", "value": "-7300" },
                                   { "form_field_id": "DM_BRTHDAT", "value": "-7300" } ] } ] }""")
    write(d, "SUBJ2.json",
      """{ "upi": "SUBJ2", "forms": [] }""")
    val schema = StructType(Seq(
      StructField("upi", StringType),
      StructField("forms", ArrayType(StructType(Seq(
        StructField("form_id", StringType),
        StructField("data", ArrayType(StructType(Seq(
          StructField("form_field_id", StringType),
          StructField("value", StringType)))))))))))
    val df = SourceReader.jsonDocs(spark, d.toString, schema)
    assert(df.count() == 2)
    // duplicate form_field_id entries survive as separate array elements
    // (the reference's dup-key collation; here the array IS the collation)
    val n = df.filter(col("upi") === "SUBJ1")
      .select(size(flatten(col("forms.data")))).head().getInt(0)
    assert(n == 2)
    assert(df.columns.contains(SourceReader.FileCol))
  }

  test("S3 remote workbook: .xlsx over http is fetched, scanned, scratch cleaned") {
    // the reference's file manager downloads remote workbooks before
    // opening them (c3dc_file_manager.py:210-225); ZipFile needs a local
    // seekable file, so an http:// workbook used to crash here
    val xlsx = Files.createTempFile("remote_wb", ".xlsx")
    graft.TestXlsx.write(xlsx, Seq(
      "participant" -> Seq(
        Seq("participant_id", "sex"), Seq("P1", "F"), Seq("P2", "M")),
      "diagnosis" -> Seq(Seq("diagnosis_id", "code"), Seq("D1", "C71.9"))))
    val bytes = Files.readAllBytes(xlsx)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/study.xlsx", exchange => {
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      def scratchDirs(): Set[String] = {
        import scala.jdk.CollectionConverters._
        Files.list(tmpRoot).iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("graft_xlsx_") || n.startsWith("graft_wb_"))
          .toSet
      }
      val before = scratchDirs()
      val tabs = SourceReader.workbook(
        spark, s"http://127.0.0.1:${server.getAddress.getPort}/study.xlsx")
      assert(tabs.keySet == Set("participant", "diagnosis"))
      // frames are materialized: usable AFTER the scratch csvs are gone
      assert(scratchDirs() == before, "scratch not cleaned eagerly")
      assert(tabs("participant").select("participant_id")
        .collect().map(_.getString(0)).toSet == Set("P1", "P2"))
      assert(tabs("diagnosis").select("code")
        .collect().map(_.getString(0)).toSeq == Seq("C71.9"))
    } finally {
      server.stop(0)
      Files.deleteIfExists(xlsx)
    }
  }

  test("C5 dropBlankRows: all-blank source rows removed, partial rows kept") {
    val d = tmpDir("c5")
    write(d, "x.csv", "a,b\n , \nv, \n,w\n")
    val df = SourceReader.csv(spark, d.toString)
    val kept = SourceReader.dropBlankRows(df)
      .select(coalesce(col("a"), lit("∅")), coalesce(col("b"), lit("∅")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("v", " "), ("∅", "w")))
  }
}
