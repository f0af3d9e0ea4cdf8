package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics of t11_line_dedup on a hand-built corpus: the spliced
  * boilerplate line vanishes everywhere, a line shared by two documents
  * is dropped from BOTH (the C4 rule — every occurrence goes, not
  * keep-one), unique lines survive, and reassembly preserves document
  * order byte-exactly (asserted through the kept-text md5).
  */
class LineDedupSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("t11docs").toString
    // 16 tokens = two 8-token lines after the 8-token boilerplate line;
    // docs 1 and 2 share their first organic line, doc 3 is all-unique
    Seq(
      (1L, "a b c d e f g h i j k l m n o p", "en", "src0"),
      (2L, "a b c d e f g h z1 z2 z3 z4 z5 z6 z7 z8", "en", "src0"),
      (3L, "q r s t u v w x", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val result: Map[Long, (Long, String)] =
    Registry.byName("t11_line_dedup").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("boilerplate and cross-doc repeated lines are dropped from every doc") {
    // each doc loses the boilerplate; docs 1 and 2 also lose "a..h"
    assert(result(1L)._1 == 1L)
    assert(result(2L)._1 == 1L)
    assert(result(3L)._1 == 1L)
  }

  test("survivors reassemble in document order, byte-exactly") {
    assert(result(1L)._2 == md5hex("i j k l m n o p"))
    assert(result(2L)._2 == md5hex("z1 z2 z3 z4 z5 z6 z7 z8"))
    assert(result(3L)._2 == md5hex("q r s t u v w x"))
  }

  test("a doc whose every line repeats disappears entirely") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("t11all").toString
    Seq(
      (1L, "a b c d e f g h", "en", "src0"),
      (2L, "a b c d e f g h", "en", "src0"),
      (3L, "u v w x y z a1 a2", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.byName("t11_line_dedup").fn(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 2 are boilerplate + a repeated line -> nothing kept
    assert(out == Map(3L -> 1L))
  }
}
