package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FileBloomIndexSpec extends SparkTestBase {

  test("bloom index prunes point lookups to few files, result exact") {
    val dir = Files.createTempDirectory("bloomidx").toString
    val data = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    // a layout NOT sorted on the probe column's value clusters: range-
    // partition by orderkey so each key lives in exactly one of 16 files
    data.repartitionByRange(16, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/data")
    FileBloomIndex.build(spark, s"$dir/data", "o_orderkey", s"$dir/idx",
      expectedPerFile = 10000L, fpp = 0.01)

    val keys = Seq(5L, 7000L, 14500L)
    val cand = FileBloomIndex.candidateFiles(spark, s"$dir/idx", keys)
    val total = spark.read.parquet(s"$dir/data")
      .select(input_file_name()).distinct().count()
    assert(total == 16)
    assert(cand.size <= 6, s"expected few candidate files, got ${cand.size}")

    val viaIndex = FileBloomIndex
      .lookup(spark, s"$dir/data", s"$dir/idx", "o_orderkey", keys)
      .orderBy("o_orderkey").collect()
    val full = spark.read.parquet(s"$dir/data")
      .filter(col("o_orderkey").isin(keys: _*))
      .orderBy("o_orderkey").collect()
    assert(viaIndex.toSeq == full.toSeq)
    assert(full.nonEmpty)
  }

  test("missing keys return empty without false negatives") {
    val dir = Files.createTempDirectory("bloomidx2").toString
    val s = spark
    import s.implicits._
    (1L to 1000L).toDF("k").repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(s"$dir/data")
    FileBloomIndex.build(spark, s"$dir/data", "k", s"$dir/idx", 1000L, 0.01)
    // every present key must be found (no false negatives, whole domain)
    val found = FileBloomIndex
      .lookup(spark, s"$dir/data", s"$dir/idx", "k", (1L to 1000L))
      .count()
    assert(found == 1000L)
    // absent keys: empty result regardless of bloom false positives
    assert(FileBloomIndex
      .lookup(spark, s"$dir/data", s"$dir/idx", "k", Seq(5555L, 9999L)).count() == 0L)
  }
}
