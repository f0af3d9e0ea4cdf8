package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** File-level bloom skipping index — the lakehouse point-lookup pattern:
  * parquet min/max stats prune RANGES, but a needle query on a column the
  * table is not sorted by (a doc id, a user id) matches every file's
  * range. A per-file bloom filter answers "might this FILE contain key k"
  * and turns the lookup into a scan of the few candidate files.
  *
  * Build is one distributed aggregation: rows group by `input_file_name()`
  * and fold into a mergeable [[BloomFilter]] via a typed [[Aggregator]]
  * (partial filters merge associatively, so map-side combine applies; the
  * kryo'd filter is the aggregation buffer). The index is a (file, bloom
  * bytes) table, ~KBs per file — at 100 TB it is the only full scan the
  * lookup path ever pays, ONCE at write time.
  *
  * Lookup loads the index (file-count-sized, driver-safe by the same
  * argument as parquet's own footer listing), keeps files whose bloom
  * might contain ANY probe key, and scans only those with the exact
  * predicate — no false negatives by the bloom contract (`mightContain`
  * never lies negatively), false positives only cost an extra file scan at
  * the configured fpp. Complements d13's codegen'd scan-time probe
  * (`graft_bloom_might_contain`), which prunes ROWS inside scanned files.
  */
object FileBloomIndex {

  /** Mergeable per-group bloom aggregate over long keys. */
  final class BloomAgg(expectedPerFile: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedPerFile, fpp)
    override def reduce(b: BloomFilter, x: Long): BloomFilter = { b.putLong(x); b }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val os = new ByteArrayOutputStream()
      b.writeTo(os)
      os.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the index table for `dataDir`'s parquet files over long column
    * `key`; written to `indexDir` as (file, bloom).
    */
  def build(spark: SparkSession, dataDir: String, key: String, indexDir: String,
      expectedPerFile: Long = 1000000L, fpp: Double = 0.01): Unit = {
    val agg = udaf(new BloomAgg(expectedPerFile, fpp))
    spark.read.parquet(dataDir)
      .select(input_file_name().as("file"), col(key).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(agg(col("k")).as("bloom"))
      .write.mode("overwrite").parquet(indexDir)
  }

  /** Files that might contain ANY of `keys` (bloom contract: a superset of
    * the files that do).
    */
  def candidateFiles(spark: SparkSession, indexDir: String, keys: Seq[Long]): Seq[String] =
    spark.read.parquet(indexDir).collect().toSeq.flatMap { r =>
      val bf = BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      if (keys.exists(bf.mightContainLong)) Some(r.getString(0)) else None
    }

  /** Point-lookup: scan only the candidate files, with the exact predicate
    * on top (bloom false positives filter out here).
    */
  def lookup(spark: SparkSession, dataDir: String, indexDir: String,
      key: String, keys: Seq[Long]): DataFrame = {
    val files = candidateFiles(spark, indexDir, keys)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(key).isin(keys: _*))
  }
}
