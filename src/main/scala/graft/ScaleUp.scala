package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bench-only data replicator: scales the driver's synthetic parquet tables
  * (TESTDATA.md) by an integer factor while preserving referential
  * integrity, so the suite can be *measured* one decade past the largest
  * driver-provided scale factor instead of arguing plan shapes.
  *
  * Copy `i` (0-based) shifts every key in a domain by `i * stride`, where
  * stride = max(key)+1 observed in the base data: joins match exactly
  * within a copy and never across copies, so join selectivities and
  * group-by cardinalities scale linearly and every query stays
  * deterministic (all top-k ranks tie-break on shifted ids). `region` and
  * `nation` stay fixed, as TPC-H dims do across scale factors. This is NOT
  * a data synthesizer — every row is a key-shifted clone of a driver row.
  *
  * Output layout mirrors the driver's: one single-file `{table}.parquet`
  * per table (DuckDB's oracle views read the same literal paths).
  * `events.ts` (TIMESTAMP(NANOS), read as epoch-nanos long under
  * `nanosAsLong`) is normalized to microsecond timestamps on write — the
  * same truncation both `Registry.Tables.t` and the DuckDB oracle apply.
  *
  * Usage: runMain graft.ScaleUp <baseSfDir> <outDir> <factor>
  */
object ScaleUp {

  /** table -> (key column -> stride domain) for the replicated tables. */
  private val shiftedKeys: Map[String, Seq[(String, String)]] = Map(
    "customer"   -> Seq("c_custkey" -> "cust"),
    "supplier"   -> Seq("s_suppkey" -> "supp"),
    "part"       -> Seq("p_partkey" -> "part"),
    "orders"     -> Seq("o_orderkey" -> "ord", "o_custkey" -> "cust"),
    "lineitem"   -> Seq("l_orderkey" -> "ord", "l_partkey" -> "part",
                        "l_suppkey" -> "supp"),
    "events"     -> Seq("event_id" -> "event", "user_id" -> "user"),
    "documents"  -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"))

  /** stride domain -> the (table, column) its width is measured from. */
  private val strideSource: Map[String, (String, String)] = Map(
    "cust"  -> ("customer", "c_custkey"),
    "supp"  -> ("supplier", "s_suppkey"),
    "part"  -> ("part", "p_partkey"),
    "ord"   -> ("orders", "o_orderkey"),
    "event" -> ("events", "event_id"),
    "user"  -> ("events", "user_id"),
    "doc"   -> ("documents", "doc_id"),
    "vec"   -> ("embeddings", "vec_id"))

  private val fixedDims = Seq("region", "nation")

  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = GraftSession.local("graft-scaleup")
    scale(spark, baseDir, outDir, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    Files.createDirectories(Paths.get(outDir))
    def base(t: String): DataFrame =
      spark.read.parquet(s"$baseDir/$t.parquet")

    val strides: Map[String, Long] = strideSource.map {
      case (domain, (table, keyCol)) =>
        domain -> (base(table).agg(max(col(keyCol))).head.getLong(0) + 1L)
    }

    fixedDims.foreach(t => writeSingleFile(base(t), s"$outDir/$t.parquet"))

    shiftedKeys.foreach { case (t, keys) =>
      val src = {
        val df = base(t)
        // normalize nanos-as-long ts so the written file carries a real
        // timestamp column for both Spark and the DuckDB oracle views
        if (t == "events" && df.schema("ts").dataType == LongType)
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else df
      }
      val copies = (0 until factor).map { i =>
        keys.foldLeft(src) { case (df, (keyCol, domain)) =>
          df.withColumn(keyCol, col(keyCol) + lit(i * strides(domain)))
        }
      }
      writeSingleFile(copies.reduce(_ unionByName _), s"$outDir/$t.parquet")
    }
  }

  /** Write one parquet FILE (not directory) at `dest`, matching the driver's
    * testdata layout so DuckDB's literal-path views keep working.
    *
    * Row groups are capped at 16 MB (vs the 128 MB default): Spark splits
    * a parquet scan by byte range but a row group is the atomic unit, so
    * the default left sf10's orders with 2 row groups and sf100's
    * documents with 5 — every text/dedup query in the suite was scanning
    * on ≤5 of 32 cores while looking io-bound. A real 100 TB table is
    * thousands of files and saturates any core count; small groups give
    * the single-file replica the same scan parallelism without changing
    * the literal `{table}.parquet` paths the DuckDB oracle views read.
    */
  private def writeSingleFile(df: DataFrame, dest: String): Unit = {
    val tmp = dest + "_tmp"
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (16L << 20).toString)
      .parquet(tmp)
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp))) { stream =>
      stream.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.findFirst.orElseThrow(() =>
        new IllegalStateException(s"no part file written under $tmp"))
    }
    Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    // remove the scratch dir (success markers + crc files)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }
}
