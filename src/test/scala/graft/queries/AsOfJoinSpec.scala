package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** j8 semantics beyond what the driver fixtures can reach: the synthetic
  * events table has no NULL `value`, so the ASOF contract "take ts AND
  * value from the SAME latest prior click" is only distinguishable from
  * "latest non-null ts, latest non-null value — independently" on a
  * crafted corpus with a null-valued click.
  */
class AsOfJoinSpec extends SparkTestBase {

  test("j8: null-valued latest click supplies BOTH fields (no split-window divergence)") {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    def ts(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(micros / 1000)
      t.setNanos(((micros % 1000000L) * 1000L).toInt)
      t
    }
    val rows = Seq(
      // user 1: older click HAS a value, the LATEST prior click does not —
      // the two-independent-windows bug pairs e2's ts with e1's value
      Row(1L, ts(1000000L), 1L, "click", 5.0, "{}"),
      Row(2L, ts(2000000L), 1L, "click", null, "{}"),
      Row(3L, ts(3000000L), 1L, "purchase", 9.9, "{}"),
      // user 2: no prior click at all → both fields null
      Row(4L, ts(4000000L), 2L, "purchase", 1.0, "{}"))
    val dir = Files.createTempDirectory("graft_j8_null_").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Registry.byName("j8_asof_join").fn(spark, dir)
      .orderBy("purchase_id")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[java.sql.Timestamp].getTime),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (3L, Some(2000L), None), // ts from e2, value from e2 (null) — NOT e1's 5.0
      (4L, None, None)))
  }
}
