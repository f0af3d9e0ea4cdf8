package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TableLayoutSpec extends SparkTestBase {

  test("equal-bucket sort-merge join plans no Exchange and no Sort") {
    val s = spark
    import s.implicits._
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    TableLayout.writeBucketed(a, "bt_a", "k", 8)
    TableLayout.writeBucketed(b, "bt_b", "k", 8)
    try {
      // force sort-merge (the tiny test tables would otherwise broadcast,
      // which proves nothing about bucket co-location)
      val j = s.table("bt_a").hint("merge").join(s.table("bt_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(j.count() == 1000)
    } finally {
      s.sql("DROP TABLE IF EXISTS bt_a")
      s.sql("DROP TABLE IF EXISTS bt_b")
    }
  }

  test("partitioned layout prunes non-matching partition directories") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_partlayout").toString
    val df = (1 to 300).map(i => (i.toLong, Seq("red", "green", "blue")(i % 3), i * 1.5))
      .toDF("id", "color", "v")
    TableLayout.writePartitioned(df, dir, "color")
    val rd = s.read.parquet(dir).filter(col("color") === "green")
    // the partition filter must reach the scan node (directory pruning),
    // not survive as a post-scan Filter
    val scan = rd.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("color"), scan)
    assert(rd.count() == 100)
  }
}
