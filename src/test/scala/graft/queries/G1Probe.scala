package graft.queries
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object G1Probe {
  private def du(): String = {
    import scala.sys.process._
    (Seq("bash", "-c",
      "du -sm /tmp/blockmgr-* /tmp/spark-* 2>/dev/null | awk '{s+=$1} END {print s}'").!!).trim + " MB"
  }
  private def free(): String = {
    import scala.sys.process._
    (Seq("bash", "-c", "df -m / | tail -1 | awk '{print $4}'").!!).trim + " MB free"
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("g1-probe")
    val dir = "/root/repo/scale/sf100"
    def mark(tag: String): Unit = println(s"PHASE $tag scratch=${du()} ${free()}")
    mark("start")
    val ce = Tables.t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("c"),
        (col("l_suppkey").cast("long") * 2 + 1).as("s"))
      .distinct()
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    mark("ce-materialized")
    org.apache.spark.GraftShuffleReaper.dropAll(spark.sparkContext); System.gc()
    mark("ce-post-reap")
    val edges = ce.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(ce.select(col("s").as("src"), col("c").as("dst")))
    val adj = edges.repartition(col("src")).localCheckpoint(true, StorageLevel.DISK_ONLY)
    mark("adj-materialized")
    ce.unpersist(true)
    org.apache.spark.GraftShuffleReaper.dropAll(spark.sparkContext); System.gc()
    mark("adj-post-reap")
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).localCheckpoint(false)
    val nodes = adj.select(col("src").as("id")).distinct().localCheckpoint(false)
    val n = nodes.count()
    mark("nodes-counted")
    var pr = nodes.select(col("id"), lit(1000000000000L / n).as("pr"))
    for (i <- 1 to 3) {
      val prepared = pr.join(deg, pr("id") === deg("src"))
        .select(col("id"), expr("pr div outdeg").as("contrib"))
      val inflow = adj.join(prepared, col("id") === adj("src"))
        .select(col("dst"), col("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val next = nodes.join(inflow, nodes("id") === inflow("dst"), "left")
        .select(nodes("id"),
          (lit(150000000000L / n) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      pr = next.localCheckpoint(true)
      mark(s"iter$i-done")
      org.apache.spark.GraftShuffleReaper.dropAll(spark.sparkContext); System.gc()
      mark(s"iter$i-post-reap")
    }
    println("PR_ROWS " + pr.count())
    spark.stop()
  }
}
