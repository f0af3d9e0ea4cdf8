package graft.queries
import org.apache.spark.sql.functions._
object EdgeCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("edge-count")
    val dir = "/root/repo/scale/sf100"
    val n = Tables.t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("c"), col("l_suppkey").cast("long").as("s"))
      .distinct().count()
    println(s"DISTINCT_PAIRS $n")
    spark.stop()
  }
}
