package graft.queries

import org.apache.spark.sql.functions._

/** Scratch probe (r16): price the decimal-exact revenue aggregate that
  * dominates q1/j2/a10's noop-actioned cost, against candidate
  * formulations, on the real lineitem table.
  *   sbt "Test/runMain graft.queries.DecimalProbe <sfDir>"
  * Variants:
  *   dec18  — the shipped contract form: sum(dec18(p) * (1 - dec18(d)))
  *   dec10  — narrowed casts: sum(dec10(p) * (1 - dec4(d))) — product
  *            decimal(15,4) instead of (37,4)
  *   cents  — long unscaled arithmetic (overflow-unsafe at 100 TB;
  *            measured only as the speed-of-light reference)
  *   split  — sum(p) - sum(p*d) regrouping
  */
object DecimalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("decimal-probe")
    val li = Tables.t(spark, args(0), "lineitem")
      .select(col("l_extendedprice").as("p"), col("l_discount").as("d"),
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-6s median ${runs.sorted.apply(1)}%.3f s  (${runs.map(r => f"$r%.3f").mkString(", ")})")
    }
    def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    time("dec18") {
      li.groupBy(col("rf"), col("ls"))
        .agg(sum(d18(col("p")) * (lit(1).cast("decimal(18,2)") - d18(col("d"))))
          .cast("double").as("rev"))
    }
    time("dec10") {
      li.groupBy(col("rf"), col("ls"))
        .agg(sum(col("p").cast("decimal(10,2)") *
            (lit(1).cast("decimal(4,2)") - col("d").cast("decimal(4,2)")))
          .cast("double").as("rev"))
    }
    time("cents") {
      li.groupBy(col("rf"), col("ls"))
        .agg((sum((d18(col("p")) * 100).cast("long") *
            (lit(10000L) - (d18(col("d")) * 10000).cast("long")))
          .cast("double") / 1e6).as("rev"))
    }
    time("split") {
      li.groupBy(col("rf"), col("ls"))
        .agg((sum(d18(col("p"))).cast("double") -
          sum(d18(col("p")) * d18(col("d"))).cast("double")).as("rev"))
    }
    // value check: dec18 vs dec10 must be bit-identical
    val a = li.groupBy(col("rf"), col("ls"))
      .agg(sum(d18(col("p")) * (lit(1).cast("decimal(18,2)") - d18(col("d"))))
        .cast("double").as("rev")).orderBy("rf", "ls").collect()
    val b = li.groupBy(col("rf"), col("ls"))
      .agg(sum(col("p").cast("decimal(10,2)") *
          (lit(1).cast("decimal(4,2)") - col("d").cast("decimal(4,2)")))
        .cast("double").as("rev")).orderBy("rf", "ls").collect()
    println(s"[probe] dec18==dec10 values: ${a.sameElements(b)}")
    spark.stop()
  }
}
