package graft.queries
import org.apache.spark.sql.functions._
object QcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("qc-probe")
    val dir = args.headOption.getOrElse("/root/repo/scale/sf1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val pairs = call_function("graft_token_counts", col("text"))
    val nTok = aggregate(pairs, lit(0L), (a, p) => a + p.getField("m"))
    val stops = Seq("the","a","of","and","in","to","is")
    val nStop = aggregate(filter(pairs, p => p.getField("tok").isin(stops.map(x=>x:Any):_*)), lit(0L), (a,p)=>a+p.getField("m"))
    val yCol = when(floor(nStop * lit(1000) / nTok) >= 61, 1L).otherwise(0L)
    val mv = call_function("graft_bucket_counts", col("text"), lit(64))
    val features = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), yCol.as("y"), mv.as("mv"), nTok.as("nt"))
      .filter(col("nt") > 0).drop("nt").localCheckpoint(false)
    time("feature-materialize")(features.count())
    time("nb-agg")(features.select(col("y"), posexplode(col("mv")).as(Seq("b","m")))
      .groupBy(col("b")).agg(sum(when(col("y")===1,col("m")).otherwise(0L)), sum(when(col("y")===0,col("m")).otherwise(0L))).collect())
    time("classN")(features.groupBy(col("y")).count().collect())
    val w = Array.fill(64)(1000L)
    val wl = typedlit(w.toSeq)
    val margin = aggregate(zip_with(col("mv"), wl, (a,b)=>a*b), lit(0L), (a,v)=>a+v) + lit(5L)
    val err = round((lit(1.0)/(lit(1.0)+exp(-margin.cast("double")/lit(1e6))) - col("y").cast("double"))*1000).cast("long")
    time("gd-step")(features.select(err.as("err"), posexplode(col("mv")).as(Seq("b","m")))
      .groupBy(col("b")).agg(sum(col("err")*col("m")), sum(col("err"))).collect())
    time("final-count")(features.select(col("doc_id"), margin.as("m")).count())
    spark.stop()
  }
}
