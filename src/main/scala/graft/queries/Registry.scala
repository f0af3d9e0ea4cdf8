package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation over the synthetic tables in
  * `sfDir` plus (usually) an equivalent ANSI SQL oracle for DuckDB.
  * Column names MUST match between the two — the driver's compare sorts
  * columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.LongType

  /** Load one synthetic table (TESTDATA.md) from the scale-factor dir.
    * Parquet TIMESTAMP(NANOS) columns arrive as epoch-nanos longs (see
    * GraftSession's nanosAsLong) and are converted to microsecond
    * timestamps here — same truncation DuckDB applies.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}

/** Central query registry; SparkEntry exposes it to the driver. */
object Registry {
  def all: Seq[Q] =
    CoreOps.qs ++ DslOps.qs ++ JoinAggOps.qs ++ ShapeOps.qs ++
      TextOps.qs ++ DedupOps.qs ++ SimilarityOps.qs ++ EtlGraphOps.qs ++
      MultimodalOps.qs ++ RuleOps.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
