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
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Load one synthetic table (TESTDATA.md) from the scale-factor dir,
    * normalizing `events.ts` to a session-zoned TIMESTAMP regardless of how
    * the generator annotated it. The driver has produced two variants:
    * parquet TIMESTAMP(NANOS), which arrives as epoch-nanos long (see
    * GraftSession's nanosAsLong) and is truncated to micros here — the same
    * truncation DuckDB applies — and TIMESTAMP(MICROS, isAdjustedToUTC=
    * false), which arrives as TIMESTAMP_NTZ. The NTZ form breaks
    * instant-typed functions (`unix_micros` rejects NTZ), so it is cast to
    * TIMESTAMP; the session timezone is pinned to UTC (GraftSession), which
    * makes the cast value-preserving and keeps every downstream epoch
    * extraction identical to DuckDB's naive reading of the same file.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}

/** Central query registry; SparkEntry exposes it to the driver. */
object Registry {
  def all: Seq[Q] =
    CoreOps.qs ++ DslOps.qs ++ JoinAggOps.qs ++ ShapeOps.qs ++
      TextOps.qs ++ DedupOps.qs ++ SimilarityOps.qs ++ EtlGraphOps.qs ++
      MultimodalOps.qs ++ RuleOps.qs ++ PackOps.qs ++ CdcOps.qs ++ GraphOps.qs ++
      ModelOps.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
