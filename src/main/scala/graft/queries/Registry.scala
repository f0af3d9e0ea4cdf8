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
  /** Load one synthetic table (TESTDATA.md) from the scale-factor dir. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}

/** Central query registry; SparkEntry exposes it to the driver. */
object Registry {
  def all: Seq[Q] =
    CoreOps.qs ++ DslOps.qs ++ JoinAggOps.qs ++ ShapeOps.qs ++
      TextOps.qs ++ DedupOps.qs ++ SimilarityOps.qs ++ EtlGraphOps.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
