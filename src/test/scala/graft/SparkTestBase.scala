package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (Test / fork := true). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // match GraftSession: the synthetic events table carries parquet
      // TIMESTAMP(NANOS), read as epoch-nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table specs write here; keep it out of the repo tree
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark

  def fixture(name: String): String = {
    val url = getClass.getClassLoader.getResource(s"fixtures/$name")
    require(url != null, s"missing test fixture: $name")
    val src = scala.io.Source.fromURL(url, "UTF-8")
    try src.mkString finally src.close()
  }
}
