package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampType

import graft.SparkTestBase

/** The driver regenerates /root/testdata between rounds, and a generator
  * change can silently alter what Spark sees — round 6's regeneration moved
  * `events.ts` from parquet TIMESTAMP(NANOS) (read as epoch-nanos long) to
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ), which
  * broke every `unix_micros` call site at RUNTIME — four queries failed in
  * the driver's bench/verify with nothing in `sbt test` to catch it. This
  * contract pins the post-normalization schema of every synthetic table as
  * seen through `Tables.t`, so the next drift fails HERE with a diff,
  * before a single query plan is built.
  *
  * On an INTENTIONAL generator change: regenerate with
  *   sbt "Test/runMain graft.queries.SchemaDump"
  * review the git diff of schemas.contract (new column / type changes may
  * need Tables.t normalization or query updates), and commit it.
  */
object SchemaContract {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  val file: Path = Paths.get("src/test/resources/schemas.contract")

  /** One line per table: `<name>: <field:type, ...>` from Tables.t's view
    * (post-normalization — this is the schema queries are written against).
    */
  def current(spark: SparkSession, sfDir: String): String =
    tables.map { n =>
      val ddl = Tables.t(spark, sfDir, n).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      s"$n: $ddl"
    }.mkString("", "\n", "\n")
}

class SchemaContractSpec extends SparkTestBase {
  private val sfDir = "/root/testdata/sf0.001"

  test("testdata schemas match the pinned contract") {
    val expected = new String(Files.readAllBytes(SchemaContract.file), "UTF-8")
    val actual = SchemaContract.current(spark, sfDir)
    assert(actual == expected,
      s"\ntestdata schema drift (driver regenerated the generator?) —" +
        s" if intentional, re-pin with sbt \"Test/runMain graft.queries.SchemaDump\"" +
        s" and review Tables.t normalization.\nexpected:\n$expected\nactual:\n$actual")
  }

  test("events.ts normalizes to an instant TIMESTAMP regardless of annotation") {
    // the invariant behind every unix_micros call site: whatever the
    // generator wrote (nanos-long, NTZ micros, instant micros), Tables.t
    // hands queries a session-zoned TIMESTAMP
    val ts = Tables.t(spark, sfDir, "events").schema("ts").dataType
    assert(ts == TimestampType, s"events.ts must normalize to TIMESTAMP, got $ts")
  }
}

/** Re-pin the schema contract after an intentional testdata change. */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.SharedSpark.spark
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    Files.createDirectories(SchemaContract.file.getParent)
    Files.write(SchemaContract.file,
      SchemaContract.current(spark, sfDir).getBytes("UTF-8"))
    println(s"wrote ${SchemaContract.file}")
    spark.stop()
  }
}
