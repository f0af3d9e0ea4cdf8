package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.DedupFunctions.{lshBandKeys, minhashBandKeys}
import graft.functions.TextFunctions.hashedShingleSet
import graft.functions.VectorFunctions.{dotQ, quantize}

/** The native vector/MinHash codegen expressions must be bit-identical to
  * their higher-order-function specs (which the DuckDB oracle
  * independently recomputes) — including negative values, exact .5
  * rounding ties, empty arrays, and nulls.
  */
class NativeVectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    Seq(0.1f, -0.25f, 3.9995f, -0.0005f),  // .5-in-milliunits rounding ties
    Seq(1.0f, 2.0f, 3.0f, 4.0f),
    Seq(-1.5f, 0.0f, 2.5f, -2.5f),
    Seq.empty[Float],
    Seq(0.123456789f, -0.987654321f, 0.5f, -0.5f)).toDF("v")

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog and more words here",
    "one two",
    "",
    "dup dup dup dup dup").toDF("text")

  test("graft_quantize_milli matches the HOF quantize spec") {
    val spec = vecs.select(quantize(col("v"))).as[Seq[Long]].collect()
    val got = vecs.select(call_function("graft_quantize_milli", col("v")))
      .as[Seq[Long]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_dot_milli matches the HOF dotQ spec") {
    val q = vecs.filter(size(col("v")) > 0)
      .select(quantize(col("v")).as("a"))
      .withColumn("b", reverse(col("a")))
    val spec = q.select(dotQ(col("a"), col("b"))).as[Long].collect()
    val got = q.select(call_function("graft_dot_milli", col("a"), col("b")))
      .as[Long].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_minhash_bands matches the HOF minhashBandKeys spec") {
    val sh = docs.select(hashedShingleSet(col("text")).as("sh"))
    val spec = sh.select(minhashBandKeys(col("sh"), 12, 4, 3)).as[Seq[String]].collect()
    val got = sh.select(call_function("graft_minhash_bands",
      col("sh"), lit(12), lit(4), lit(3))).as[Seq[String]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_lsh_bands matches the HOF lshBandKeys spec") {
    val q = vecs.filter(size(col("v")) === 4).select(quantize(col("v")).as("q"))
    val spec = q.select(lshBandKeys(col("q"), 4, 4, 4)).as[Seq[String]].collect()
    val got = q.select(call_function("graft_lsh_bands",
      col("q"), lit(4), lit(4), lit(4))).as[Seq[String]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_dot_milli on length-mismatched vectors is NULL like the HOF") {
    val q = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val spec = q.select(dotQ(col("a"), col("b"))).collect()
    val got = q.select(call_function("graft_dot_milli", col("a"), col("b"))).collect()
    assert(spec(0).isNullAt(0), "HOF spec must null out on mismatch")
    assert(got(0).isNullAt(0), "native kernel must match the HOF's null")
  }

  test("randomized parity: 100 generated vectors agree native-vs-HOF on all kernels") {
    // deterministic pseudo-random vectors (fixed seed — reproducible runs)
    val rnd = new scala.util.Random(4242)
    val gen = Seq.fill(100)(Seq.fill(16)((rnd.nextFloat() - 0.5f) * 8f)).toDF("v")
      .localCheckpoint(false)
    val q = gen.select(quantize(col("v")).as("q")).withColumn("b", reverse(col("q")))

    val dotSpec = q.select(dotQ(col("q"), col("b"))).as[Long].collect().toSeq
    val dotGot = q.select(call_function("graft_dot_milli", col("q"), col("b")))
      .as[Long].collect().toSeq
    assert(dotGot == dotSpec)

    val qzSpec = gen.select(quantize(col("v"))).as[Seq[Long]].collect().toSeq
    val qzGot = gen.select(call_function("graft_quantize_milli", col("v")))
      .as[Seq[Long]].collect().toSeq
    assert(qzGot == qzSpec)

    val lshSpec = q.select(lshBandKeys(col("q"), 4, 4, 16)).as[Seq[String]].collect().toSeq
    val lshGot = q.select(call_function("graft_lsh_bands",
      col("q"), lit(4), lit(4), lit(16))).as[Seq[String]].collect().toSeq
    assert(lshGot == lshSpec)
  }

  test("null input yields null, not a crash") {
    val n = Seq[Option[Seq[Float]]](None, Some(Seq(1.0f, 2.0f))).toDF("v")
    val r = n.select(
      call_function("graft_quantize_milli", col("v")).as("q")).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }
}
