package graft.expressions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** `graft_bloom_might_contain` contract: NO false negatives ever (every
  * inserted value probes true, on both the codegen and interpreted
  * paths), false positives bounded by the configured fpp, null/plan-time
  * rules enforced.
  */
class BloomExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def bloomBytes(values: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val bf = values.toDF("v").stat.bloomFilter("v", math.max(values.size.toLong, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted value probes true") {
    val inserted = (0L until 5000L).map(i => i * 2654435761L)
    val bytes = bloomBytes(inserted)
    val misses = inserted.toDF("v")
      .filter(!call_function("graft_bloom_might_contain", lit(bytes), col("v")))
      .count()
    assert(misses == 0L)
  }

  test("false positives stay near the configured fpp") {
    val inserted = (0L until 5000L).map(i => i * 2654435761L)
    val bytes = bloomBytes(inserted, fpp = 0.01)
    val probes = (1L to 50000L).map(i => -i) // disjoint from inserted
    val fp = probes.toDF("v")
      .filter(call_function("graft_bloom_might_contain", lit(bytes), col("v")))
      .count()
    // 1% nominal; 5x headroom keeps the assertion noise-proof
    assert(fp < 2500L, s"false-positive count $fp way above nominal 500")
  }

  test("codegen and interpreted paths agree row-for-row") {
    val inserted = (0L until 200L).map(i => i * 7919L)
    val bytes = bloomBytes(inserted)
    val probes = (0L until 2000L).map(i => i * 7919L / 2).toDF("v")
    val expr = call_function("graft_bloom_might_contain", lit(bytes), col("v"))
    val viaCodegen = probes.select(col("v"), expr.as("m")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // force the interpreted path through the expression's eval()
    val e = BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes),
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true))
    val viaInterp = (0L until 2000L).map(i => i * 7919L / 2).map { v =>
      v -> e.eval(org.apache.spark.sql.catalyst.InternalRow(v)).asInstanceOf[Boolean]
    }.toMap
    assert(viaCodegen == viaInterp)
  }

  test("null value probes null; non-literal bloom bytes rejected at plan time") {
    val bytes = bloomBytes(Seq(1L, 2L, 3L))
    val withNull = Seq(Some(1L), None).toDF("v")
    val got = withNull
      .select(call_function("graft_bloom_might_contain", lit(bytes), col("v")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got.toSeq == Seq(Some(true), None))

    val err = intercept[Exception] {
      Seq((Array[Byte](1, 2), 1L)).toDF("b", "v")
        .select(call_function("graft_bloom_might_contain", col("b"), col("v")))
        .collect()
    }
    assert(err.getMessage.contains("foldable") || err.getMessage.contains("DATATYPE"))
  }
}
