package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** Greedy longest-prefix encoding: hand-checked piece arithmetic, the
  * greedy-choice tie rules the oracle's `ORDER BY len DESC, v` encodes,
  * and codegen-vs-interpreted parity for the reference-object path
  * (`ctx.addReferenceObj` is the one wiring the other kernels don't use).
  */
class GreedyPieceSpec extends SparkTestBase {

  private def stats(text: String, vocab: Seq[String]): Seq[Long] = {
    val sorted = vocab.toArray
      .sortWith((a, b) => a.length > b.length || (a.length == b.length && a < b))
    TextKernels.greedyPieceStats(UTF8String.fromString(text), sorted)
      .toLongArray().toSeq
  }

  test("hand-checked greedy encodings") {
    // greedy takes "abc" over "ab", then "b": 2 pieces, 4 covered
    assert(stats("abcb", Seq("abc", "ab", "b")) == Seq(2L, 4L, 4L))
    // no vocab entry: every char is an unknown piece, covered 0
    assert(stats("xyz", Seq("ab")) == Seq(3L, 0L, 3L))
    // mid-word matches allowed: "xab" -> unk x + ab
    assert(stats("xab", Seq("ab")) == Seq(2L, 2L, 3L))
    // greedy is NOT optimal: vocab {aa, aab-less}: "aab" -> aa + unk b
    assert(stats("aab", Seq("aa", "b")) == Seq(2L, 3L, 3L))
    // words tokenize independently; whitespace never encoded
    assert(stats("ab  ab", Seq("ab")) == Seq(2L, 4L, 4L))
    // equal-length tie: lexicographically smaller entry wins (both match)
    assert(stats("ab", Seq("ab")) == Seq(1L, 2L, 2L))
    assert(stats("", Seq("ab")) == Seq(0L, 0L, 0L))
  }

  test("codegen and interpreted paths agree on corpus text") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet").limit(100)
    val vocab = typedlit(Seq("the", "of", "and", "ing", "er", "a"))
    val e = call_function("graft_greedy_pieces", col("text"), vocab)
    val viaCodegen = docs.select(col("doc_id"), e.as("st")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // interpreted: eval the kernel directly per row
    val sorted = Seq("the", "of", "and", "ing", "er", "a").toArray
      .sortWith((a, b) => a.length > b.length || (a.length == b.length && a < b))
    val direct = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> TextKernels.greedyPieceStats(UTF8String.fromString(t), sorted)
          .toLongArray().toSeq
      }.toMap
    assert(viaCodegen == direct)
    // pieces never exceed word chars; covered never exceeds word chars
    direct.values.foreach { case Seq(p, c, w) =>
      assert(p <= w && c <= w && p > 0)
    }
  }
}
