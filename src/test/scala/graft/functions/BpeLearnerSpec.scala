package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeLearnerSpec extends SparkTestBase {

  // ---- driver-side reference BPE (classic wordpiece-counts loop) ---------

  private def mergeSeq(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def naive(wordCounts: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var vocab = wordCounts.toVector.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var done = false
    while (i <= n && !done) {
      val pc = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        vocab = vocab.map { case (syms, c) => (mergeSeq(syms, l, r), c) }
        out += ((i, l, r, cnt))
        i += 1
      }
    }
    out.result()
  }

  private def wordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("left-to-right non-overlapping merge: (a,a) on 'aaaa' gives [aa][aa]") {
    import spark.implicits._
    val docs = Seq("aaaa aaa").toDF("text")
    val merges = BpeLearner.learnMerges(docs, col("text"), 2)
    // (a,a) appears 3+2=5 times; after merging, 'aaaa'=[aa,aa], 'aaa'=[aa,a]
    assert(merges.head == ((1, "a", "a", 5L)))
    assert(merges(1) == ((2, "aa", "aa", 1L)) || merges(1) == ((2, "aa", "a", 1L)))
    // reference agreement decides the tie exactly
    assert(merges == naive(wordCounts(Seq("aaaa aaa")), 2))
  }

  test("distributed learner matches the reference loop on real corpus text") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val expect = naive(wordCounts(texts), 6)
    val got = BpeLearner.learnMerges(docs, col("text"), 6)
    assert(got == expect)
  }

  test("merge list is deterministic across repartitionings") {
    import spark.implicits._
    val texts = Seq("the cat sat", "the cat", "a cat sat on the mat", "the the the")
    val a = BpeLearner.learnMerges(texts.toDF("text"), col("text"), 4)
    val b = BpeLearner.learnMerges(texts.toDF("text").repartition(7), col("text"), 4)
    assert(a == b && a == naive(wordCounts(texts), 4))
  }
}
