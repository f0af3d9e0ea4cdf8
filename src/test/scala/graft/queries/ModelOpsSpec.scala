package graft.queries

import graft.SparkTestBase

/** Semantic contracts for the learned-filter ops that the oracle's hash
  * compare can't articulate: qc1's trained classifier must actually
  * SEPARATE the classes it was taught (hash-exactness would hold for a
  * useless model too), and dsir1's importance weights must rank
  * target-domain docs above the rest (the property importance
  * resampling relies on).
  */
class ModelOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("qc1: trained classifier separates the stopword-teacher classes") {
    val out = Registry.byName("qc1_quality_classifier").fn(spark, sf)
      .select("doc_id", "y", "margin_micro", "pred_milli").collect()
    assert(out.nonEmpty)
    val (pos, neg) = out.partition(_.getLong(1) == 1L)
    assert(pos.nonEmpty && neg.nonEmpty, "teacher must label both classes")
    // majority class is ~54% on this corpus; NB init reaches ~0.89 and
    // the 2 GD refinement steps must not destroy it
    val correct = out.count(r => (r.getLong(2) > 0) == (r.getLong(1) == 1L))
    val acc = correct.toDouble / out.length
    val majority = math.max(pos.length, neg.length).toDouble / out.length
    assert(acc > majority + 0.2,
      s"classifier accuracy $acc must clearly beat majority $majority")
    // margins separate in the mean, predictions stay in [0, 1000]
    val m1 = pos.map(_.getLong(2).toDouble).sum / pos.length
    val m0 = neg.map(_.getLong(2).toDouble).sum / neg.length
    assert(m1 > m0, s"mean margin y=1 ($m1) must exceed y=0 ($m0)")
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000L))
  }

  test("dsir1: target-domain docs score higher than the rest of the corpus") {
    val out = Registry.byName("dsir1_importance_score").fn(spark, sf)
      .select("doc_id", "source", "n_toks", "lw_micro").collect()
    assert(out.nonEmpty)
    val (tgt, rest) = out.partition(r => Set("src1", "src2")(r.getString(1)))
    assert(tgt.nonEmpty && rest.nonEmpty)
    def meanPerTok(rs: Array[org.apache.spark.sql.Row]): Double =
      rs.map(r => r.getLong(3).toDouble / r.getLong(2)).sum / rs.length
    // per-token LLR of a target doc under its own LM must beat the
    // non-target average (importance weights point toward the target)
    assert(meanPerTok(tgt) > meanPerTok(rest),
      s"target mean per-token LLR ${meanPerTok(tgt)} must exceed rest ${meanPerTok(rest)}")
  }

  test("dsir1: scores are append-stable (adding docs never rescores by id)") {
    // the score of a doc depends only on its tokens and the two LMs;
    // within one corpus snapshot, re-running yields identical longs
    val a = Registry.byName("dsir1_importance_score").fn(spark, sf)
      .select("doc_id", "lw_micro").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Registry.byName("dsir1_importance_score").fn(spark, sf)
      .select("doc_id", "lw_micro").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
