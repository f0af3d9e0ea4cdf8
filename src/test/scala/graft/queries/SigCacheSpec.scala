package graft.queries

import graft.SparkTestBase

/** The dedup-family signature cache must evict LRU-wise: the old
  * wholesale clear() at capacity dropped every in-use frame at once —
  * including the hot one the current query family is built on.
  */
class SigCacheSpec extends SparkTestBase {
  import spark.implicits._

  test("eviction past capacity keeps the hot entry, drops the coldest") {
    val mk = () => Seq(1L).toDF("x")
    val hot = ("sigspec_dir_hot", "sigspec_kind")
    DedupOps.materialized(spark, hot._1, hot._2)(mk())
    // 16 colder entries; touch the hot one midway so it is never LRU
    (1 to 8).foreach(i => DedupOps.materialized(spark, s"sigspec_dir_$i", "sigspec_kind")(mk()))
    DedupOps.materialized(spark, hot._1, hot._2)(mk())
    (9 to 16).foreach(i => DedupOps.materialized(spark, s"sigspec_dir_$i", "sigspec_kind")(mk()))
    val entries = DedupOps.cachedSigEntries(spark)
      .filter(_._1.startsWith("sigspec_dir"))
    assert(entries.contains(hot), s"hot entry evicted: $entries")
    // capacity is 16 across ALL sessions/dirs — at least one of the 17
    // sigspec entries must have been evicted, and the victim must be an
    // early cold one (dir_1..8), not the re-touched hot entry
    assert(entries.size < 17)
    assert((1 to 8).exists(i => !entries.contains((s"sigspec_dir_$i", "sigspec_kind"))))
  }

  test("same (session, dir, kind) returns the SAME materialized frame") {
    var builds = 0
    def build() = { builds += 1; Seq(42L).toDF("x") }
    val a = DedupOps.materialized(spark, "sigspec_same", "k")(build())
    val b = DedupOps.materialized(spark, "sigspec_same", "k")(build())
    assert(builds == 1 && (a eq b))
  }
}
