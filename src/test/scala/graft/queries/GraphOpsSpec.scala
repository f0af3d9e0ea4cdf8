package graft.queries

import graft.SparkTestBase

/** The diskBound PageRank regime (eager DISK_ONLY checkpoints + scoped
  * shuffle reaping) only fires at decade scale (lineitem ≥ 4 GiB), so
  * nothing in the sf0.01 correctness gate ever executes it — this spec
  * keeps the sf100-only code path from bitrotting by asserting it is
  * bit-identical to the lazy path on the same graph (fixed-point integer
  * arithmetic: any divergence is a bug, not noise).
  */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("diskBound regime matches the lazy regime bit-for-bit") {
    // bipartite multigraph with duplicate co-purchase pairs, int32 ids
    // (the g1 adjacency layout): dedupEdges must collapse them identically
    // in both regimes
    val edges = (1 to 5000).flatMap { i =>
      val c = (i % 97) * 2
      val s = (i % 31) * 2 + 1
      Seq((c, s), (s, c))
    }.toDF("src", "dst")
    val lazyRes = GraphOps.pagerank(edges, 3, diskBound = false,
      dedupEdges = true).orderBy("id").as[(Int, Long)].collect().toSeq
    val keep = org.apache.spark.GraftShuffleReaper.liveIds(spark.sparkContext)
    val diskRes = GraphOps.pagerank(edges, 3, diskBound = true,
      reapKeep = keep, dedupEdges = true)
      .orderBy("id").as[(Int, Long)].collect().toSeq
    assert(lazyRes.nonEmpty, "empty pagerank result")
    assert(diskRes == lazyRes,
      "diskBound and lazy regimes diverged on identical input")
  }
}
