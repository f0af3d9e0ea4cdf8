package graft.plans

import org.apache.spark.sql.GraftPartitionedCheckpoint
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkTestBase

/** GraftPartitionedCheckpoint: the layout claim must be (a) VISIBLE to
  * planning — no exchange / no sort above the checkpoint scan in a
  * co-partitioned join — and (b) TRUE — results identical to the same
  * computation without the checkpoint. (b) is the load-bearing half: a
  * falsely-claimed HashPartitioning makes sort-merge joins silently
  * produce wrong rows, so any change to how the shim shapes data (e.g.
  * un-pinning the partition count and letting AQE coalesce) must fail
  * here.
  */
class PartitionedCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def edges = (1 to 20000)
    .map(i => ((i % 613).toLong, i.toLong)).toDF("src", "dst")
  private def ranks = (0L until 613L).map(i => (i, i * 7 + 1)).toDF("id", "w")

  test("claimed layout is visible: no exchange, no sort above the scan") {
    val adj = GraftPartitionedCheckpoint(edges, 8, Seq("src"), Seq("src"),
      eager = false, StorageLevel.MEMORY_AND_DISK)
    val pp = adj.queryExecution.executedPlan
    assert(pp.outputPartitioning.toString.contains("hashpartitioning(src"),
      s"checkpoint lost its partitioning: ${pp.outputPartitioning}")
    assert(pp.outputOrdering.nonEmpty, "checkpoint lost its ordering")
    val withoutBroadcast = ranks.hint("shuffle_merge")
    val j = adj.join(withoutBroadcast, col("id") === adj("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
    val plan = j.queryExecution.executedPlan.toString
    // the adjacency side must consume the scan directly: the only
    // exchanges are the rank side's and the aggregation's
    val badExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(src"))
    val badSort = plan.linesIterator.exists(l => l.contains("Sort [src"))
    assert(!badExchange, s"adjacency re-exchanged despite the claim:\n$plan")
    assert(!badSort, s"adjacency re-sorted despite the claim:\n$plan")
  }

  test("claimed layout is true: join + agg results identical to plain plan") {
    val adj = GraftPartitionedCheckpoint(edges, 8, Seq("src"), Seq("src"),
      eager = true, StorageLevel.MEMORY_AND_DISK)
    val viaCkpt = adj.join(ranks.hint("shuffle_merge"), col("id") === adj("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
      .orderBy(col("dst")).as[(Long, Long)].collect().toSeq
    val plain = edges.join(ranks, col("id") === col("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
      .orderBy(col("dst")).as[(Long, Long)].collect().toSeq
    assert(viaCkpt == plain)
  }

  test("dedupCols: exchange-free dedup inside the claimed partitioning") {
    // triplicate every edge; the dedup must restore the distinct set
    // without adding an exchange, and the claim must survive the agg
    val tripled = edges.union(edges).union(edges)
    val adj = GraftPartitionedCheckpoint(tripled, 8, Seq("src"), Seq("src"),
      eager = true, StorageLevel.MEMORY_AND_DISK, dedupCols = Seq("src", "dst"))
    assert(adj.count() == edges.distinct().count())
    val pp = adj.queryExecution.executedPlan
    assert(pp.outputPartitioning.toString.contains("hashpartitioning(src"))
    // join results still exact through the dedup'd claim
    val viaCkpt = adj.join(ranks.hint("shuffle_merge"), col("id") === adj("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
      .orderBy(col("dst")).as[(Long, Long)].collect().toSeq
    val plain = edges.distinct().join(ranks, col("id") === col("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
      .orderBy(col("dst")).as[(Long, Long)].collect().toSeq
    assert(viaCkpt == plain)
    // partCols ⊄ dedupCols must be refused — that claim would be false
    intercept[IllegalArgumentException] {
      GraftPartitionedCheckpoint(tripled, 8, Seq("src"), Seq("src"),
        eager = false, StorageLevel.MEMORY_AND_DISK, dedupCols = Seq("dst"))
    }
  }

  test("sortCols=Nil: partitioning-only claim, shuffled-hash join exchange-free") {
    // g1's iteration shape: no within-partition sort anywhere, the
    // co-partitioned join pinned shuffled-hash instead of sort-merge —
    // the claim must still kill the exchange, and must NOT invent an
    // ordering (a falsely-claimed SortOrder would silently corrupt any
    // downstream sort-merge join that trusts it)
    val adj = GraftPartitionedCheckpoint(edges, 8, Seq("src"), Nil,
      eager = true, StorageLevel.MEMORY_AND_DISK)
    assert(adj.queryExecution.executedPlan.outputOrdering.isEmpty,
      "no-sort checkpoint must not claim an ordering")
    val j = adj.join(ranks.hint("shuffle_hash"), col("id") === adj("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected SHJ:\n$plan")
    assert(!plan.linesIterator.exists(_.contains("Exchange hashpartitioning(src")),
      s"adjacency re-exchanged despite the claim:\n$plan")
    val got = j.orderBy(col("dst")).as[(Long, Long)].collect().toSeq
    val exp = edges.join(ranks, col("id") === col("src"))
      .groupBy(col("dst")).agg(sum(col("w")).as("x"))
      .orderBy(col("dst")).as[(Long, Long)].collect().toSeq
    assert(got == exp)
  }

  test("duplicate layout-column names are rejected, not silently bound") {
    // layout columns bind by NAME; a frame carrying two `src` columns
    // (e.g. a post-join residue) could otherwise claim a layout the
    // blocks don't have (ADVICE r9). Ambiguity must be a loud error.
    val dup = (1 to 10).map(i => (i % 3, i)).toDF("src", "src")
    val e = intercept[IllegalArgumentException] {
      GraftPartitionedCheckpoint(dup, 8, Seq("src"), Nil,
        eager = false, StorageLevel.MEMORY_AND_DISK)
    }
    assert(e.getMessage.contains("matches 2 output columns"))
  }

  test("self-join through two claimed checkpoints stays correct") {
    // the newInstance/dedup path: the same checkpoint consumed twice in
    // one plan with conflicting attribute ids
    val adj = GraftPartitionedCheckpoint(edges, 8, Seq("src"), Seq("src"),
      eager = true, StorageLevel.MEMORY_AND_DISK)
    val a = adj.select(col("src").as("k"), col("dst").as("d1"))
    val b = adj.select(col("src").as("k"), col("dst").as("d2"))
    val got = a.join(b, "k").filter(col("d1") < col("d2")).count()
    val pe = edges.select(col("src").as("k"), col("dst").as("d1"))
    val qe = edges.select(col("src").as("k"), col("dst").as("d2"))
    val exp = pe.join(qe, "k").filter(col("d1") < col("d2")).count()
    assert(got == exp && got > 0)
  }
}
