package graft.queries

import graft.SparkTestBase

/** Physical-plan shape assertions — the "would this survive a 100×
  * scale-up" properties, machine-checked instead of eyeballed from
  * `.explain("formatted")`:
  *
  *  - no query in the registry ever plans a CartesianProduct (intentional
  *    small-side cross joins must be broadcast nested-loop);
  *  - filters and projections reach the parquet scans (PushedFilters /
  *    narrow ReadSchema);
  *  - dimension joins broadcast instead of shuffling the fact side;
  *  - aggregations partial-aggregate map-side (two HashAggregate levels);
  *  - the dedup/text hot path stays inside whole-stage codegen.
  */
class PlanAssertionsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("no registry query plans a CartesianProduct") {
    Registry.all.foreach { q =>
      val p = plan(q.name)
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n$p")
    }
  }

  test("s1_scan_prune: filter is pushed to the parquet scan, schema pruned") {
    val p = plan("s1_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    // projection narrow: scanned schema must not include unused wide columns
    assert(!p.contains("l_comment"), p)
  }

  test("j2_broadcast_enrich: both dimension joins broadcast") {
    val p = plan("j2_broadcast_enrich")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sim1_brute_topk: the query set is broadcast, never shuffled") {
    val p = plan("sim1_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q1_agg: map-side partial aggregation precedes the shuffle") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("a7_dedup_first_wins: dedup is aggregate-based, no sort anywhere") {
    val p = plan("a7_dedup_first_wins")
    assert(!p.contains("Sort "), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("d3_simhash: native expression runs inside whole-stage codegen") {
    val qe = Registry.byName("d3_simhash").fn(spark, sf).queryExecution
    val p = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p.take(2000))
    assert(p.toLowerCase.contains("graft_simhash60"), p.take(2000))
  }

  test("j1_rollup_ids: rollup partial-aggregates map-side") {
    val p = plan("j1_rollup_ids")
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("w2_sessionize: window and session aggregate share ONE shuffle") {
    // HashPartitioning(user_id) satisfies the groupBy(user_id, __sess)
    // clustering requirement, so Catalyst must not add a second exchange
    val p = plan("w2_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("a10_rollup_revenue: grouping sets expand once, dims broadcast") {
    val p = plan("a10_rollup_revenue")
    assert("Expand".r.findAllIn(p).size == 1, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t1_token_stats: documents scan prunes to doc_id + text") {
    val scan = Registry.byName("t1_token_stats").fn(spark, sf)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("doc_id") && scan.contains("text"), scan)
    assert(!scan.contains("lang") && !scan.contains("source"), scan)
  }

  test("sim3_ivf_ann: centroid assignment broadcasts, nothing sort-merges") {
    val p = plan("sim3_ivf_ann")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d1_exact_dedup: fingerprint groupBy partial-aggregates map-side") {
    val p = plan("d1_exact_dedup")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("j6b_full_width_agg: single shuffle, map-side partial aggregation") {
    val p = plan("j6b_full_width_agg")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("j8 tie precondition: (user_id, ts) is unique in the events table") {
    // j8's Spark side breaks same-instant click ties by event_id; the
    // DuckDB ASOF oracle picks an arbitrary tied row. The contract is
    // sound only while (user_id, ts) is unique — assert it so a testdata
    // regeneration with collisions fails loudly here, not as a flaky
    // driver hash mismatch
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.t(spark, d, "events")
      val dups = ev.groupBy(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("ts"))
        .count().filter(org.apache.spark.sql.functions.col("count") > 1).count()
      assert(dups == 0L, s"$d has $dups (user_id, ts) collisions")
    }
  }

  test("j8_asof_join: one shuffle, window-based — no range-join explosion") {
    // the as-of must be a single hash exchange on user_id feeding a
    // partitioned window, never a joined candidate set (range joins
    // explode as span x density at 100 TB)
    val p = plan("j8_asof_join")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j9_range_bin_join: range predicate rides a hash join, never a nested loop") {
    // the unkeyed interval join must join on the time BIN (equality →
    // hash join); a BroadcastNestedLoopJoin here is the span×density
    // explosion the binning exists to prevent
    val p = plan("j9_range_bin_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("t7_freq_rank_quality: vocab never single-partitions; rank join not hint-forced") {
    // the vocabulary rank must come from a RANGE-partitioned sort — an
    // `Exchange SinglePartition` over vocab rows would be the 100 TB
    // scale-killer (billions of distinct tokens through one partition).
    // The two-phase rank's partition-offset cumsum runs on the DRIVER
    // (its input is the per-partition COUNT aggregate: one row per
    // shuffle partition, cluster-bounded, never vocab-bounded) and rides
    // back as a map literal, so the executed plan must carry NO
    // single-partition stage at all — the offsets join, its broadcast
    // hint, and the unpartitioned cumsum window are all gone.
    val df = Registry.byName("t7_freq_rank_quality").fn(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("element_at(map"),
      s"rank offsets must be applied as a map literal projection:\n$p")
    // no broadcast hints left anywhere: the rank join back onto the
    // token stream must stay AQE-arbitrated (no vocab hint)
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.contains("ResolvedHint"), logical)
  }
}
