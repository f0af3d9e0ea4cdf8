package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables.t

/** Graph analytics over the synthetic star schema: PageRank on the
  * customer↔supplier co-purchase graph (who bought from whom, via
  * orders ⋈ lineitem).
  *
  * Engine-extension rationale: a corpus pipeline ranks domains/authors by
  * link structure for quality priors (Common-Crawl-style harvesting); the
  * operator shape — iterated sparse-matrix-vector products as edge joins —
  * is the same.
  */
object GraphOps {

  /** Fixed-point PageRank: ranks are BIGINT trillionths, every step is
    * integer floor arithmetic (`div`), so partial-aggregation order can
    * never move a bit and the DuckDB oracle hash-matches exactly. (The
    * floors leak ~1 unit of mass per node per iteration — a 1e-12-scale
    * bias identical in both engines; classic double-precision PageRank
    * would instead be non-reproducible ACROSS RUNS of the same engine.)
    *
    * Scale shape: the rank vector is |nodes| rows; each iteration is one
    * join of edges (partitioned by src) against it plus a map-side-
    * combined sum over dst. Three fixed iterations unroll into the plan —
    * at 100 TB you'd checkpoint between them; the shape per iteration is
    * unchanged.
    */
  def pagerank(edges: DataFrame, iters: Int,
      afterAdjacency: () => Unit = () => ()): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val session = edges.sparkSession
    // GraphX/Pregel layout, sized by what each frame actually is:
    //
    //  - adjacency = BARE (src, dst) pairs, hash-partitioned by src once
    //    and checkpointed DISK_ONLY. It is the one |edges|-sized frame
    //    (1.17B rows at sf100): as a default MEMORY_AND_DISK checkpoint
    //    its deserialized blocks fill the unified region and are PINNED
    //    by the iteration join's open scan, starving the contribution
    //    hash-aggregate in the same stage (AGGREGATE_OUT_OF_MEMORY at
    //    sf100); on lz4 disk (spark.rdd.compress) the scan streams
    //    ~4x-smaller blocks and the unified region stays free. Out-degree
    //    is NOT stored per edge — that widened the frame 50% for a value
    //    that is a property of the NODE: it lives in the |nodes|-sized
    //    deg frame and folds into the rank vector before each iteration
    //    (a nodes-by-nodes join, co-partitioned and cheap).
    //  - each iteration shuffles only the |nodes|-sized prepared rank
    //    into the adjacency's partitioning (localCheckpoint preserves
    //    outputPartitioning, so EnsureRequirements inserts no exchange
    //    on the edge side); the contribution aggregation's dst exchange
    //    is the one irreducible |edges| shuffle per iteration (that IS
    //    the sparse matrix-vector product).
    //  - the rank vector is EAGERLY checkpointed after every iteration
    //    and the previous iteration's now-unreachable shuffle files are
    //    GC-reclaimed before the next iteration writes its own. With the
    //    3 iterations unrolled lazily into ONE job, all three |edges|
    //    shuffles were live simultaneously and overran local disk at
    //    sf100 (together with the old 3-column adjacency + a redundant
    //    pair-set checkpoint, >35 GB); peak disk is now one adjacency +
    //    one live shuffle. An earlier form also checkpointed the full
    //    directed STRING-keyed edge list — same lesson, worse constant.
    // the caller typically just materialized its own edge staging (g1's
    // eager pair-set checkpoint) — reclaim those build shuffles before
    // the adjacency build writes its own
    reclaimTransients(session)
    val e = edges.select(col("src"), col("dst"))
    // EAGER + reclaim: materialize the adjacency now and immediately
    // free its build shuffle (1.17B-row repartition, ~10 GB of files) —
    // left lazy, those files stay live alongside the iteration shuffles
    val adj = e.repartition(col("src"))
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    // the adjacency now owns the edge data — let the caller release its
    // staging (g1 unpersists the pair-set checkpoint here: ~8 GB of
    // blocks that would otherwise sit on disk through every iteration)
    afterAdjacency()
    reclaimTransients(session)
    // deg/nodes re-read the src-partitioned checkpoint exchange-free;
    // nothing recomputes the edge derivation
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val nodes = adj.select(col("src").as("id")).distinct().localCheckpoint(false)
    val n = nodes.count()
    val teleport = (150000000000L / n) * 1L // 0.15 * 1e12, floored once
    var pr = nodes.select(col("id"), lit(1000000000000L / n).as("pr"))
    for (_ <- 1 to iters) {
      // fold outdeg into the rank side (both |nodes|-sized, same
      // partitioning) so the edge probe carries ready-made contributions
      val prepared = pr.join(deg, pr("id") === deg("src"))
        .select(col("id"), expr("pr div outdeg").as("contrib"))
      val inflow = adj.join(prepared, col("id") === adj("src"))
        .select(col("dst"), col("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val next = nodes.join(inflow, nodes("id") === inflow("dst"), "left")
        .select(nodes("id"),
          (lit(teleport) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      // eager: materialize now, truncate lineage, then let the cleaner
      // drop the previous iteration's shuffle files (they are this
      // loop's only multi-GB transients)
      pr = next.localCheckpoint(true)
      reclaimTransients(session)
    }
    pr
  }

  /** Reclaim dead shuffle files DETERMINISTICALLY at an iteration
    * barrier. Waiting on gc was measured useless here: the DAGScheduler
    * registry strongly references every ShuffleDependency until later
    * job activity, so the ContextCleaner's weak refs never fire on a
    * quiet context and a 17 GB build shuffle survived gc + 90 s of
    * polling. `GraftShuffleReaper.dropAll` removes every registered
    * shuffle, blocking — safe exactly at these call sites because all
    * live frames were just eagerly checkpointed (worst case Spark
    * recomputes a dropped shuffle from lineage: perf, never
    * correctness). At sf100 each reclaimed build/iteration shuffle is
    * ~10-17 GB of local disk on a 35 GB budget — the difference between
    * completing and No-space. The gc afterwards lets the block manager
    * release any now-dead checkpoint blocks too (ce.unpersist).
    */
  private def reclaimTransients(s: SparkSession): Unit = {
    org.apache.spark.GraftShuffleReaper.dropAll(s.sparkContext)
    System.gc()
  }

  def qs: Seq[Q] = Seq(
    Q(
      "g1_pagerank",
      (s, dir) => {
        // undirected bipartite co-purchase graph: c<->s whenever customer
        // c ordered a line from supplier s. Integer namespacing (2k for
        // customers, 2k+1 for suppliers) keeps the key spaces disjoint at
        // 16 bytes/edge — the string form ("c123") cost ~2.5x the block
        // store and hit disk-full at sf100. The distinct pair set is
        // checkpointed (DISK_ONLY, lz4 — 587M pairs at sf100) because
        // the bidirectional union consumes it twice; without it the
        // orders⋈lineitem distinct would run twice in one job. pagerank
        // then pins its own src-partitioned adjacency for the
        // iterations.
        val ce = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("c"),
            (col("l_suppkey").cast("long") * 2 + 1).as("s"))
          .distinct()
          // |pairs|-sized (587M at sf100) — DISK_ONLY for the same
          // unified-region reasons as the adjacency checkpoint, EAGER so
          // the 600M-row join+distinct build shuffles (~25 GB of files)
          // are reclaimed before the adjacency build writes its own
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val edges = ce.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(ce.select(col("s").as("src"), col("c").as("dst")))
        // once pagerank's adjacency is materialized the pair set is dead
        // weight — drop its blocks so iterations run against the
        // adjacency alone (at sf100 this returns ~8 GB of scratch)
        pagerank(edges, 3, afterAdjacency = () => { ce.unpersist(true); () })
      },
      Some("""WITH ce AS (SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS s
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
              edges AS (SELECT c AS src, s AS dst FROM ce
                        UNION ALL SELECT s AS src, c AS dst FROM ce),
              nodes AS (SELECT DISTINCT src AS id FROM edges),
              nn AS (SELECT count(*) AS n FROM nodes),
              deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
              p0 AS (SELECT id, (1000000000000 // nn.n) AS pr FROM nodes, nn),
              c1 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                     FROM edges e JOIN deg d ON d.src = e.src
                          JOIN p0 p ON p.id = e.src GROUP BY e.dst),
              p1 AS (SELECT nodes.id,
                       ((150000000000 // nn.n) + (85 * coalesce(c1.inflow, 0)) // 100) AS pr
                     FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id),
              c2 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                     FROM edges e JOIN deg d ON d.src = e.src
                          JOIN p1 p ON p.id = e.src GROUP BY e.dst),
              p2 AS (SELECT nodes.id,
                       ((150000000000 // nn.n) + (85 * coalesce(c2.inflow, 0)) // 100) AS pr
                     FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id),
              c3 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                     FROM edges e JOIN deg d ON d.src = e.src
                          JOIN p2 p ON p.id = e.src GROUP BY e.dst),
              p3 AS (SELECT nodes.id,
                       ((150000000000 // nn.n) + (85 * coalesce(c3.inflow, 0)) // 100) AS pr
                     FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id)
              SELECT id, CAST(pr AS BIGINT) AS pr FROM p3"""),
      doc = "Graph: fixed-point integer PageRank (3 unrolled iterations, hash-exact)"))
}
