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

  /** Input-size probe for the disk-bound path: total bytes of one table's
    * parquet under the scale dir, read from filesystem metadata (no Spark
    * job). The eager-checkpoint + shuffle-reaper machinery below exists to
    * survive a ~35 GB scratch budget at sf100; paying its blocking
    * materializations, DISK_ONLY writes, and System.gc pauses on a 10 MB
    * input tripled g1's sf0.1 time (1.75 → 5.36 s, BENCH_r07→r08). Same
    * adaptive-execution idea as DedupOps.hasDupShingleSets, with an even
    * cheaper probe.
    */
  private[queries] def tableBytes(s: SparkSession, dir: String, table: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Above this many bytes of edge-source table the iteration state goes
    * DISK_ONLY with deterministic shuffle reclamation (the sf100 regime:
    * 11 GB of lineitem → 1.17B edges → ~10-17 GB per live shuffle);
    * below it (three measured decades: sf0.1/sf1/sf10, ≤1.1 GB) lazy
    * memory-backed checkpoints are strictly faster and scratch never
    * approaches the budget.
    */
  private[queries] val DiskBoundThresholdBytes: Long = 4L << 30

  /** Fixed-point PageRank: ranks are BIGINT trillionths, every step is
    * integer floor arithmetic (`div`), so partial-aggregation order can
    * never move a bit and the DuckDB oracle hash-matches exactly. (The
    * floors leak ~1 unit of mass per node per iteration — a 1e-12-scale
    * bias identical in both engines; classic double-precision PageRank
    * would instead be non-reproducible ACROSS RUNS of the same engine.)
    *
    * Scale shape (both modes): the rank vector is |nodes| rows; each
    * iteration folds out-degree into it (a nodes-by-nodes co-partitioned
    * join) and shuffles only that prepared |nodes|-sized frame into the
    * adjacency's src partitioning (localCheckpoint preserves
    * outputPartitioning, so EnsureRequirements inserts no exchange on the
    * edge side); the contribution aggregation's dst exchange is the one
    * irreducible |edges| shuffle per iteration — that IS the sparse
    * matrix-vector product.
    *
    * `diskBound` selects the storage/reclamation regime:
    *
    *  - false (default; inputs that fit scratch with room to spare): the
    *    adjacency and rank vectors are LAZY memory-and-disk
    *    localCheckpoints; the three iterations unroll into one job and
    *    the ContextCleaner reclaims shuffles whenever GC runs. Fastest
    *    at sf≤10 — no blocking materializations, no forced gc.
    *
    *  - true (the sf100 regime): every multi-GB transient is EAGERLY
    *    materialized and the previous step's now-dead shuffle files are
    *    reclaimed at each barrier, because with the iterations unrolled
    *    lazily ALL THREE |edges| shuffles are live simultaneously and
    *    overran local disk at sf100 (together with the old 3-column
    *    adjacency + a redundant pair-set checkpoint, >35 GB); peak disk
    *    becomes one adjacency + one live shuffle. The adjacency is
    *    DISK_ONLY: deserialized MEMORY_AND_DISK blocks of the one
    *    |edges|-sized frame (1.17B rows at sf100) fill the unified
    *    region and are PINNED by the iteration join's open scan,
    *    starving the contribution hash-aggregate in the same stage
    *    (AGGREGATE_OUT_OF_MEMORY at sf100); on lz4 disk
    *    (spark.rdd.compress) the scan streams ~4x-smaller blocks and
    *    the unified region stays free.
    *
    * Reclamation is SCOPED (ADVICE r8): `reapKeep` is the set of shuffle
    * ids alive before the CALLER started building this operator's inputs
    * — only ids registered after it are dropped, so shared-session state
    * (cached signature frames, concurrent streams) is never reaped.
    */
  def pagerank(edges: DataFrame, iters: Int,
      afterAdjacency: () => Unit = () => (),
      diskBound: Boolean = false,
      reapKeep: Set[Int] = Set.empty): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val session = edges.sparkSession
    def reclaim(): Unit = if (diskBound) {
      org.apache.spark.GraftShuffleReaper.dropCreatedSince(session.sparkContext, reapKeep)
      // lets the block manager release now-dead checkpoint blocks too
      // (the caller's unpersist in afterAdjacency)
      System.gc()
    }
    def ckpt(df: DataFrame): DataFrame =
      if (diskBound) df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      else df.localCheckpoint(false)
    // the caller typically just materialized its own edge staging (g1's
    // eager pair-set checkpoint) — reclaim those build shuffles before
    // the adjacency build writes its own
    reclaim()
    val e = edges.select(col("src"), col("dst"))
    // bare (src, dst) pairs, hash-partitioned by src once. Out-degree is
    // NOT stored per edge — that widened the |edges|-sized frame 50% for
    // a value that is a property of the NODE: it lives in the
    // |nodes|-sized deg frame and folds into the rank vector before each
    // iteration.
    val adj = ckpt(e.repartition(col("src")))
    // the adjacency now owns the edge data — let the caller release its
    // staging (g1 unpersists the pair-set checkpoint here: ~8 GB of
    // blocks that would otherwise sit on disk through every iteration)
    afterAdjacency()
    reclaim()
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
      // diskBound: materialize now, truncate lineage, then drop the
      // previous iteration's shuffle files (this loop's only multi-GB
      // transients). Otherwise: no checkpoint at all — the iterations
      // unroll into ONE job (r7's shape), and the full tree stays
      // visible to the plan-fingerprint harness instead of collapsing
      // to a single ExistingRDD scan line.
      pr = if (diskBound) { val p = ckpt(next); reclaim(); p } else next
    }
    pr
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
        // checkpointed because the bidirectional union consumes it twice;
        // without it the orders⋈lineitem distinct would run twice in one
        // job. pagerank then pins its own src-partitioned adjacency for
        // the iterations.
        val diskBound = tableBytes(s, dir, "lineitem") >= DiskBoundThresholdBytes
        // reap scope: everything alive BEFORE g1 builds anything is
        // someone else's (cached family frames, streams) — keep it
        val keep = if (diskBound)
          org.apache.spark.GraftShuffleReaper.liveIds(s.sparkContext)
        else Set.empty[Int]
        val pairs = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("c"),
            (col("l_suppkey").cast("long") * 2 + 1).as("s"))
          .distinct()
        // |pairs|-sized (587M at sf100) — DISK_ONLY for the same
        // unified-region reasons as the adjacency checkpoint, EAGER so
        // the 600M-row join+distinct build shuffles (~25 GB of files)
        // are reclaimed before the adjacency build writes its own
        val ce = if (diskBound)
          pairs.localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
        else pairs.localCheckpoint(false)
        val edges = ce.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(ce.select(col("s").as("src"), col("c").as("dst")))
        // once pagerank's adjacency is materialized the pair set is dead
        // weight — drop its blocks so iterations run against the
        // adjacency alone (at sf100 this returns ~8 GB of scratch)
        pagerank(edges, 3, afterAdjacency = () => { ce.unpersist(true); () },
          diskBound = diskBound, reapKeep = keep)
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
