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
    * materializations and DISK_ONLY writes on a 10 MB input tripled g1's
    * sf0.1 time (1.75 → 5.36 s, BENCH_r07→r08). Same adaptive-execution
    * idea as DedupOps.hasDupShingleSets, with an even cheaper probe.
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
    * Scale shape (both modes), tuned so the per-iteration cost is ONE
    * read of the adjacency plus the one irreducible |edges| exchange
    * (the contribution aggregation — that IS the sparse matrix-vector
    * product), and nothing |edges|-sized is ever sorted at all:
    *
    *  - the adjacency is bare (src, dst) pairs, hash-partitioned by src
    *    with sortCols = Nil (the iteration joins are pinned
    *    shuffled-hash, so no operator ever demands the |edges| frame in
    *    sorted order and the build skips a 1.17B-row external sort),
    *    checkpointed through
    *    [[org.apache.spark.sql.GraftPartitionedCheckpoint]] so the
    *    layout survives the checkpoint boundary (a plain localCheckpoint
    *    reports UnknownPartitioning under AQE — the r7/r8 plans silently
    *    re-exchanged AND re-sorted the 1.17B-row adjacency EVERY
    *    iteration; that hidden 3× |edges| shuffle dominated the first
    *    disk-bound measurement, 1259 s vs r7's 655 s). With the layout
    *    visible and the joins hash-based, every iteration consumes the
    *    checkpoint scan directly: no exchange, no sort.
    *  - out-degree is a property of the NODE: it is aggregated once
    *    (exchange-free on the src-partitioned adjacency) and carried IN
    *    the |nodes|-sized rank vector, so each iteration's contribution
    *    is a row-local projection (`pr div outdeg`) — no per-iteration
    *    nodes⋈deg fold join, and no |edges|-wide out-degree column.
    *  - the rank update joins base(id) ⋈ inflow(dst) co-partitioned and
    *    hash-based; the rank checkpoints claim partitioning only (no
    *    ordering), so later iterations exchange nothing on the rank side
    *    either and nothing is ever sorted on either side of any join.
    *
    * `diskBound` selects the storage/reclamation regime:
    *
    *  - false (default; inputs that fit scratch with room to spare): the
    *    adjacency and rank vectors are LAZY memory-and-disk
    *    localCheckpoints; the three iterations unroll into one job and
    *    the ContextCleaner reclaims shuffles whenever GC runs. Fastest
    *    at sf≤10 — no blocking materializations.
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
    * (cached signature frames, concurrent streams) is never reaped. The
    * dead rank checkpoints themselves (|nodes|-sized, ~100 MB) are left
    * to the ContextCleaner — the forced System.gc() an earlier form used
    * to free them cost multi-second full-GC pauses per barrier on a 64g
    * heap for megabytes of disk.
    */
  def pagerank(edges: DataFrame, iters: Int,
      diskBound: Boolean = false,
      reapKeep: Set[Int] = Set.empty,
      dedupEdges: Boolean = false): DataFrame = {
    // Reaper safety contract: the snapshot-then-reap is check-then-act —
    // a shuffle registered by a CONCURRENT operator after the caller took
    // `reapKeep` would not be in the keep set and would be reaped. That
    // single-concurrent-operator assumption is now ENFORCED, not
    // documented (VERDICT r10 #4): the diskBound run holds the reaper's
    // JVM-wide owner slot for its whole snapshot→reap scope, so a second
    // disk-bounded operator fails loudly at acquire instead of silently
    // losing shuffles. The eager per-iteration checkpoints mean all
    // reaping happens INSIDE this call — the returned frame is
    // checkpoint-backed and needs no reaper after release.
    if (diskBound) org.apache.spark.GraftShuffleReaper.acquire("g1-pagerank")
    try pagerankImpl(edges, iters, diskBound, reapKeep, dedupEdges)
    finally if (diskBound) org.apache.spark.GraftShuffleReaper.release("g1-pagerank")
  }

  private def pagerankImpl(edges: DataFrame, iters: Int,
      diskBound: Boolean,
      reapKeep: Set[Int],
      dedupEdges: Boolean): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val session = edges.sparkSession
    def reclaim(): Unit = if (diskBound)
      org.apache.spark.GraftShuffleReaper.dropCreatedSince(session.sparkContext, reapKeep)
    // r11 A/B knob (VERDICT r10 #7): the int32 probe showed g1's remaining
    // cost is compressed-entropy-bound block IO, so the lever worth
    // measuring is WHERE the compressed bytes live, not how wide the rows
    // are. MEMORY_AND_DISK_SER stores the SAME serialized+lz4 bytes
    // (spark.rdd.compress applies to serialized memory blocks too) in the
    // unified pool with disk overflow — if the adjacency fits, every
    // iteration rescans from RAM instead of disk. Env-gated for the
    // back-to-back probe; the default stays measurement-driven (SCALE.md
    // r11 table).
    val level =
      if (!diskBound) StorageLevel.MEMORY_AND_DISK
      else if (sys.env.get("SPARK_GRAFT_G1_LEVEL").contains("mem_ser"))
        StorageLevel.MEMORY_AND_DISK_SER
      else StorageLevel.DISK_ONLY
    val parts = session.conf.get("spark.sql.shuffle.partitions").toInt
    // SPARK_GRAFT_G1_PHASES=1: stderr wall-clock per phase (adjacency /
    // base / count / each iteration) — the only way to attribute a
    // multi-hundred-second diskBound run, since the quieted log4j config
    // drops the DAGScheduler stage lines
    val phases = sys.env.get("SPARK_GRAFT_G1_PHASES").contains("1")
    var t0 = System.nanoTime()
    def phase(name: String): Unit = if (phases) {
      val t1 = System.nanoTime()
      System.err.println(f"[g1-phase] $name ${(t1 - t0) / 1e9}%.1f s")
      t0 = t1
    }
    // layout-preserving checkpoints (GraftPartitionedCheckpoint): plain
    // localCheckpoint reports UnknownPartitioning under AQE, so every
    // iteration re-exchanged AND re-sorted the full adjacency — the
    // r7/r8 plans carried that hidden |edges| shuffle ×3. dedupEdges
    // folds the caller's edge-dedup into the same repartition (one
    // |edges| shuffle builds the adjacency, total), so the whole build
    // is a single pipelined job: scan → join → explode → exchange →
    // dedup → sort → store.
    // NO within-partition sort on the adjacency: the iteration joins are
    // pinned shuffled-hash in the diskBound regime (the |nodes|-sized rank
    // frame is the build side — ~130k entries per task at sf100), so
    // nothing ever needs the |edges| frame in sorted order and the build
    // skips a 1.17B-row external sort. At small sf the un-hinted planner
    // broadcasts the rank side, which needs no order either.
    // r16 A/B knob (OPTIMIZATION_r15 "not yet optimized" #1):
    // SPARK_GRAFT_G1_SMALL=reuse drops the small-sf block-store
    // checkpoints and leaves the claimed-layout repartition IN the plan,
    // so the three unrolled iterations share the adjacency exchange via
    // ReuseExchange (shuffle files read 3x) instead of scanning
    // checkpoint blocks. Trade: no block-store write/scan, but the
    // dedup/outdeg aggregates ABOVE the reused exchange re-run once per
    // consumer. Non-diskBound only — the sf100 regime keeps its eager
    // DISK_ONLY checkpoints and reaper unconditionally.
    val reuseSmall = !diskBound && sys.env.get("SPARK_GRAFT_G1_SMALL").contains("reuse")
    val adj =
      if (reuseSmall) {
        val p = edges.select(col("src"), col("dst"))
          .repartition(parts, col("src"))
        if (dedupEdges) p.dropDuplicates("src", "dst") else p
      } else org.apache.spark.sql.GraftPartitionedCheckpoint(
        edges.select(col("src"), col("dst")),
        parts, Seq("src"), Nil, eager = diskBound, level,
        dedupCols = if (dedupEdges) Seq("src", "dst") else Nil)
    // the adjacency owns the edge data now — the caller's build shuffles
    // (orders⋈lineitem join, ~12 GB at sf100) and the repartition above
    // are dead; reclaim before the iterations write
    phase("adjacency")
    reclaim()
    phase("reclaim-build")
    // (id, outdeg): one exchange-free pass over the src-partitioned
    // adjacency; |nodes|-sized, checkpointed because every iteration's
    // rank update re-reads it
    val baseAgg = adj.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("id"), col("outdeg"))
    val base =
      if (reuseSmall) baseAgg
      else org.apache.spark.sql.GraftPartitionedCheckpoint(
        baseAgg, parts, Seq("id"), Nil, eager = diskBound, level)
    phase("base")
    val n = base.count()
    phase("count")
    val teleport = (150000000000L / n) * 1L // 0.15 * 1e12, floored once
    // rank vector carries outdeg alongside pr: (id, outdeg, pr)
    var pr = base.withColumn("pr", lit(1000000000000L / n))
    // Iteration joins are pinned shuffled-hash with the |nodes|-sized
    // side as build: both sides of each join already sit in the SAME
    // claimed HashPartitioning, so the join is exchange-free either way,
    // but sort-merge would demand BOTH sides sorted — an |edges|-sized
    // sort the adjacency deliberately no longer has (at sf1/sf10 the
    // rank side is past the broadcast threshold, so the un-hinted
    // planner would SMJ and re-sort the full adjacency EVERY iteration).
    // The hash build is per-task |nodes|/parts entries — ~130k at sf100.
    // The hint also displaces broadcast at tiny sf, where the two are
    // equivalent here: the probe side is already partitioned, so
    // broadcast saves no exchange, and the per-task builds are micromaps.
    def rankSide(df: DataFrame): DataFrame = df.hint("shuffle_hash")
    for (_ <- 1 to iters) {
      // row-local: each node's ready-made contribution, no fold join
      val prepared = rankSide(pr.select(col("id"), expr("pr div outdeg").as("contrib")))
      val inflow = adj.join(prepared, col("id") === adj("src"))
        .select(col("dst"), col("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val next = base.join(rankSide(inflow), base("id") === inflow("dst"), "left")
        .select(base("id"), base("outdeg"),
          (lit(teleport) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      // diskBound: materialize now (layout-claimed, so the next
      // iteration's rank-side consumption is exchange-free), truncate
      // lineage, then drop the previous iteration's shuffle files (this
      // loop's only multi-GB transients). Otherwise: no checkpoint at
      // all — the iterations unroll into ONE job (r7's shape), and the
      // full tree stays visible to the plan-fingerprint harness instead
      // of collapsing to a single ExistingRDD scan line.
      pr = if (diskBound) {
        val p = org.apache.spark.sql.GraftPartitionedCheckpoint(
          next, parts, Seq("id"), Nil, eager = true, level)
        reclaim(); phase("iter"); p
      } else next
    }
    pr.select(col("id"), col("pr"))
  }

  def qs: Seq[Q] = Seq(
    Q(
      "g1_pagerank",
      (s, dir) => {
        // undirected bipartite co-purchase graph: c<->s whenever customer
        // c ordered a line from supplier s. Integer namespacing (2k for
        // customers, 2k+1 for suppliers) keeps the key spaces disjoint,
        // and the namespaced ids are INT32: 8 bytes/edge halves the
        // DISK_ONLY adjacency store, the build shuffle, and every
        // per-iteration contribution exchange — the three quantities
        // that dominate the diskBound band (r9: 16-byte edges, 443-518 s
        // at sf100). Domain bound: 2*custkey < 2^31 holds to custkey
        // ~1.07e9 (sf100 has 15M; ScaleUp keeps replica keys dense), and
        // ANSI mode (Spark 4 default) makes an overflowing cast a loud
        // runtime error, never a silent wrap. The string form ("c123")
        // cost ~2.5x the block store and hit disk-full at sf100; the
        // output widens id back to BIGINT so the oracle schema is
        // unchanged. Pair DEDUP rides the
        // adjacency build: each raw co-purchase pair explodes into its
        // two directions FIRST, and the duplicate directed edges are
        // dropped inside the adjacency's src-partitioning (dedupEdges —
        // HashPartitioning(src) clusters (src,dst), so the dedup costs
        // no exchange; a duplicated pair duplicates BOTH of its directed
        // edges, so dedup-by-(src,dst) ≡ distinct-on-pairs). Earlier
        // forms paid a dedicated 600M-row distinct shuffle plus — once
        // the overlapping build shuffles overran sf100 disk — an eager
        // 587M-row pair-set staging checkpoint between them; fused, the
        // build is one pipelined job, two shuffles total (the join and
        // the adjacency repartition), and peak scratch stays ~30 GB
        // without any staging barrier.
        val diskBound = tableBytes(s, dir, "lineitem") >= DiskBoundThresholdBytes
        // reap scope: everything alive BEFORE g1 builds anything is
        // someone else's (cached family frames, streams) — keep it
        val keep = if (diskBound)
          org.apache.spark.GraftShuffleReaper.liveIds(s.sparkContext)
        else Set.empty[Int]
        // diskBound: the build join is big-big (150M orders ⋈ 600M
        // lineitem at sf100) — the default sort-merge strategy sorts BOTH
        // shuffled sides (9.6 GB + 2.4 GB of external-sort work, the
        // probe's 7 GB spill) to produce a stream whose order the next
        // operator (the src repartition) immediately destroys. A shuffled
        // hash join builds a 1.2M-entry per-task map on the orders side
        // and streams lineitem unsorted: zero sorts, zero spill. At small
        // sf the un-hinted planner broadcasts orders, which is better
        // still — the hint would override it, so it is scale-gated.
        val ordersSide = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val edges = (if (diskBound) ordersSide.hint("shuffle_hash") else ordersSide)
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey").cast("int") * 2).as("c"),
            (col("l_suppkey").cast("int") * 2 + 1).as("s"))
          .select(explode(array(
            struct(col("c").as("src"), col("s").as("dst")),
            struct(col("s").as("src"), col("c").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        pagerank(edges, 3, diskBound = diskBound, reapKeep = keep,
          dedupEdges = true)
          .select(col("id").cast("long").as("id"), col("pr"))
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
