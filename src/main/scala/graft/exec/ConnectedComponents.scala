package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge frame — the clustering step that
  * turns near-duplicate PAIRS (MinHash / SimHash / embedding candidates)
  * into duplicate GROUPS with one canonical representative (min id) per
  * group, so a training-data pipeline can keep exactly one member.
  *
  * Two distributed algorithms, both shuffle-per-round with
  * `localCheckpoint` barriers (the lineage would otherwise double per
  * iteration):
  *  - [[starContraction]] (the default): alternating large-star /
  *    small-star rounds (Kiveris et al., "Connected Components in
  *    MapReduce and Beyond") — O(log n) rounds on ANY topology, so a
  *    100 TB graph with long chains converges in tens of rounds, not
  *    diameter rounds. Each half-round is one per-node min + one join —
  *    the same shuffle profile as a label round.
  *  - [[minLabelPropagation]]: min-label flooding, O(diameter) rounds.
  *    Near-dup components are overwhelmingly tiny (pairs/triples), so on
  *    dedup graphs it converges in 2–4 rounds; kept as the
  *    low-constant-factor option and as an independent implementation the
  *    spec cross-checks star contraction against.
  */
object ConnectedComponents {

  /** Layout-preserving checkpoints for the iteration frames — MEASURED NET
    * NEGATIVE here, so the default is OFF (`SPARK_GRAFT_CC_CLAIMED=1`
    * re-enables the experiment; `graft.CcProbe` reproduces the A/B).
    *
    * The hypothesis (r9 verdict): a plain localCheckpoint under AQE
    * reports UnknownPartitioning (the g1 discovery), so claiming the
    * layout should spare the per-round re-exchanges. The 44–50M-edge
    * probes split the effect in two (SCALE.md r10): the SHJ HINTS alone
    * (sort elimination) are a 1.80× win on star contraction (651.8 →
    * 362.3 s) and are now unconditional; the layout CLAIMS on top are a
    * measured LOSS (star 362.3 → 487.6 s; min-label 240.2 → 265.8 s).
    * Why the claims lose: they save the per-round edge-frame exchange
    * but BUY an upfront pinned REPARTITION_BY_NUM, an extra per-round
    * repartition of the label frame (whose aggregation output was
    * already correctly partitioned — the claim re-shuffles it only to
    * make the layout *visible*), and they pin the partition count,
    * blocking the AQE coalescing that star contraction's geometrically
    * shrinking rounds feed on. g1's claim won because its state is
    * SIZE-STABLE and |edges|-scale; CC's is neither. Claim a layout when
    * the frame is large, size-stable, and reused with the same keying;
    * hint away sorts regardless.
    */
  private[graft] def claimed: Boolean =
    sys.env.get("SPARK_GRAFT_CC_CLAIMED").contains("1")

  /** Pinned shuffled-hash joins, SIZE-GATED — independently of the layout
    * claim, they are the big win: un-hinted, every round's edge⋈mins join
    * is sort-merge and SORTS the |2·edges| frame (and the mins side) per
    * round; the hint eliminates every per-round sort exactly as it did
    * for g1's iteration joins. Probe, 49.5M-edge star contraction:
    * 651.8 s un-hinted → 362.3 s hinted (1.80×).
    *
    * The gate (ADVICE r10): Spark's shuffled-hash build side cannot
    * spill, so at billions of nodes with a modest partition count the
    * per-task mins/labels build map would OOM where sort-merge spills.
    * The build side here is always the |nodes|-bounded min/label frame,
    * and the caller knows the current edge count (checksum/label-sum
    * aggregates carry it for free), so the hint applies only while
    * estBuildRows/partition stays under [[MaxHashBuildRowsPerTask]] —
    * past that, the plain sort-merge plan (spillable, the pre-r10 shape)
    * is the safe one. 4M entries ≈ ~200 MB of hash relation per task;
    * rounds shrink geometrically, so a huge graph re-enters the hinted
    * regime after its first few contractions.
    */
  private[exec] val MaxHashBuildRowsPerTask = 4L << 20
  private[exec] def hinted(df: DataFrame, estBuildRows: Long): DataFrame = {
    val parts = math.max(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, 1)
    if (estBuildRows / parts <= MaxHashBuildRowsPerTask) df.hint("shuffle_hash")
    else df
  }

  /** Above this edge count the iteration frames checkpoint SERIALIZED
    * (lz4 via spark.rdd.compress) instead of as deserialized row objects.
    * Deserialized MEMORY_AND_DISK stores a per-row OBJECT copy (~3.5× the
    * 16 UnsafeRow bytes of a (long,long) edge), and the store path
    * (`MemoryStore.putIteratorAsValues`) unrolls per task — at 198M edges
    * on a 64g local[32] heap, 32 concurrent unrollers OOM'd the JVM
    * before eviction could help (r11 probe, stage-28 heap OOM). The r10
    * probes measured 49.5M edges safe and fast deserialized, so the
    * switch sits just past the proven point: big graphs trade per-row
    * serialization CPU for bounded, compressed block memory — the same
    * trade g1's diskBound adjacency makes.
    */
  private[exec] val SerCkptEdgeThreshold = 50L * 1000 * 1000

  private[exec] def ckptLevel(edges: Long): org.apache.spark.storage.StorageLevel =
    if (edges > SerCkptEdgeThreshold)
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Exact edge count for the checkpoint-level decision when the caller
    * didn't pass one (ADVICE r11: a knownEdges = -1 seed used to
    * checkpoint the 2|edges| frames DESERIALIZED — the exact 198M-edge
    * OOM mode ckptLevel exists to prevent). One cheap count aggregate of
    * the input, paid only on the unknown path; every engine call site
    * (components()'s dispatch count, the probes' closed forms) passes
    * the count and skips it.
    */
  private[exec] def countIfUnknown(edges: DataFrame, knownEdges: Long): Long =
    if (knownEdges >= 0) knownEdges else edges.count()

  /** Per-round shuffle-scratch reclamation (VERDICT r11 #3), mirroring
    * g1's diskBound mode: each contraction/propagation round writes
    * O(|edges|) of shuffle files (5 shuffles/round in star contraction —
    * +16 GB/round at 198M edges) that the ContextCleaner only frees on
    * lineage GC, so scratch grows LINEARLY in rounds and was the named
    * next-decade wall at ~800M–2B edges (SCALE.md r11). At each round
    * barrier every live frame (raw/e/bidir/labels) is checkpoint-backed
    * and just materialized by the round's own aggregate, so dropping the
    * round's shuffles is pure disk win — peak scratch becomes one
    * round's volume, not the sum over rounds. The reaper's JVM-wide
    * owner slot is held for the whole loop (acquire throws against a
    * concurrent disk-bounded operator), and dropCreatedSince itself
    * skips loudly if jobs are somehow active at the barrier.
    */
  private def reapBarrier(df: DataFrame, diskBound: Boolean,
      reapKeep: Set[Int]): Unit =
    if (diskBound)
      org.apache.spark.GraftShuffleReaper.dropCreatedSince(
        df.sparkSession.sparkContext, reapKeep)

  /** Checkpoint `df` deduplicated by (u, v) with a claimed hash(`keyCol`)
    * layout — the dedup rides the repartition (keyCol ⊆ dedup cols), so
    * this costs the same one shuffle as the `.distinct()` it replaces.
    * Trade-off vs distinct's (u,v) keying: partitions follow keyCol alone,
    * so a hub node's edges land in one partition and AQE cannot split it
    * (REPARTITION_BY_NUM is pinned — that pinning is what makes the claim
    * safe). Collapsed near-dup graphs have bounded degree, so the skew
    * exposure is the same one g1 accepted for its adjacency.
    */
  private def dedupCkpt(df: DataFrame, keyCol: String,
      level: org.apache.spark.storage.StorageLevel): DataFrame =
    if (claimed) {
      val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      org.apache.spark.sql.GraftPartitionedCheckpoint(
        df, parts, Seq(keyCol), Nil, eager = false, level,
        dedupCols = Seq("u", "v"))
    } else df.distinct().localCheckpoint(false, level)

  /** Size-adaptive entry point — the broadcast-join logic applied to graph
    * clustering: a small edge set (it is known exactly after candidate
    * generation) is solved with driver-side union-find in one collect,
    * skipping the per-round shuffle+checkpoint cost entirely; a large one
    * runs the distributed [[starContraction]]. Near-dup graphs at
    * high thresholds are edge-sparse, so the local path is the common case
    * even on huge corpora — the star loop is the safety net, not the
    * default.
    *
    * @param edges undirected edge frame (one row per pair, either order)
    * @return frame (id, label): label = min node id in the component
    */
  def components(
      edges: DataFrame, srcCol: String, dstCol: String,
      localThreshold: Long = 1L << 20, maxIter: Int = 30,
      diskBound: Boolean = false, reapKeep: Set[Int] = Set.empty): DataFrame = {
    val fwd = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(false)
    val n = fwd.count()
    // dispatch disclosure: decade forensics need to know WHICH path a
    // measured run took (the distributed loop's perf work is invisible in
    // a run where the local path fired)
    System.err.println(s"[cc] $n collapsed edges -> " +
      (if (n > localThreshold) "distributed star contraction" else "driver union-find"))
    if (n > localThreshold)
      starContraction(fwd, "src", "dst", maxIter, knownEdges = n,
        diskBound = diskBound, reapKeep = reapKeep)
    else {
      // union-find with path halving; roots then remapped to component min
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent(x) != x) {
          parent(x) = parent(parent(x))
          x = parent(x)
        }
        x
      }
      fwd.collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
      parent.keys.foreach { n =>
        val r = find(n)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
      }
      val spark = edges.sparkSession
      import spark.implicits._
      parent.keys.toSeq.sorted.map(n => (n, minOfRoot(find(n)))).toDF("id", "label")
    }
  }

  /** Alternating large-star / small-star contraction — the O(log n)-round
    * distributed path of [[components]].
    *
    * Edges are kept CANONICAL (u > v) throughout. One round is:
    *  - large-star: per node u over BOTH edge directions, m = min of u and
    *    its neighborhood; every neighbor v > u re-attaches as (v, m).
    *    High-degree hubs thus shed their larger neighbors onto the local
    *    min in one shuffle — this is the step that collapses chains
    *    logarithmically.
    *  - small-star: per node u over canonical (smaller) neighbors,
    *    m = min neighbor; u and its other smaller neighbors re-attach to
    *    m. At the fixed point every component is a star centered on its
    *    min id.
    * Convergence: star sets are exactly the fixed points of
    * small∘large, detected by a cheap per-round checksum
    * (count + endpoint sums + a product hash) CONFIRMED by an exact
    * symmetric-difference check before exiting — the checksum alone only
    * gates when the expensive exact comparison runs, so a collision can
    * delay nothing and break nothing.
    *
    * Exhausting `maxIter` without reaching the fixed point THROWS: the
    * post-loop labeling assumes the edge set is a star set, so continuing
    * would silently emit wrong component labels — on a 100 TB corpus this
    * is the one failure mode nobody would notice until a downstream model
    * trained on mislabeled duplicates. A too-small round budget must
    * surface as a loud job failure the operator can retry with a larger
    * `maxIter`, never as plausible-looking output.
    *
    * @param edges undirected edge frame (one row per pair, either order)
    * @return frame (id, label): label = min node id in the component
    */
  def starContraction(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 30,
      knownEdges: Long = -1, diskBound: Boolean = false,
      reapKeep: Set[Int] = Set.empty): DataFrame = {
    // g1's bracket pattern: the diskBound loop holds the reaper's owner
    // slot for its whole snapshot→reap scope, so a concurrent
    // disk-bounded operator fails loudly at acquire instead of silently
    // losing shuffles. The returned frame is checkpoint-backed — no
    // reaping needed after release.
    if (diskBound) org.apache.spark.GraftShuffleReaper.acquire("cc-star")
    try starContractionImpl(edges, srcCol, dstCol, maxIter, knownEdges,
      diskBound, reapKeep)
    finally if (diskBound) org.apache.spark.GraftShuffleReaper.release("cc-star")
  }

  private def starContractionImpl(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int,
      knownEdges: Long, diskBound: Boolean, reapKeep: Set[Int]): DataFrame = {
    // checkpoint level is size-adaptive (ckptLevel): callers that already
    // know the edge count (components() counts it for dispatch; probes
    // construct it) pass knownEdges; unknown (-1) pays one count of the
    // input FIRST — seeding a big graph deserialized is the exact
    // 198M-edge unroller-OOM mode the level switch exists to prevent
    // (ADVICE r11). Per-round frames keep adapting from the checksum's
    // exact count as rounds shrink.
    val nEdges = countIfUnknown(edges, knownEdges)
    var lvl = ckptLevel(nEdges)
    // raw keeps self-loops: they contribute NODES (self-labeled at the
    // end) even though they contribute no contraction edges
    val raw = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .localCheckpoint(false, lvl) // consumed by the loop seed AND the node set
    var e = raw
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(false, lvl)

    // Every summed term is reduced below 2^20 FIRST, so the sums stay
    // exact to ~8e12 rows: the original sum(u) / sum((u%p)*(v%q)) terms
    // overflow a long (ANSI: job-killing SparkArithmeticException) at
    // ~40M edges — caught by the 50M-edge CcProbe run, round 10. Weaker
    // per-term entropy is fine: checksum equality only UNLOCKS the exact
    // exceptAll comparison below, it never decides convergence itself.
    def checksum(df: DataFrame): (Long, Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(col("u") % 1000003L), lit(0L)),
        coalesce(sum(col("v") % 1000033L), lit(0L)),
        coalesce(sum((col("u") % 1000003L) * (col("v") % 1000033L) % 999983L),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

    var prevSum = checksum(e)
    var converged = prevSum._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // build-side row bound for this round's hash joins: mins/mins2 have
      // one row per distinct node, and |nodes| <= 2*|edges|
      val estBuild = 2L * prevSum._1
      lvl = ckptLevel(prevSum._1) // rounds shrink; level tracks the count
      // large-star over both directions: m(u) = min(u, min neighbor)
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("m"))
      val large = dedupCkpt(
        bidir.join(hinted(mins, estBuild), "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")),
        "u", lvl) // two consumers below (groupBy + join)
      // small-star on canonical edges: m(u) = min smaller-neighbor
      val mins2 = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(hinted(mins2, estBuild), "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false, lvl)
      val s = checksum(next)
      // checksum equality only UNLOCKS the exact set comparison; the
      // except pass runs once per convergence, not once per round
      converged = s == prevSum &&
        next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      // round barrier: raw/e/next are checkpoint-backed and materialized
      // (checksum/exceptAll were actions over every partition), so this
      // round's ~5 O(|edges|) shuffles are pure scratch — reclaim them
      // now and peak shuffle disk stays one round's volume instead of
      // growing linearly in rounds (the named ~800M–2B-edge wall)
      reapBarrier(next, diskBound, reapKeep)
      prevSum = s
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge within maxIter=$maxIter rounds " +
          s"(${prevSum._1} edges still contracting); labels would be WRONG — " +
          "rerun with a larger maxIter")
    // fixed point = disjoint stars: u→center on the u side, the centers
    // label themselves on the v side
    val stars = e.select(col("u").as("id"), col("v").as("label"))
      .union(e.select(col("v").as("id"), col("v").as("label")))
      .groupBy(col("id")).agg(min(col("label")).as("label"))
    // nodes whose only edges were self-loops vanished with the a=b filter
    // but are still nodes (the union-find and min-label paths keep them) —
    // re-attach them self-labeled so all three implementations agree
    val nodes = raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id"))).distinct()
    stars.unionByName(
      nodes.join(stars, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label")))
  }

  /** Min-label flooding, O(diameter) rounds (also directly spec-tested —
    * it cross-checks [[starContraction]] on randomized graphs).
    *
    * @param edges undirected edge frame (one row per pair, either order)
    * @return frame (id, label): label = min node id in the component
    */
  def minLabelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20,
      knownEdges: Long = -1, diskBound: Boolean = false,
      reapKeep: Set[Int] = Set.empty): DataFrame = {
    if (diskBound) org.apache.spark.GraftShuffleReaper.acquire("cc-minlabel")
    try minLabelImpl(edges, srcCol, dstCol, maxIter, knownEdges, diskBound, reapKeep)
    finally if (diskBound) org.apache.spark.GraftShuffleReaper.release("cc-minlabel")
  }

  private def minLabelImpl(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int,
      knownEdges: Long, diskBound: Boolean, reapKeep: Set[Int]): DataFrame = {
    // no distinct() on the edge list: duplicate edges cannot change a min,
    // they only fan out the join a little — cheaper than a dedup shuffle
    val fwd = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // size-adaptive checkpoint level, same rationale as starContraction's
    // (bidir is 2|edges| rows — the biggest deserialized-OOM exposure);
    // an unknown count pays one cheap aggregate rather than seeding the
    // 2|edges| frame deserialized (ADVICE r11 — the comment used to claim
    // adaptation that never happened)
    val lvl = ckptLevel(countIfUnknown(fwd, knownEdges))
    // claimed regime (off by default, see `claimed`): bidir keeps the SAME
    // src keying across every propagation round, so claiming hash(src)
    // spares the per-round join exchange — but the probe measured the
    // plain shape faster net of the claim's own repartitions (SCALE.md r10)
    val bidirRaw = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val bidir =
      if (claimed) org.apache.spark.sql.GraftPartitionedCheckpoint(
        bidirRaw, parts, Seq("src"), Nil, eager = false, lvl)
      else bidirRaw.localCheckpoint(false, lvl)
    // label init FUSED with propagation round 1: each node's first label is
    // min(self, neighbors) from one aggregation, no init frame + no join
    def ckptLabels(df: DataFrame): DataFrame =
      if (claimed) org.apache.spark.sql.GraftPartitionedCheckpoint(
        df, parts, Seq("id"), Nil, eager = false, lvl)
      else df.localCheckpoint(false, lvl)
    var labels = ckptLabels(bidir.groupBy(col("src").as("id"))
      .agg(least(min(col("src")), min(col("dst"))).as("label")))
    // Convergence via the label-sum invariant: min-propagation only ever
    // DECREASES labels, so sum(label) is strictly monotone until the fixed
    // point — an unchanged sum IS convergence. One tiny aggregate per round
    // instead of a join-and-compare pass (halves the jobs per round, which
    // is what the loop's wall time is made of once components are small).
    // decimal(38,0) sum: the invariant must stay EXACT (a modular sum
    // could collide and exit with wrong labels; a long sum ANSI-overflows
    // once |nodes| × max-id passes 2^63 — billions of nodes with wide ids)
    // the count rides the same aggregate for free — it is the hint gate's
    // build-side row bound (labels has exactly one row per node)
    def labelSum(df: org.apache.spark.sql.DataFrame): (java.math.BigDecimal, Long) = {
      val r = df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)), count(lit(1))).head
      (r.getDecimal(0), r.getLong(1))
    }
    var (prevSum, nNodes) = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = bidir
        .join(hinted(labels.withColumnRenamed("id", "src"), nNodes), "src")
        .select(col("dst").as("id"), col("label"))
      val next = ckptLabels(labels.union(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label")))
      val (s, n2) = labelSum(next)
      converged = s.compareTo(prevSum) == 0 // value equality, scale-blind
      // round barrier (diskBound): bidir/labels/next are checkpoint-backed
      // and labelSum just materialized next — the round's join+agg
      // shuffles are scratch, reclaim them (same rationale as the star
      // loop's barrier)
      reapBarrier(next, diskBound, reapKeep)
      prevSum = s
      nNodes = n2
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"min-label propagation did not converge within maxIter=$maxIter rounds; " +
          "labels would be WRONG — rerun with a larger maxIter " +
          "(or use starContraction, whose round count is O(log n), not O(diameter))")
    labels
  }
}
