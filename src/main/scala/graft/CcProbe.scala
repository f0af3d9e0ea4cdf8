package graft

import org.apache.spark.sql.functions._

/** Probe main for the distributed connected-components path.
  *
  * The registry's d7/d12 queries dispatch to driver-side union-find below
  * 1M collapsed edges (the common case for near-dup graphs even at sf100),
  * so the distributed star-contraction loop's perf never shows in the
  * gate. This probe drives [[graft.exec.ConnectedComponents]] directly on
  * a synthetic graph big enough to be loop-bound, for the claimed-layout
  * A/B (`SPARK_GRAFT_CC_CLAIMED=0|1`, SCALE.md r10).
  *
  * Graph shape: `nChains` disjoint chains of length `chainLen` (worst-case
  * topology for label flooding, the shape star contraction's O(log n)
  * rounds exist for) — node ids are strided so chain neighbors hash to
  * different partitions, like real near-dup graphs.
  *
  * Usage: runMain graft.CcProbe <nChains> <chainLen> [algo] [diskbound]
  *   algo: star (default) | minlabel
  *   diskbound: "diskbound" enables the scoped shuffle-reaper round
  *   barriers (VERDICT r11 #3) — the probe then also samples peak local
  *   shuffle-scratch bytes per round so the artifact shows whether peak
  *   scratch is bounded by ONE round's volume (the claim) or grows
  *   linearly in rounds (the pre-r12 behavior that walls at ~800M edges).
  * Prints one JSON line {"metric":"cc_probe",...} and cross-checks the
  * component count (must equal nChains) and label sum against the closed
  * form — a wrong result fails loudly, a probe must never time garbage.
  */
object CcProbe {

  /** Bytes currently under the local dirs' spark scratch (blockmgr +
    * shuffle dirs) — sampled by a background thread during the run; the
    * MAX over samples is the number the 800M-edge wall is about.
    */
  private def scratchBytes(): Long = {
    val dirs = sys.props.get("java.io.tmpdir").toSeq ++ Seq("/tmp")
    dirs.distinct.flatMap { d =>
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
    }.map(du).sum
  }
  private def du(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum

  def main(args: Array[String]): Unit = {
    val nChains = args(0).toLong
    val chainLen = args(1).toLong
    val algo = if (args.length > 2) args(2) else "star"
    val diskBound = args.contains("diskbound")
    val spark = GraftSession.local("graft-cc-probe")
    val n = nChains * chainLen
    // node id of link j in chain i: j * nChains + i  (strided)
    val edges = spark.range(n - nChains) // all links except each chain's last
      .select(col("id").as("src"), (col("id") + nChains).as("dst"))
    // peak-scratch sampler: cheap du every 5s, max retained
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val sampler = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        try peak.accumulateAndGet(scratchBytes(), math.max(_, _))
        catch { case _: Throwable => () }
        try Thread.sleep(5000) catch { case _: InterruptedException => return }
      }
    }, "cc-probe-scratch-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val reapKeep =
      if (diskBound)
        org.apache.spark.GraftShuffleReaper.liveIds(spark.sparkContext)
      else Set.empty[Int]
    val t0 = System.nanoTime()
    val labels =
      if (algo == "minlabel")
        graft.exec.ConnectedComponents.minLabelPropagation(
          edges, "src", "dst", maxIter = chainLen.toInt + 2,
          knownEdges = n - nChains, diskBound = diskBound, reapKeep = reapKeep)
      else
        graft.exec.ConnectedComponents.starContraction(
          edges, "src", "dst", knownEdges = n - nChains,
          diskBound = diskBound, reapKeep = reapKeep)
    // one aggregate = the timed action; also the correctness cross-check
    val r = labels.agg(
      count(lit(1)).as("n"),
      countDistinct(col("label")).as("comps"),
      sum(col("label")).as("lsum")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val (rows, comps, lsum) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // each chain's min id is its label: chain i -> label i, summed over
    // chainLen members: sum = chainLen * (0 + 1 + ... + nChains-1)
    val expSum = chainLen * (nChains * (nChains - 1) / 2)
    require(rows == n && comps == nChains && lsum == expSum,
      s"WRONG RESULT: rows=$rows (want $n) comps=$comps (want $nChains) " +
        s"lsum=$lsum (want $expSum)")
    sampler.interrupt()
    val claimed = graft.exec.ConnectedComponents.claimed
    println(s"""{"metric":"cc_probe","algo":"$algo","claimed":$claimed,""" +
      s""""diskbound":$diskBound,"peak_scratch_bytes":${peak.get},""" +
      s""""n_chains":$nChains,"chain_len":$chainLen,"edges":${n - nChains},""" +
      s""""value":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))},"unit":"sec"}""")
    spark.stop()
  }
}
