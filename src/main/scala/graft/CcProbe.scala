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
  * Usage: runMain graft.CcProbe <nChains> <chainLen> [algo]
  *   algo: star (default) | minlabel
  * Prints one JSON line {"metric":"cc_probe",...} and cross-checks the
  * component count (must equal nChains) and label sum against the closed
  * form — a wrong result fails loudly, a probe must never time garbage.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nChains = args(0).toLong
    val chainLen = args(1).toLong
    val algo = if (args.length > 2) args(2) else "star"
    val spark = GraftSession.local("graft-cc-probe")
    val n = nChains * chainLen
    // node id of link j in chain i: j * nChains + i  (strided)
    val edges = spark.range(n - nChains) // all links except each chain's last
      .select(col("id").as("src"), (col("id") + nChains).as("dst"))
    val t0 = System.nanoTime()
    val labels =
      if (algo == "minlabel")
        graft.exec.ConnectedComponents.minLabelPropagation(
          edges, "src", "dst", maxIter = chainLen.toInt + 2,
          knownEdges = n - nChains)
      else
        graft.exec.ConnectedComponents.starContraction(
          edges, "src", "dst", knownEdges = n - nChains)
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
    val claimed = graft.exec.ConnectedComponents.claimed
    println(s"""{"metric":"cc_probe","algo":"$algo","claimed":$claimed,""" +
      s""""n_chains":$nChains,"chain_len":$chainLen,"edges":${n - nChains},""" +
      s""""value":${"%.3f".format(sec)},"unit":"sec"}""")
    spark.stop()
  }
}
