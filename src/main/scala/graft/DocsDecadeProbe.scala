package graft

import org.apache.spark.sql.functions._

/** sf1000-family decade probe for the shingle dedup family (VERDICT r11
  * #7 stretch): runs the REGISTERED d2 plan end-to-end at ~10× sf100's
  * document rows, pinning the first non-CC operator one decade past the
  * gate's largest measured scale.
  *
  * Corpus shape — built from scale/sf100 documents, NOT plain ScaleUp
  * replication: key-shifted clones multiply the per-text duplication
  * factor (sf100 already carries ~1000 identical copies per base text),
  * and d2's OUTPUT is the full near-dup pair list — quadratic in
  * duplication, so a 10× clone pass would spend its time enumerating
  * C(10^4,2)-sized cliques (~10^11 output rows), measuring pair
  * enumeration, not the engine. A real corpus 10× bigger has ~10× the
  * docs, not 10× the copies of each doc. So copy 0 is sf100 verbatim
  * (keeping its full duplicate structure) and copies 1..9 perturb every
  * 2nd token with the copy-shifted doc_id: every 3-token shingle window
  * in a perturbed copy contains a doc-unique token, so perturbed texts
  * are globally distinct (Jaccard ≈ 0 against everything) and exercise
  * the 45M-distinct-signature side of the collapse + banding while
  * copy 0 exercises the dup-collapse side at its sf100 density.
  *
  * Correctness invariant: the perturbed copies contribute ZERO verified
  * pairs, so the 10× run must return EXACTLY the sf100 run's pair count
  * — both runs execute in this probe and the mismatch is a loud failure
  * (a probe must never time garbage).
  *
  * Usage: runMain graft.DocsDecadeProbe <sf100Dir> <workDir> [factor]
  * Prints one JSON line {"metric":"docs_decade_probe",...} with both
  * legs' wall times and the Bench-style noop sentinels.
  */
object DocsDecadeProbe {
  def main(args: Array[String]): Unit = {
    val sf100Dir = args(0)
    val workDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-docs-decade-probe")

    def noopProbe(): Double = {
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        spark.range(1000000).selectExpr("sum(id) s").collect()
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }
    val noopSec = noopProbe()

    // ---- replica build (directory parquet: only this probe reads it, so
    // no single-file constraint — parallel write, parallel scan) --------
    val dest = new java.io.File(s"$workDir/documents.parquet")
    var buildSec = -1.0
    if (!dest.exists()) {
      val t0 = System.nanoTime()
      val base = spark.read.parquet(s"$sf100Dir/documents.parquet")
      val stride = base.agg(max(col("doc_id"))).head.getLong(0) + 1L
      val copies = (0 until factor).map { i =>
        val shifted = base.withColumn("doc_id", col("doc_id") + lit(i * stride))
        if (i == 0) shifted
        else shifted.withColumn("text",
          // doc-unique token in every 3-gram window => globally distinct
          // shingle sets, Jaccard ≈ 0 across and within copies
          array_join(
            transform(split(col("text"), " "),
              (x, j) => when(j % 2 === 0,
                concat(x, lit("_"), col("doc_id").cast("string"))).otherwise(x)),
            " "))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(dest.getPath)
      buildSec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[docs-decade] replica built in $buildSec%.1f s")
    }

    // ---- leg 1: sf100 baseline (also the invariant's expected count) --
    val d2 = SparkEntry.queries("d2_minhash_lsh")
    val t1 = System.nanoTime()
    val sf100Pairs = d2(spark, sf100Dir).count()
    val sf100Sec = (System.nanoTime() - t1) / 1e9

    // ---- leg 2: the decade run ----------------------------------------
    val t2 = System.nanoTime()
    val decadePairs = d2(spark, workDir).count()
    val decadeSec = (System.nanoTime() - t2) / 1e9
    require(decadePairs == sf100Pairs,
      s"WRONG RESULT: decade run found $decadePairs verified pairs, " +
        s"sf100 run found $sf100Pairs — the perturbed copies must " +
        "contribute zero pairs")

    val noopEndSec = noopProbe()
    val nDocs = spark.read.parquet(dest.getPath).count()
    // Locale.ROOT: comma-decimal default locales would break the JSON
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"docs_decade_probe","query":"d2_minhash_lsh",""" +
      s""""factor":$factor,"docs":$nDocs,"pairs":$decadePairs,""" +
      s""""build_sec":${f3(buildSec)},"sf100_sec":${f3(sf100Sec)},""" +
      s""""value":${f3(decadeSec)},"unit":"sec",""" +
      s""""noop_sec":${f3(noopSec)},"noop_end_sec":${f3(noopEndSec)}}""")
    spark.stop()
  }
}
