package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning — the tokenizer-
  * training pass of a pretraining pipeline, run as the classic
  * word-vocabulary reduction: BPE statistics depend only on the corpus's
  * DISTINCT words and their counts, so the corpus collapses to a
  * (word, count) frame first (one map-side-combined shuffle over raw
  * tokens; at 100 TB the vocab is orders of magnitude smaller than the
  * corpus) and every merge iteration runs over the vocab only.
  *
  * Per iteration: adjacent-symbol pairs explode out of each word weighted
  * by word count, one aggregation ranks them, and the single best pair
  * (count desc, then lexicographic — fully deterministic) drives a narrow
  * left-to-right merge rewrite of the vocab. The driver sees ONE row per
  * iteration (the argmax), never the vocab; lineage is checkpointed per
  * round so plans stay flat across iterations.
  *
  * Left-to-right non-overlapping merge semantics match the standard BPE
  * definition: merging (a,a) in "aaa" yields [aa, a] — `BpeLearnerSpec`
  * pins this against a driver-side reference implementation.
  */
object BpeLearner {

  /** Left-to-right single-pass merge of adjacent (left, right) into the
    * fused symbol, as an `aggregate` HOF over the symbol array: append
    * each symbol unless it completes the pair with the accumulator's
    * tail, in which case the tail is replaced by the fusion. Non-
    * overlapping by construction (the fused tail no longer equals
    * `left` unless fusion == left). This HOF form is the executable
    * SPEC for the `graft_bpe_merge` kernel (parity asserted in
    * NativeTextExpressionsSpec); the learner runs the kernel — the
    * aggregate evaluated an interpreted two-branch lambda per symbol
    * per word per merge round.
    */
  private[graft] def applyMergeHof(symbols: Column, left: String, right: String): Column = {
    val fused = left + right
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === left && x === right,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
          .otherwise(concat(acc, array(x))))
  }

  private def applyMerge(symbols: Column, left: String, right: String): Column =
    call_function("graft_bpe_merge", symbols, lit(left), lit(right))

  /** HOF spec for the `graft_bpe_pairs` kernel: adjacent (l, r) symbol
    * pairs via the two-slice zip.
    */
  private[graft] def pairsHof(symbols: Column): Column =
    zip_with(slice(symbols, lit(1), size(symbols) - 1),
      slice(symbols, lit(2), size(symbols) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Word-vocab frame from a text column: (symbols: array<string>, cnt),
    * symbols = the word's characters. One shuffle, map-side combined.
    */
  def vocab(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("symbols"), col("cnt"))

  /** Learn the top `nMerges` BPE merges. Returns (rank, left, right,
    * pair_count) with rank 1-based in learn order.
    */
  def learnMerges(docs: DataFrame, text: Column, nMerges: Int): Seq[(Int, String, String, Long)] = {
    // r16 (guide §1.2/§5): checkpoints are LAZY. Each round's argmax is
    // the only action, and it is what materializes the previous round's
    // merge rewrite into the block store as a side effect — so one job
    // per merge round instead of two (the old eager form ran a dedicated
    // materialization job per rewrite, and one for the vocab build:
    // 2n+1 driver round-trips for n merges, halved to n+1 here). Every
    // words_i is still computed exactly once (the lazy checkpoint caches
    // its blocks at first use), lineage still truncates at each round,
    // and the FINAL rewrite — which the old form materialized even
    // though no consumer exists after the last argmax — is never run.
    var words = vocab(docs, text).localCheckpoint(false)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to nMerges) {
      val pairs = words
        .select(col("cnt"),
          explode(call_function("graft_bpe_pairs", col("symbols"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("n"))
      val top = pairs.orderBy(col("n").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) return merges.result()
      val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((i, l, r, n))
      words = words
        .select(applyMerge(col("symbols"), l, r).as("symbols"), col("cnt"))
        .localCheckpoint(false)
    }
    merges.result()
  }
}
