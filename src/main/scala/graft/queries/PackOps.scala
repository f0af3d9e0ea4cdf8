package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.t

/** Training-batch assembly operators: the step after filtering/dedup where
  * a pretraining pipeline turns documents into fixed-size model inputs.
  *
  * Scale notes (100 TB thinking): packing is per (source, shard) pack
  * stream — the industry shape, where each input shard packs
  * independently — so parallelism is the stream count and nothing ever
  * needs a global order. The only shuffle is the window's hash partition
  * on the stream key; per-stream state is one running sum.
  */
object PackOps {

  def qs: Seq[Q] = Seq(
    Q(
      "pk1_sequence_pack",
      (s, dir) => {
        // SEQUENCE PACKING: concat-then-chunk assignment of documents to
        // fixed token-budget training sequences. Docs concatenate in
        // deterministic (doc_id) order within a (source, shard) pack
        // stream; a doc's sequence is the budget-sized window its FIRST
        // token lands in (GPT-style chunked concatenation, where docs may
        // straddle sequence boundaries), its offset the position within
        // that window. One running sum per stream — no global sort, no
        // driver state; at 100 TB the stream key is the input shard and
        // the window's per-partition state is a single counter. The
        // native one-pass token-stats kernel supplies the length; the
        // whole plan is scan -> one hash exchange on the stream key ->
        // per-stream cumulative sum.
        val budget = 512L
        val nShards = 4
        val st = call_function("graft_tok_stats", col("text"))
        val w = Window.partitionBy(col("source"), col("shard"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
            st.getField("n_tokens").cast("long").as("n_toks"))
          .withColumn("start_tok", sum(col("n_toks")).over(w) - col("n_toks"))
          .select(col("doc_id"), col("source"), col("shard"), col("n_toks"),
            expr(s"start_tok div $budget").as("seq_idx"),
            pmod(col("start_tok"), lit(budget)).as("tok_offset"))
      },
      Some("""WITH d AS (SELECT doc_id, source, (doc_id % 4)::BIGINT AS shard,
                len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS n_toks
              FROM documents),
              c AS (SELECT *, sum(n_toks) OVER (PARTITION BY source, shard ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS start_tok
                    FROM d)
              SELECT doc_id, source, shard, n_toks,
                     (start_tok // 512)::BIGINT AS seq_idx,
                     (start_tok % 512)::BIGINT AS tok_offset
              FROM c"""),
      doc = "Packing: token-budget concat-then-chunk sequence assignment per pack stream")
  )
}
