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
      doc = "Packing: token-budget concat-then-chunk sequence assignment per pack stream"),

    Q(
      "ds1_shuffle_shards",
      (s, dir) => {
        // DETERMINISTIC TRAINING SHUFFLE: the write-side step that turns a
        // filtered corpus into S shuffled shards with a reproducible
        // within-shard order — hash-derived, so any re-run (or a resumed
        // 100 TB job) lands every document in the same shard at the same
        // position, with no RNG state to checkpoint. shard = first byte of
        // md5(doc_id) mod S (uniform, content-independent); pos = rank of
        // the md5 within the shard (collision-tiebroken by doc_id), which
        // IS the shuffled order — md5 rank is uncorrelated with corpus
        // order, the property a training shuffle exists to provide.
        // Plan: scan -> one hash exchange on shard -> per-shard sort. At
        // 100 TB, S is thousands (shards are ~GB-sized training files),
        // so the sort parallelism is the shard count and each task sorts
        // one output file's worth — the same physical shape as
        // repartition(S) + sortWithinPartitions + per-shard write.
        val nShards = 16L
        val h = md5(col("doc_id").cast("string"))
        val shard = pmod(conv(substring(h, 1, 2), 16, 10).cast("long"), lit(nShards))
        val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), h.as("h"), shard.as("shard"))
          .withColumn("pos", row_number().over(w).cast("long") - 1L)
          .select(col("doc_id"), col("source"), col("shard"), col("pos"))
      },
      Some("""WITH d AS (
                SELECT doc_id, source, md5(doc_id::VARCHAR) AS h,
                       (((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
                         + instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) % 16)::BIGINT AS shard
                FROM documents)
              SELECT doc_id, source, shard,
                     (row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)::BIGINT AS pos
              FROM d"""),
      doc = "Sharding: deterministic hash shuffle into S shards with reproducible order"),

    Q(
      "ck1_chunk_overlap",
      (s, dir) => {
        // OVERLAPPING-WINDOW CHUNKING: the RAG / context-window step that
        // splits each document's token stream into fixed-size windows
        // (W=64 tokens) advancing by a stride (T=48, i.e. 16-token
        // overlap so no boundary-spanning content is lost to a cut).
        // Chunk count is 1 for docs under W tokens, else
        // ceil((n-W)/T)+1 — the last window is allowed to be short.
        // Pure narrow pipeline: scan -> tokenize -> explode an index
        // sequence -> slice. No shuffle anywhere; the explode fan-out is
        // ~n/T per doc, and at 100 TB the stage parallelism is the input
        // split count. Token slicing composes array HOFs (codegen'd) —
        // the text is tokenized ONCE per doc, not once per chunk.
        val W = 64
        val T = 48
        val toks = filter(split(col("text"), "\\s+"), x => x =!= lit(""))
        val d = t(s, dir, "documents")
          .select(col("doc_id"), toks.as("toks"))
          .withColumn("n", size(col("toks")).cast("long"))
          .withColumn("nchunks",
            when(col("n") <= W, 1L)
              .otherwise(ceil((col("n") - W).cast("double") / T).cast("long") + 1L))
        d.select(col("doc_id"), col("toks"), col("n"),
            explode(sequence(lit(0L), col("nchunks") - 1L)).as("chunk_idx"))
          .select(
            col("doc_id"), col("chunk_idx"),
            array_join(slice(col("toks"), (col("chunk_idx") * T + 1).cast("int"), lit(W)), " ")
              .as("chunk_text"),
            least(lit(W.toLong), col("n") - col("chunk_idx") * T).as("chunk_toks"))
      },
      Some("""WITH d AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
                FROM documents),
              c AS (
                SELECT doc_id, toks, len(toks)::BIGINT AS n,
                       CASE WHEN len(toks) <= 64 THEN 1::BIGINT
                            ELSE ceil((len(toks) - 64) / 48.0)::BIGINT + 1 END AS nchunks
                FROM d),
              e AS (
                SELECT doc_id, toks, n,
                       unnest(generate_series(0, nchunks - 1))::BIGINT AS chunk_idx
                FROM c)
              SELECT doc_id, chunk_idx,
                     array_to_string(toks[(chunk_idx * 48 + 1)::INT : (chunk_idx * 48 + 64)::INT], ' ') AS chunk_text,
                     least(64, n - chunk_idx * 48)::BIGINT AS chunk_toks
              FROM e"""),
      doc = "Chunking: overlapping W=64/stride-48 token windows per document, shuffle-free"),

    Q(
      "ds2_train_eval_split",
      (s, dir) => {
        // DETERMINISTIC TRAIN/VAL/TEST SPLIT: hash-bucket each document
        // into 96/2/2 by the first 16 bits of md5(doc_id) mod 100 — the
        // split survives re-runs, corpus reorderings, and incremental
        // appends (a new document's split is a pure function of its id,
        // so yesterday's eval docs never migrate into today's train
        // set, the leak an index-based split creates). Per-(source,
        // split) summary keeps the result audit-sized; the whole plan
        // is scan -> project -> one map-side-combined aggregation.
        val h = md5(col("doc_id").cast("string"))
        val b = pmod(conv(substring(h, 1, 4), 16, 10).cast("long"), lit(100L))
        t(s, dir, "documents")
          .select(col("source"), col("n_chars"),
            when(b < 96, "train").when(b < 98, "val").otherwise("test").as("split"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tot_chars"))
      },
      Some("""WITH d AS (
                SELECT source, n_chars,
                       (((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 4096
                         + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) * 256
                         + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 3, 1)) - 1) * 16
                         + instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 4, 1)) - 1) % 100) AS b
                FROM documents)
              SELECT source,
                     CASE WHEN b < 96 THEN 'train' WHEN b < 98 THEN 'val' ELSE 'test' END AS split,
                     count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS tot_chars
              FROM d GROUP BY 1, 2"""),
      doc = "Split: leak-free deterministic 96/2/2 train/val/test assignment by id hash")
  )
}
