package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import Tables.t

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: token statistics, quality scoring, language ID,
  * document fingerprinting, corpus n-gram stats.
  *
  * All narrow per-row column expressions (plus one aggregation for the
  * corpus stats) — at 100 TB each is a single pass with no shuffle except
  * the final group-by, which partial-aggregates map-side.
  */
object TextOps {

  /** BPE-ish pretokenizer: letter runs | digit runs | single symbols.
    * RE2-safe (no lookarounds) so the DuckDB oracle matches exactly.
    */
  private val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Marker-argmax language id over a text column (t3's core expression,
    * reused by the corpus-filter composition tp1) — the native one-pass
    * kernel; `TextFunctions.detectedLangHof` is the column-form spec and
    * the oracle recomputes the same argmax (`DetectedLangSql`).
    */
  private[queries] def detectedLang(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("graft_lang_id", text)

  /** The t3 oracle's ranked-struct list literal (shared with tp1's oracle). */
  private[queries] val DetectedLangSql: String =
    """list_max([
       {'hits': len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))), 'prio': 5, 'code': 'en'},
       {'hits': len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))), 'prio': 4, 'code': 'es'},
       {'hits': len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))), 'prio': 3, 'code': 'de'},
       {'hits': len(list_filter(toks, x -> list_contains(['le','la','les','et','est'], x))), 'prio': 2, 'code': 'fr'},
       {'hits': len(list_filter(toks, x -> list_contains(['de','shi','le','bu','wo'], x))), 'prio': 1, 'code': 'zh'}
      ])['code']"""

  def qs: Seq[Q] = Seq(
    Q(
      "t1_token_stats",
      (s, dir) => {
        val toks = tokens(col("text"))
        t(s, dir, "documents").select(
          col("doc_id"),
          length(col("text")).as("n_chars2"),
          size(toks).as("n_tokens"),
          size(regexp_extract_all(col("text"), lit(BpeTokenRe), lit(0))).as("n_bpe_tokens"),
          size(array_distinct(toks)).as("n_distinct_tokens"))
      },
      Some("""SELECT doc_id, length(text) AS n_chars2,
              len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
              len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS n_distinct_tokens
              FROM documents"""),
      doc = "Text: whitespace + BPE-ish token counting, vocabulary size"),

    Q(
      "t2_quality_score",
      (s, dir) => {
        // quality signals: mean word length, stopword ratio, repetition
        // (1 - distinct/total), alpha ratio; integer-scaled score so the
        // hash compare is exact (single int division per component)
        // r15: stopword count and alpha count ride the vocab-hits /
        // alpha-count kernels (see t12); n_tokens / n_distinct reuse the
        // tok-stats kernel. Only n_token_chars still needs the token
        // array (sum of token lengths) — one aggregate HOF instead of
        // the old five interpreted walks over a rebuilt array.
        val toks = tokens(col("text"))
        val stop = Seq("the", "a", "of", "and", "in", "to", "is")
        val st = call_function("graft_tok_stats", col("text"))
        val nTok = st.getField("n_tokens").cast("int")
        val nStop = call_function("graft_vocab_hits", col("text"), typedlit(stop))
          .cast("int")
        val nChars = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
        val nAlpha = call_function("graft_alpha_count", col("text")).cast("int")
        t(s, dir, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"),
          nStop.as("n_stopwords"),
          nChars.as("n_token_chars"),
          permille(nStop, nTok).as("stopword_permille"),
          permille(st.getField("n_distinct_tokens"), nTok).as("distinct_permille"),
          permille(nAlpha, length(col("text"))).as("alpha_permille"))
      },
      Some("""WITH q AS (SELECT doc_id, text,
                list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
                FROM documents)
              SELECT doc_id,
              len(toks) AS n_tokens,
              len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to','is'], x))) AS n_stopwords,
              -- ::BIGINT: DuckDB list_sum yields HUGEINT, which the driver's
              -- pandas bridge turns into float64 and the hash compare then
              -- sees 123.0 vs Spark's int64 123
              list_sum(list_transform(toks, x -> length(x)))::BIGINT AS n_token_chars,
              len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to','is'], x))) * 1000 // len(toks) AS stopword_permille,
              len(list_distinct(toks)) * 1000 // len(toks) AS distinct_permille,
              length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000 // length(text) AS alpha_permille
              FROM q"""),
      doc = "Text: document quality signals (integer-scaled, hash-exact)"),

    Q(
      "t3_langid",
      (s, dir) => {
        // marker-lexicon language ID: per-language hit count over tokens,
        // argmax with (count desc, code asc) tie-break via array_max over
        // (count, negated-code) structs — pure column expressions
        val toks = tokens(lower(col("text")))
        val scored = LangMarkers.map { case (code, markers) =>
          struct(
            size(filter(toks, x => x.isin(markers.map(lit(_)): _*))).as("hits"),
            lit(code).as("code"))
        }
        // max of (hits asc, code desc-by-reverse) — Spark struct ordering is
        // lexicographic; to break ties toward the SMALLEST code we compare
        // on (hits, reversed_rank) where rank is the position in a fixed
        // code list (later codes lose)
        val ranked = LangMarkers.zipWithIndex.map { case ((code, markers), i) =>
          struct(
            size(filter(toks, x => x.isin(markers.map(lit(_)): _*))).as("hits"),
            lit(LangMarkers.length - i).as("prio"),
            lit(code).as("code"))
        }
        t(s, dir, "documents").select(
          col("doc_id"),
          col("lang").as("labeled_lang"),
          array_max(array(ranked: _*)).getField("code").as("detected_lang"),
          array_max(array(scored: _*)).getField("hits").as("marker_hits"))
      },
      Some("""WITH q AS (SELECT doc_id, lang,
                list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
              s AS (SELECT doc_id, lang,
                [
                 {'hits': len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))), 'prio': 5, 'code': 'en'},
                 {'hits': len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))), 'prio': 4, 'code': 'es'},
                 {'hits': len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))), 'prio': 3, 'code': 'de'},
                 {'hits': len(list_filter(toks, x -> list_contains(['le','la','les','et','est'], x))), 'prio': 2, 'code': 'fr'},
                 {'hits': len(list_filter(toks, x -> list_contains(['de','shi','le','bu','wo'], x))), 'prio': 1, 'code': 'zh'}
                ] AS ranked FROM q)
              SELECT doc_id, lang AS labeled_lang,
              list_max(ranked)['code'] AS detected_lang,
              list_max(list_transform(ranked, r -> r['hits'])) AS marker_hits
              FROM s"""),
      doc = "Text: n-gram/stopword-marker language identification (argmax)"),

    Q(
      "t4_fingerprint",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          call_function("graft_content_fingerprint", col("text")).as("content_md5"),
          rollingHash(tokens(col("text"))).as("rolling_hash")),
      Some("""SELECT doc_id,
              md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), ' ')) AS content_md5,
              list_reduce(
                list_prepend(0::BIGINT,
                  list_transform(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
                    t -> ('0x' || substr(md5(t),1,15))::BIGINT % 1000000007)),
                (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash
              FROM documents"""),
      doc = "Text: order-insensitive md5 + order-sensitive rolling-hash fingerprints"),

    Q(
      "t6_pii_scrub",
      (s, dir) => {
        // PII redaction: deterministic synthetic email/phone are spliced
        // into each doc (the corpus itself is clean words), then scrubbed
        // with RE2-safe patterns (no lookarounds — Java and DuckDB agree).
        // The scrubbed-text md5 makes the compare sensitive to every byte
        // of the redaction, not just the counts.
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+?[0-9]{1,2}-555-[0-9]{4}"
        val withPii = t(s, dir, "documents").withColumn("full_text",
          concat(
            lit("Contact user"), col("doc_id"), lit("@mail.example.com or +1-555-"),
            lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
            lit(" . "), col("text")))
        withPii.select(
          col("doc_id"),
          size(regexp_extract_all(col("full_text"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("full_text"), lit(phoneRe), lit(0))).as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("full_text"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("scrub_md5"))
      },
      Some("""WITH p AS (SELECT doc_id,
                'Contact user' || doc_id || '@mail.example.com or +1-555-' ||
                lpad((doc_id * 7 % 10000)::VARCHAR, 4, '0') || ' . ' || text AS full_text
              FROM documents)
              SELECT doc_id,
              len(regexp_extract_all(full_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
              len(regexp_extract_all(full_text, '\+?[0-9]{1,2}-555-[0-9]{4}')) AS n_phones,
              md5(regexp_replace(
                regexp_replace(full_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\+?[0-9]{1,2}-555-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
              FROM p"""),
      doc = "Text: PII (email/phone) detection + redaction with byte-exact scrub"),

    Q(
      "t7_freq_rank_quality",
      (s, dir) => {
        // corpus-frequency-rank quality signal (the integer-exact stand-in
        // for LM-perplexity filters): every token gets its dense rank in
        // the corpus frequency table (rank 1 = most common), and a doc's
        // score is its mean token rank in permille. Rare-token-heavy docs
        // score high. SCALE SHAPE: at 100 TB of web text the distinct-token
        // table is itself billions of rows (typos, URLs, numbers), so the
        // rank must NOT come from an unpartitioned Window (single-partition
        // sort) and the vocab must NOT be broadcast. orderBy is a
        // RANGE-partitioned distributed sort — ties on n split across
        // partitions by tok, so no bucket skew. (n desc, tok) is a total
        // order because tok is the group key, so global position + 1 ==
        // dense_rank exactly. The global position is assembled two-phase,
        // entirely in DataFrame land (an earlier form dropped to
        // rdd.zipWithIndex — right shape, but it exited codegen and
        // re-encoded the whole vocab through Row objects):
        // monotonically_increasing_id() after the sort encodes
        // (partition << 33 | local row), so local position and partition
        // come from each row's own id; per-partition COUNTS (one row per
        // partition — cluster-bounded, never vocab-bounded) cumsum into
        // partition offsets and broadcast-join back. Both consumers read
        // the same range exchange (one vocab shuffle, reused); the rank
        // join back onto the token stream is a plain shuffle join on tok;
        // AQE is free to downgrade it to broadcast at small scale, but
        // nothing forces that at large scale.
        import org.apache.spark.sql.expressions.Window
        // Tokenization is counted IN-ROW: graft_token_counts (a codegen'd
        // kernel; TextFunctions.tokenCounts is its executable HOF spec)
        // emits each doc's distinct (tok, m) pairs in a single JIT'd
        // split+hash pass, so the per-(doc, tok) aggregate that would
        // hash every token INSTANCE never exists (at sf10 that aggregate
        // alone cost more than the rest of the query).
        //
        // The pairs are NOT pre-shuffled onto tok (the r6 form
        // repartition(tok)'d them once and hung both consumers off that
        // exchange — which priced the PESSIMISTIC case into every run:
        // two full pair-volume shuffles, ~500M rows each at sf100, even
        // though the vocabulary is orders of magnitude smaller than the
        // pair stream). Instead each consumer takes its cheapest shape
        // and AQE arbitrates the join:
        //  - the vocab count partial-aggregates map-side, so its shuffle
        //    carries at most (distinct toks per partition) rows — vocab-
        //    bounded, never pair-bounded;
        //  - the rank join back onto the pair stream is UNHINTED: when
        //    the ranked vocab materializes small (any corpus whose vocab
        //    fits the broadcast threshold) AQE broadcasts it and the
        //    pairs NEVER shuffle; at true web scale (billions of distinct
        //    tokens) it degrades to the sort-merge join the r6 form
        //    always paid — the worst case is unchanged, the common case
        //    drops both pair shuffles;
        //  - with the pairs left in their scan partitions, every doc's
        //    pairs are co-located, so the final per-doc aggregate
        //    partial-aggregates to ONE row per doc map-side — the doc
        //    shuffle carries ~D rows, not ~D×vocab_per_doc.
        // The price is a second scan+tokenize pass — and each pass
        // REPARTITIONS THE RAW TEXT before exploding: the explode's
        // kernel runs in its input stage, and a compactly-written corpus
        // (one parquet file per table here) gives that stage only
        // size/maxPartitionBytes input splits, serializing the tokenize
        // on a handful of cores. Shuffling text bytes is linear in
        // corpus size (the pair stream it replaces is an order of
        // magnitude wider), and on a real many-file corpus the exchange
        // is simply how the pair production gets its parallelism pinned
        // to the cluster instead of to the writer's file layout.
        def docTok = t(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .repartition(col("doc_id"))
          .select(col("doc_id"),
            explode(call_function("graft_token_counts", col("text"))).as("p"))
          .select(col("doc_id"), col("p.tok").as("tok"), col("p.m").as("m"))
        // The ranked-vocab frame is consumed TWICE (offsets + the rank
        // join); checkpointing it makes the vocab sort and its tokenize
        // pass run ONCE (without it each consumer re-derives the whole
        // subtree — the sort's exchange is no longer shared, so
        // ReuseExchange can't collapse them) and pins the
        // monotonically_increasing_id assignment to a single evaluation.
        // The frame is vocab-sized (tok, pid, local) — bounded by the
        // distinct-token table, never the pair stream.
        val sorted = docTok.groupBy(col("tok")).agg(sum(col("m")).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .select(col("tok"), monotonically_increasing_id().as("mid"))
          .select(col("tok"),
            shiftright(col("mid"), 33).as("pid"),
            col("mid").bitwiseAND(lit((1L << 33) - 1)).as("local"))
          .localCheckpoint(false)
        // Per-partition row counts → rank offsets. The frame is ONE row
        // per mid-assignment partition (≤ the stage's partition count,
        // tens of rows at any corpus size — the bound is cluster width,
        // not data volume), so the cumsum happens on the driver: the
        // alternative, an unpartitioned window, moves the same rows to
        // one partition anyway but logs a WindowExec warning on every
        // run (and a constant partitionBy key gets folded away by the
        // optimizer, re-emptying the spec). The collected map rides back
        // into the plan as a literal, turning the rank computation into
        // a pure projection — no offsets join, no broadcast, no window.
        val offMap: Map[Long, Long] = {
          val counts = sorted.groupBy(col("pid"))
            .agg(count(lit(1)).as("pn")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          var acc = 0L
          counts.map { case (pid, pn) => val o = acc; acc += pn; pid -> o }.toMap
        }
        val ranked = sorted.select(col("tok"),
          (element_at(typedlit(offMap), col("pid")) + col("local") + 1L).as("rank"))
        docTok.join(ranked, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("m")).as("n_tokens"),
            permille(sum(col("rank") * col("m")), sum(col("m"))).as("mean_rank_permille"))
      },
      Some("""WITH tok AS (
                SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
                FROM documents),
              vocab AS (
                SELECT tok, dense_rank() OVER (ORDER BY count(*) DESC, tok) AS rank
                FROM tok GROUP BY tok)
              SELECT doc_id, count(*) AS n_tokens,
                (sum(rank) * 1000 // count(*))::BIGINT AS mean_rank_permille
              FROM tok JOIN vocab USING (tok)
              GROUP BY doc_id"""),
      doc = "Text: corpus-frequency-rank quality score (integer-exact LM-filter analogue)"),

    Q(
      "tp1_corpus_filter",
      (s, dir) => {
        // PIPELINE COMPOSITION: the filters a pretraining corpus pass runs
        // in sequence — language-id agreement with the label, a minimum
        // token count, exact-dup removal (keep the min doc_id per content
        // fingerprint) — then per-source survivorship accounting. The
        // keeper row per fingerprint is min(struct(doc_id, payload...)):
        // doc_id is unique, so the struct minimum IS the min-doc_id row,
        // and both shuffles map-side combine over narrow columns — no
        // text leaves the scan, no semi-join back, and nothing pins to
        // executor-local storage (an earlier localCheckpoint here was a
        // lost-executor recompute hazard at cluster scale).
        t(s, dir, "documents")
          .withColumn("n_toks", size(tokens(col("text"))))
          .withColumn("det", detectedLang(col("text")))
          .filter(col("det") === col("lang") && col("n_toks") >= 25)
          .select(
            call_function("graft_content_fingerprint", col("text")).as("fp"),
            col("doc_id"), col("source"), col("n_toks"))
          .groupBy(col("fp"))
          .agg(min(struct(col("doc_id"), col("source"), col("n_toks"))).as("k"))
          .groupBy(col("k.source").as("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("k.n_toks").cast("long")).as("sum_tokens"))
      },
      Some(s"""WITH q AS (
                SELECT doc_id, source, lang, text,
                  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks,
                  len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_toks
                FROM documents),
              f AS (SELECT * FROM q
                    WHERE $DetectedLangSql = lang AND n_toks >= 25),
              k AS (SELECT min(doc_id) AS doc_id
                    FROM f GROUP BY md5(array_to_string(toks, ' '))),
              kept AS (SELECT f.* FROM f JOIN k USING (doc_id))
              SELECT source, count(*) AS n_docs, sum(n_toks)::BIGINT AS sum_tokens
              FROM kept GROUP BY source"""),
      doc = "Composition: langid + token floor + exact dedup → survivorship"),

    Q(
      "tp2_stratified_sample",
      (s, dir) => {
        // STRATIFIED DETERMINISTIC SAMPLING: per-source keep rates gated
        // on a content-stable hash (h60(doc_id) % 1000 < rate) — the
        // reproducible downsampling a corpus mix is built from. No
        // rand(): the same doc survives on every run, every partitioning,
        // every retry, and the sample composes with later passes. One
        // narrow pass + one map-side-combined rollup; the rate table is a
        // plan-time literal (in production, a broadcast config dim).
        val rates = typedlit(Seq(1000L, 500L, 250L, 125L))
        val d = t(s, dir, "documents")
          .withColumn("rate_permille",
            element_at(rates, substring(col("source"), 4, 10).cast("int") % 4 + 1))
          .withColumn("h", graft.functions.HashFunctions.h60(col("doc_id").cast("string")) % 1000)
          .withColumn("n_toks", size(tokens(col("text"))).cast("long"))
        d.groupBy(col("source"))
          .agg(
            max(col("rate_permille")).as("rate_permille"),
            count(lit(1)).as("n_total"),
            sum(when(col("h") < col("rate_permille"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("h") < col("rate_permille"), col("n_toks"))
              .otherwise(0L)).as("kept_tokens"))
      },
      Some("""WITH d AS (SELECT source,
                ([1000,500,250,125])[(substr(source, 4)::INT % 4) + 1] AS rate_permille,
                ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 1000 AS h,
                len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_toks
              FROM documents)
              SELECT source, max(rate_permille)::BIGINT AS rate_permille,
                count(*) AS n_total,
                sum(CASE WHEN h < rate_permille THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                sum(CASE WHEN h < rate_permille THEN n_toks ELSE 0 END)::BIGINT AS kept_tokens
              FROM d GROUP BY source"""),
      doc = "Sampling: stratified deterministic hash-gated corpus downsampling"),

    Q(
      "tp3_mixture_budget",
      (s, dir) => {
        // MIXTURE-BUDGET CALIBRATION: given a per-source TOKEN budget (the
        // mixture weights of a pretraining data recipe), find the quality
        // threshold that fills it — keep each source's highest-scoring
        // docs, whole score-bands at a time, while the running token sum
        // stays within budget; report the cutoff score and the achieved
        // (docs, tokens) vs the source's totals. Band granularity (the
        // score is an integer permille) is what makes this exact AND
        // scale-free: the only corpus-size-dependent op is one map-side-
        // combined aggregate to (source, score) — everything downstream
        // (cumulative window, budget gate) runs on a frame bounded by
        // sources x 1001 REGARDLESS of corpus size, so the 100 TB plan is
        // one histogram shuffle plus arithmetic on a few thousand rows.
        // No doc-level rank, no per-source sort of documents, no join:
        // totals ride a whole-partition window over the same tiny frame
        // and the budget gate folds into the final aggregate.
        import org.apache.spark.sql.expressions.Window
        val st = call_function("graft_tok_stats", col("text"))
        val hist = t(s, dir, "documents")
          .select(col("source"),
            permille(st.getField("n_distinct_tokens"), st.getField("n_tokens"))
              .as("score"),
            st.getField("n_tokens").as("n_toks"))
          .groupBy(col("source"), col("score"))
          .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("tok"))
        val run = Window.partitionBy(col("source")).orderBy(col("score").desc)
        val all = Window.partitionBy(col("source"))
        val cum = hist.select(col("source"), col("score"),
          sum(col("n")).over(run).as("cum_n"),
          sum(col("tok")).over(run).as("cum_tok"),
          sum(col("n")).over(all).as("total_docs"),
          sum(col("tok")).over(all).as("total_tokens"),
          element_at(typedlit(Seq(800L, 400L, 200L, 100L)),
            substring(col("source"), 4, 10).cast("int") % 4 + 1)
            .as("budget_tokens"))
        val fits = col("cum_tok") <= col("budget_tokens")
        cum.groupBy(col("source"), col("budget_tokens"),
            col("total_docs"), col("total_tokens"))
          .agg(
            min(when(fits, col("score"))).as("threshold_score"),
            coalesce(max(when(fits, col("cum_n"))), lit(0L)).as("kept_docs"),
            coalesce(max(when(fits, col("cum_tok"))), lit(0L)).as("kept_tokens"))
          .select(col("source"), col("budget_tokens"), col("threshold_score"),
            col("kept_docs"), col("kept_tokens"),
            col("total_docs"), col("total_tokens"))
      },
      Some("""WITH scored AS (SELECT source,
                (len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) * 1000
                 // len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')))::BIGINT AS score,
                len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS n_toks
              FROM documents),
              hist AS (SELECT source, score, count(*)::BIGINT AS n, sum(n_toks)::BIGINT AS tok
                       FROM scored GROUP BY source, score),
              cum AS (SELECT source, score,
                sum(n)   OVER (PARTITION BY source ORDER BY score DESC) AS cum_n,
                sum(tok) OVER (PARTITION BY source ORDER BY score DESC) AS cum_tok,
                sum(n)   OVER (PARTITION BY source) AS total_docs,
                sum(tok) OVER (PARTITION BY source) AS total_tokens,
                ([800,400,200,100])[(substr(source, 4)::INT % 4) + 1]::BIGINT AS budget_tokens
              FROM hist)
              SELECT source, budget_tokens,
                min(CASE WHEN cum_tok <= budget_tokens THEN score END)::BIGINT AS threshold_score,
                coalesce(max(CASE WHEN cum_tok <= budget_tokens THEN cum_n END), 0)::BIGINT AS kept_docs,
                coalesce(max(CASE WHEN cum_tok <= budget_tokens THEN cum_tok END), 0)::BIGINT AS kept_tokens,
                total_docs::BIGINT AS total_docs, total_tokens::BIGINT AS total_tokens
              FROM cum
              GROUP BY source, budget_tokens, total_docs, total_tokens"""),
      doc = "Mixture: per-source token-budget quality-threshold calibration"),

    Q(
      "tp4_weighted_sample",
      (s, dir) => {
        // WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis): a
        // per-source k-sample where each doc's inclusion probability is
        // proportional to its length — the standard way to draw a
        // token-budget-shaped subsample in one distributed pass. Each doc
        // gets key = ln(u)/w (u a DETERMINISTIC uniform from the shared
        // md5-prefix hash, w = n_chars); the k largest keys per source ARE
        // an exact ES sample — no rand(), so retries, speculative tasks
        // and re-runs draw the identical sample, and the oracle can replay
        // the draw. u is built from exact integer arithmetic in (0,1]
        // (mod 2^53-1, then /2^53) so both engines compute bit-identical
        // doubles before the one ln(). Same two-phase rank as t8: a window
        // on (source, shard) keeps each shard's top-k — a superset of the
        // per-source top-k — then the <=32*k survivors re-rank per source;
        // no source-count-bound partitioning at any corpus size.
        import org.apache.spark.sql.expressions.Window
        val u = (graft.functions.HashFunctions.h60(col("doc_id").cast("string"))
          % lit(9007199254740991L) + lit(1L)).cast("double") / lit(9.007199254740992e15)
        val keyed = t(s, dir, "documents").select(
          col("doc_id"), col("source"), col("n_chars"),
          (log(u) / col("n_chars")).as("es_key"))
        val ord = Seq(col("es_key").desc, col("doc_id"))
        val w1 = Window.partitionBy(col("source"), pmod(hash(col("doc_id")), lit(32)))
          .orderBy(ord: _*)
        val w = Window.partitionBy(col("source")).orderBy(ord: _*)
        keyed.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= 5)
          .drop("__r1")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("source"), col("doc_id"), col("n_chars"), col("rank"))
      },
      Some("""WITH d AS (SELECT source, doc_id, n_chars,
                ((('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 9007199254740991 + 1)
                  / 9007199254740992.0) AS u
              FROM documents),
              k AS (SELECT source, doc_id, n_chars,
                row_number() OVER (PARTITION BY source
                  ORDER BY ln(u)/n_chars DESC, doc_id) AS rank
              FROM d)
              SELECT source, doc_id, n_chars, rank FROM k WHERE rank <= 5"""),
      doc = "Sampling: Efraimidis–Spirakis weighted k-sample per source, deterministic"),

    Q(
      "bpe1_merge_table",
      (s, dir) => {
        // DISTRIBUTED BPE VOCABULARY LEARNING (functions/BpeLearner): the
        // tokenizer-training pass, run over the corpus's (word, count)
        // vocab — one token shuffle total, then each merge iteration
        // touches only the vocab and ships ONE argmax row to the driver.
        // Oracle: the 6 merge rounds unroll into chained CTEs (the sim5
        // unrolled-Lloyd pattern) — each round is pair-count aggregate →
        // argmax (count desc, lex tie-break) → left-to-right
        // non-overlapping rewrite, expressed over a long-format
        // (word, pos, symbol) frame with gaps-and-islands windows: a
        // position merges iff it matches the pair AND sits at an even
        // offset within its maximal run of consecutive matches (the
        // window-function equivalent of the engine's aggregate-HOF scan).
        // BpeLearnerSpec additionally pins the semantics against a
        // driver-side reference loop.
        import s.implicits._
        graft.functions.BpeLearner
          .learnMerges(t(s, dir, "documents"), col("text"), 6)
          .toDF("rank", "left_sym", "right_sym", "pair_count")
          .select(col("rank").cast("long").as("rank"), col("left_sym"),
            col("right_sym"), col("pair_count"))
      },
      Some("""WITH w0 AS (
                SELECT w, count(*)::BIGINT AS cnt FROM (
                  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
                  FROM documents) GROUP BY w),
              s0 AS (
                SELECT w, cnt, generate_subscripts(cs, 1) AS i, unnest(cs) AS sym
                FROM (SELECT w, cnt, regexp_split_to_array(w, '') AS cs FROM w0)),
              p1 AS (SELECT sym AS l, lead(sym) OVER (PARTITION BY w ORDER BY i) AS r, cnt FROM s0),
              t1 AS (SELECT l, r, sum(cnt)::BIGINT AS n FROM p1 WHERE r IS NOT NULL
                      GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
              x1 AS (SELECT s.w, s.cnt, s.i, s.sym,
                             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) AS nxt,
                             coalesce(s.sym = t.l AND
                               lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) = t.r, FALSE) AS matched
                      FROM s0 s CROSS JOIN t1 t),
              y1 AS (SELECT *, CASE WHEN matched
                               THEN i - row_number() OVER (PARTITION BY w, matched ORDER BY i) END AS island
                      FROM x1),
              m1 AS (SELECT w, cnt, i, sym, nxt,
                             matched AND (i - min(i) OVER (PARTITION BY w, island)) % 2 = 0 AS do_merge
                      FROM y1),
              s1 AS (SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i,
                             CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
                      FROM (SELECT m.*, lag(do_merge, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS consumed
                            FROM m1 m) WHERE NOT consumed),
              p2 AS (SELECT sym AS l, lead(sym) OVER (PARTITION BY w ORDER BY i) AS r, cnt FROM s1),
              t2 AS (SELECT l, r, sum(cnt)::BIGINT AS n FROM p2 WHERE r IS NOT NULL
                      GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
              x2 AS (SELECT s.w, s.cnt, s.i, s.sym,
                             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) AS nxt,
                             coalesce(s.sym = t.l AND
                               lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) = t.r, FALSE) AS matched
                      FROM s1 s CROSS JOIN t2 t),
              y2 AS (SELECT *, CASE WHEN matched
                               THEN i - row_number() OVER (PARTITION BY w, matched ORDER BY i) END AS island
                      FROM x2),
              m2 AS (SELECT w, cnt, i, sym, nxt,
                             matched AND (i - min(i) OVER (PARTITION BY w, island)) % 2 = 0 AS do_merge
                      FROM y2),
              s2 AS (SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i,
                             CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
                      FROM (SELECT m.*, lag(do_merge, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS consumed
                            FROM m2 m) WHERE NOT consumed),
              p3 AS (SELECT sym AS l, lead(sym) OVER (PARTITION BY w ORDER BY i) AS r, cnt FROM s2),
              t3 AS (SELECT l, r, sum(cnt)::BIGINT AS n FROM p3 WHERE r IS NOT NULL
                      GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
              x3 AS (SELECT s.w, s.cnt, s.i, s.sym,
                             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) AS nxt,
                             coalesce(s.sym = t.l AND
                               lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) = t.r, FALSE) AS matched
                      FROM s2 s CROSS JOIN t3 t),
              y3 AS (SELECT *, CASE WHEN matched
                               THEN i - row_number() OVER (PARTITION BY w, matched ORDER BY i) END AS island
                      FROM x3),
              m3 AS (SELECT w, cnt, i, sym, nxt,
                             matched AND (i - min(i) OVER (PARTITION BY w, island)) % 2 = 0 AS do_merge
                      FROM y3),
              s3 AS (SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i,
                             CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
                      FROM (SELECT m.*, lag(do_merge, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS consumed
                            FROM m3 m) WHERE NOT consumed),
              p4 AS (SELECT sym AS l, lead(sym) OVER (PARTITION BY w ORDER BY i) AS r, cnt FROM s3),
              t4 AS (SELECT l, r, sum(cnt)::BIGINT AS n FROM p4 WHERE r IS NOT NULL
                      GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
              x4 AS (SELECT s.w, s.cnt, s.i, s.sym,
                             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) AS nxt,
                             coalesce(s.sym = t.l AND
                               lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) = t.r, FALSE) AS matched
                      FROM s3 s CROSS JOIN t4 t),
              y4 AS (SELECT *, CASE WHEN matched
                               THEN i - row_number() OVER (PARTITION BY w, matched ORDER BY i) END AS island
                      FROM x4),
              m4 AS (SELECT w, cnt, i, sym, nxt,
                             matched AND (i - min(i) OVER (PARTITION BY w, island)) % 2 = 0 AS do_merge
                      FROM y4),
              s4 AS (SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i,
                             CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
                      FROM (SELECT m.*, lag(do_merge, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS consumed
                            FROM m4 m) WHERE NOT consumed),
              p5 AS (SELECT sym AS l, lead(sym) OVER (PARTITION BY w ORDER BY i) AS r, cnt FROM s4),
              t5 AS (SELECT l, r, sum(cnt)::BIGINT AS n FROM p5 WHERE r IS NOT NULL
                      GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
              x5 AS (SELECT s.w, s.cnt, s.i, s.sym,
                             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) AS nxt,
                             coalesce(s.sym = t.l AND
                               lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) = t.r, FALSE) AS matched
                      FROM s4 s CROSS JOIN t5 t),
              y5 AS (SELECT *, CASE WHEN matched
                               THEN i - row_number() OVER (PARTITION BY w, matched ORDER BY i) END AS island
                      FROM x5),
              m5 AS (SELECT w, cnt, i, sym, nxt,
                             matched AND (i - min(i) OVER (PARTITION BY w, island)) % 2 = 0 AS do_merge
                      FROM y5),
              s5 AS (SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i,
                             CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
                      FROM (SELECT m.*, lag(do_merge, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS consumed
                            FROM m5 m) WHERE NOT consumed),
              p6 AS (SELECT sym AS l, lead(sym) OVER (PARTITION BY w ORDER BY i) AS r, cnt FROM s5),
              t6 AS (SELECT l, r, sum(cnt)::BIGINT AS n FROM p6 WHERE r IS NOT NULL
                      GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
              x6 AS (SELECT s.w, s.cnt, s.i, s.sym,
                             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) AS nxt,
                             coalesce(s.sym = t.l AND
                               lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.i) = t.r, FALSE) AS matched
                      FROM s5 s CROSS JOIN t6 t),
              y6 AS (SELECT *, CASE WHEN matched
                               THEN i - row_number() OVER (PARTITION BY w, matched ORDER BY i) END AS island
                      FROM x6),
              m6 AS (SELECT w, cnt, i, sym, nxt,
                             matched AND (i - min(i) OVER (PARTITION BY w, island)) % 2 = 0 AS do_merge
                      FROM y6),
              s6 AS (SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i,
                             CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
                      FROM (SELECT m.*, lag(do_merge, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS consumed
                            FROM m6 m) WHERE NOT consumed)
              SELECT rank, left_sym, right_sym, pair_count FROM (
                SELECT 1::BIGINT AS rank, l AS left_sym, r AS right_sym, n AS pair_count FROM t1
                UNION ALL SELECT 2::BIGINT AS rank, l AS left_sym, r AS right_sym, n AS pair_count FROM t2
                UNION ALL SELECT 3::BIGINT AS rank, l AS left_sym, r AS right_sym, n AS pair_count FROM t3
                UNION ALL SELECT 4::BIGINT AS rank, l AS left_sym, r AS right_sym, n AS pair_count FROM t4
                UNION ALL SELECT 5::BIGINT AS rank, l AS left_sym, r AS right_sym, n AS pair_count FROM t5
                UNION ALL SELECT 6::BIGINT AS rank, l AS left_sym, r AS right_sym, n AS pair_count FROM t6)"""),
      doc = "Tokenizer training: distributed BPE merge learning over the word vocab"),

    Q(
      "t15_source_kl",
      (s, dir) => {
        // MIXTURE DIAGNOSTICS: KL(source token distribution ‖ corpus
        // token distribution) per source — the domain-shift statistic a
        // data recipe monitors when a new source joins the mix. Rides the
        // one-pass graft_token_counts kernel (per-doc (tok, m) pairs, no
        // per-instance aggregate), then one map-side-combined shuffle to
        // (source, tok); the source-marginal join key is `source`
        // (bounded — broadcastable), the corpus-marginal join is on `tok`
        // (vocab-sized — AQE arbitrates, nothing forces broadcast). The
        // ln() arguments are exact integer products, so only the final
        // ~vocab-per-source-term sum is floating point.
        val f = t(s, dir, "documents")
          .select(col("source"),
            explode(call_function("graft_token_counts", col("text"))).as("p"))
          .groupBy(col("source"), col("p.tok"))
          .agg(sum(col("p.m")).as("c"))
        val ts = f.groupBy(col("source")).agg(sum(col("c")).as("ts"))
        val ct = f.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
        val tt = f.agg(sum(col("c")).as("t"))
        f.join(ct, "tok").join(broadcast(ts), "source").crossJoin(broadcast(tt))
          .groupBy(col("source"))
          .agg(
            max(col("ts")).as("n_tokens"),
            sum((col("c").cast("double") / col("ts")) *
              (log((col("c") * col("t")).cast("double")) -
                log((col("ts") * col("ct")).cast("double")))).as("kl_nats"))
      },
      Some("""WITH tok AS (SELECT source,
                unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
              FROM documents),
              f AS (SELECT source, tok, count(*)::BIGINT AS c FROM tok GROUP BY source, tok),
              ts AS (SELECT source, sum(c)::BIGINT AS ts FROM f GROUP BY source),
              ct AS (SELECT tok, sum(c)::BIGINT AS ct FROM f GROUP BY tok),
              tt AS (SELECT sum(c)::BIGINT AS t FROM f)
              SELECT f.source, max(ts.ts) AS n_tokens,
                sum((f.c::DOUBLE / ts.ts) * (ln((f.c * tt.t)::DOUBLE) - ln((ts.ts * ct.ct)::DOUBLE))) AS kl_nats
              FROM f JOIN ts ON f.source = ts.source
                     JOIN ct ON f.tok = ct.tok CROSS JOIN tt
              GROUP BY f.source"""),
      doc = "Mixture: per-source KL divergence vs the corpus token distribution"),

    Q(
      "t8_quality_topk",
      (s, dir) => {
        // PER-SOURCE QUALITY SELECTION: keep each source's top-5 docs by
        // a quality signal (vocabulary-diversity permille, ties by
        // doc_id) — the quota-curation op that builds a corpus mix from
        // per-domain best-of. Two-phase rank: a single window partitioned
        // by source alone would create exactly one partition per source
        // (20 here, constant at any corpus size — a guaranteed straggler
        // on a wide cluster), so phase 1 ranks within (source, salt) and
        // keeps each shard's top-5 — a superset of the answer, since a
        // source-wide top-5 row is top-5 in its own shard — and phase 2
        // re-ranks the <=32*5 survivors per source. Both sorts are small
        // and fully parallel; output is identical to the one-window form.
        import org.apache.spark.sql.expressions.Window
        val st = call_function("graft_tok_stats", col("text"))
        val scored = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          permille(st.getField("n_distinct_tokens"), st.getField("n_tokens"))
            .as("diversity_permille"))
        val ord = Seq(col("diversity_permille").desc, col("doc_id"))
        val w1 = Window.partitionBy(col("source"), pmod(hash(col("doc_id")), lit(32)))
          .orderBy(ord: _*)
        val w = Window.partitionBy(col("source")).orderBy(ord: _*)
        scored.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= 5)
          .drop("__r1")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
      },
      Some("""WITH scored AS (SELECT doc_id, source,
                (len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) * 1000
                 // len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')))::BIGINT
                  AS diversity_permille
              FROM documents)
              SELECT doc_id, source, diversity_permille, rank FROM
                (SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY diversity_permille DESC, doc_id) AS rank FROM scored)
              WHERE rank <= 5"""),
      doc = "Curation: per-source quality top-k quota selection (partitioned rank)"),

    Q(
      "t5_corpus_ngrams",
      (s, dir) => {
        // corpus-wide top-20 word trigrams: explode → count → total-order
        // top-k (count desc, gram asc). The limit runs AFTER a map-side
        // combined aggregation, so the sort sees only distinct grams.
        val d = t(s, dir, "documents")
        d.select(explode(call_function("graft_shingle_strings", col("text"))).as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("gram"))
          .limit(20)
      },
      Some("""SELECT gram, count(*) AS n FROM (
                SELECT unnest([ array_to_string(w[i:i+2], ' ')
                                for i in range(1, greatest(len(w)-1, 1)) ]) AS gram
                FROM (SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
                      FROM documents))
              GROUP BY gram ORDER BY n DESC, gram LIMIT 20"""),
      doc = "Text: corpus n-gram frequency with deterministic global top-k"),

    Q(
      "t9_repetition_signals",
      (s, dir) => {
        // REPETITION FILTERS (the Gopher-rules analogue for one-line web
        // text): per-doc duplicate-bigram share and top-bigram share, the
        // signals that catch boilerplate / keyword-stuffed / looping docs
        // a perplexity filter wastes compute on. One codegen'd kernel call
        // per row (graft_rep_stats — TextFunctions.repStats is the HOF
        // spec) emits all three counts in a single split+hash pass; the
        // query is a pure narrow projection, no shuffle at any scale.
        // permille is NULL for docs with <2 tokens (no bigrams to judge).
        val r = call_function("graft_rep_stats", col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"), r.as("r"))
          .select(
            col("doc_id"),
            col("r.n_bigrams").as("n_bigrams"),
            col("r.n_distinct_bigrams").as("n_distinct_bigrams"),
            permille(col("r.n_bigrams") - col("r.n_distinct_bigrams"),
              col("r.n_bigrams")).as("dup_bigram_permille"),
            permille(col("r.top_bigram_m"), col("r.n_bigrams"))
              .as("top_bigram_permille"))
      },
      Some("""WITH b AS (
                SELECT doc_id,
                  [ w[i] || ' ' || w[i+1] for i in range(1, greatest(len(w), 1)) ] AS bg
                FROM (SELECT doc_id,
                        list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
                      FROM documents))
              SELECT doc_id,
                len(bg)::BIGINT AS n_bigrams,
                len(list_distinct(bg))::BIGINT AS n_distinct_bigrams,
                CASE WHEN len(bg) = 0 THEN NULL
                     ELSE ((len(bg) - len(list_distinct(bg))) * 1000 // len(bg))::BIGINT
                END AS dup_bigram_permille,
                CASE WHEN len(bg) = 0 THEN NULL
                     ELSE (list_max(list_transform(list_distinct(bg),
                             x -> len(list_filter(bg, y -> y = x)))) * 1000 // len(bg))::BIGINT
                END AS top_bigram_permille
              FROM b"""),
      doc = "Text: Gopher-style per-doc repetition signals (dup/top bigram share)"),

    Q(
      "t10_tfidf_topk",
      (s, dir) => {
        // TF-IDF TOP TERMS: each doc's k most characteristic terms under
        // smoothed idf = ln((N+1)/(df+1)). The tf stage is the native
        // per-doc counting kernel (term multiplicities computed IN-ROW, so
        // the explode ships one row per DISTINCT term per doc, not per
        // token instance); df re-aggregates the same expression (its
        // partial aggregate collapses to distinct-terms-per-map-partition
        // before the shuffle). The idf attach is a JOIN on term, not a
        // count-over-term window: a window keyed on term would buffer
        // every ("the", doc) row in ONE partition — unbounded skew — while
        // the join degrades gracefully (small-corpus stats broadcast the
        // df side, as this plan does at test scale; unbounded-vocab scale
        // exceeds the threshold and falls back to a shuffle join whose hot
        // terms are AQE skew-join work). The corpus size joins in as a
        // broadcast 1-row frame from a zero-column footer scan (no driver
        // action), and the top-k window partitions on doc_id — high
        // cardinality, per-partition sort bounded by a doc's vocabulary,
        // with Spark's WindowGroupLimit pruning to k rows per doc BEFORE
        // the exchange.
        // Ranking uses the raw double score; the REPORTED score is
        // milli-rounded so the hash compare is integer-exact (ln is not
        // required correctly rounded, so raw doubles could differ in the
        // last ulp across engines).
        import org.apache.spark.sql.expressions.Window
        val kk = 3
        val docs = t(s, dir, "documents")
        val total = docs.agg(count(lit(1)).as("n_docs"))
        val tf = docs
          .select(col("doc_id"),
            explode(call_function("graft_token_counts", col("text"))).as("p"))
          .select(col("doc_id"), col("p.tok").as("term"), col("p.m").as("tf"))
        val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(dfq, Seq("term"))
          .crossJoin(broadcast(total))
          .withColumn("score",
            col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= kk)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
            round(col("score") * 1000).cast("long").as("score_milli"))
      },
      Some("""WITH tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                FROM (SELECT doc_id,
                        unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
                      FROM documents)
                GROUP BY doc_id, term),
              dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
              n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
              scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                  tf.tf * ln((n.n_docs + 1.0) / (dfq.df + 1.0)) AS score
                FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n),
              r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term) AS rank FROM scored)
              SELECT doc_id, rank::BIGINT AS rank, term, tf, df,
                     round(score * 1000)::BIGINT AS score_milli
              FROM r WHERE rank <= 3"""),
      doc = "Text: per-doc top-k terms by smoothed tf-idf (kernel tf, shuffle-join idf)"),

    Q(
      "t11_line_dedup",
      (s, dir) => {
        // C4-STYLE LINE-LEVEL DEDUP: segment each doc into fixed 8-token
        // "lines", drop EVERY occurrence of any line whose exact text
        // repeats anywhere in the corpus (the C4 rule that strips
        // boilerplate — nav bars, cookie banners, license headers — from
        // otherwise-unique pages), then reassemble the survivors in
        // document order. A deterministic boilerplate line is spliced
        // onto every doc (the synthetic corpus is clean prose, like t6's
        // PII splice) so the op has real work at any sf. The kept-text
        // md5 makes the compare sensitive to every byte of the
        // reassembly, including line order.
        //
        // SCALE SHAPE: one map-side-combined count on the line text (the
        // shuffle carries distinct lines per partition, not line
        // instances), the repeated-line set is duplication-bounded (tiny
        // for a healthy corpus) so AQE broadcasts the anti-join probe,
        // and the reassembly groups by doc_id — collect_list is bounded
        // by a single document's line count. No global sort; per-doc
        // order rides the (idx, line) struct sort inside each group.
        val boiler = "subscribe to our newsletter for updates and offers"
        // r15: segmentation rides the graft_line_grams kernel (one JIT'd
        // split+group pass; TextFunctions.lineGrams is the HOF spec) —
        // the interpreted transform/slice/array_join chain ran per line
        // in BOTH subtrees below (corpus line count + probe side)
        val lines = call_function("graft_line_grams",
          concat(lit(boiler), lit(" "), col("text")), lit(8))
        val exploded = t(s, dir, "documents")
          .select(col("doc_id"), posexplode(lines).as(Seq("idx", "line")))
        val repeated = exploded.groupBy(col("line"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2)
          .select(col("line"))
        exploded.join(repeated, Seq("line"), "left_anti")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_kept"),
            md5(array_join(
              transform(array_sort(collect_list(struct(col("idx"), col("line")))),
                p => p.getField("line")), " ")).as("kept_md5"))
      },
      Some("""WITH w AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(
                    'subscribe to our newsletter for updates and offers ' || text,
                    '\s+'), x -> x <> '') AS w
                FROM documents),
              l AS (SELECT doc_id,
                  [ {'idx': k, 'line': array_to_string(w[k*8+1 : k*8+8], ' ')}
                    for k in range(0, (len(w)+7)//8) ] AS lines
                FROM w),
              e AS (SELECT doc_id, u.idx AS idx, u.line AS line
                    FROM (SELECT doc_id, unnest(lines) AS u FROM l)),
              c AS (SELECT line FROM e GROUP BY line HAVING count(*) >= 2),
              k AS (SELECT e.* FROM e LEFT JOIN c ON e.line = c.line
                    WHERE c.line IS NULL)
              SELECT doc_id, count(*) AS n_kept,
                md5(array_to_string(array_agg(line ORDER BY idx), ' ')) AS kept_md5
              FROM k GROUP BY doc_id"""),
      doc = "Text: C4-style corpus-wide line-level dedup with ordered reassembly"),

    Q(
      "t12_classifier_sweep",
      (s, dir) => {
        // CLASSIFIER-FILTER THRESHOLD SWEEP (the CCNet/fastText-quality-
        // filter calibration step): score every doc with a fixed-weight
        // linear model over its quality signals, then report each
        // source's keep-curve — how many docs and tokens survive at each
        // candidate threshold — which is the table you read to pick the
        // production cutoff. The model is integer-milli weighted (the
        // sigmoid is monotonic, so thresholding the linear score is
        // exactly thresholding the probability) and the sweep rides the
        // tp3 histogram trick: one map-side-combined shuffle to
        // (source, score) — a frame bounded by sources x 3001 at ANY
        // corpus size — then a tiny threshold cross join. 100 TB cost =
        // one histogram shuffle; the sweep itself is constant work.
        // r15: the stopword count rides the graft_vocab_hits kernel (one
        // split+set-probe pass; the old size(filter(toks, isin)) form
        // materialized the token array and walked it through an
        // interpreted isin lambda) and the token total reuses the
        // tok-stats kernel's n_tokens — no token array is built at all.
        val stop = Seq("the", "a", "of", "and", "in", "to", "is")
        val st = call_function("graft_tok_stats", col("text"))
        val score = greatest(lit(0L), least(lit(3000L),
          permille(st.getField("n_distinct_tokens"), st.getField("n_tokens")) * 2
            + permille(call_function("graft_alpha_count", col("text")),
                length(col("text")))
            - permille(call_function("graft_vocab_hits", col("text"),
                  typedlit(stop)),
                st.getField("n_tokens"))))
        val hist = t(s, dir, "documents")
          .select(col("source"), score.as("score"),
            st.getField("n_tokens").as("n_toks"))
          .groupBy(col("source"), col("score"))
          .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("tok"))
        val thresholds = hist.sparkSession.range(0, 3001, 250)
          .select(col("id").as("threshold"))
        hist.crossJoin(broadcast(thresholds))
          .groupBy(col("source"), col("threshold"))
          .agg(
            sum(when(col("score") >= col("threshold"), col("n"))
              .otherwise(0L)).as("n_kept"),
            sum(when(col("score") >= col("threshold"), col("tok"))
              .otherwise(0L)).as("kept_tokens"))
      },
      Some("""WITH q AS (SELECT source,
                  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks,
                  text
                FROM documents),
              scored AS (SELECT source,
                  greatest(0, least(3000,
                    (len(list_distinct(toks)) * 1000 // len(toks)) * 2
                    + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000 // length(text)
                    - len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to','is'], x))) * 1000 // len(toks)
                  ))::BIGINT AS score,
                  len(toks)::BIGINT AS n_toks
                FROM q),
              hist AS (SELECT source, score, count(*)::BIGINT AS n,
                         sum(n_toks)::BIGINT AS tok
                       FROM scored GROUP BY source, score),
              th AS (SELECT unnest(range(0, 3001, 250))::BIGINT AS threshold)
              SELECT source, threshold,
                sum(CASE WHEN score >= threshold THEN n ELSE 0 END)::BIGINT AS n_kept,
                sum(CASE WHEN score >= threshold THEN tok ELSE 0 END)::BIGINT AS kept_tokens
              FROM hist CROSS JOIN th
              GROUP BY source, threshold"""),
      doc = "Filtering: fixed-weight quality-classifier threshold sweep (keep-curve per source)"),

    Q(
      "t13_cms_hot_terms",
      (s, dir) => {
        // HEAVY HITTERS via Count-Min Sketch, contract-checked like
        // a13's HLL/percentile: the hot-term (or hot-domain, hot-URL)
        // profile a corpus pass keeps is a SKETCH, because an exact
        // per-term count table at web scale is itself a billion-row
        // shuffle. CMS builds in ONE treeAggregate pass over the
        // (doc, term) stream — no shuffle at all, mergeable across
        // executors/batches — and answers point frequency queries with
        // a one-sided error: est >= exact, est <= exact + eps*N with
        // probability 1-delta (eps=1e-4, delta=1e-3, fixed seed so the
        // run is deterministic). The exact side (vocab aggregate +
        // top-20 TakeOrderedAndProject) exists here to CHECK that
        // contract; at 100 TB you drop it and keep the sketch. The
        // oracle recomputes the exact top-20 doc frequencies and
        // expects every contract boolean TRUE.
        val pairs = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(call_function("graft_token_counts", col("text"))).as("p"))
          .select(col("p.tok").as("term"))
        val cms = pairs.stat.countMinSketch("term", 1e-4, 0.999, 42)
        // the sketch already counts every item it absorbed — the stream
        // total for the eps bound is free, no separate count() pass
        val nTotal = cms.totalCount()
        val top = pairs.groupBy(col("term")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("n_docs").desc, col("term")).limit(20)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val eps = math.ceil(1e-4 * nTotal).toLong
        import s.implicits._
        top.toSeq.map { case (term, exact) =>
          val est = cms.estimateCount(term)
          (term, exact, est >= exact && est <= exact + eps)
        }.toDF("term", "n_docs", "cms_ok")
      },
      Some("""WITH tok AS (
                SELECT DISTINCT doc_id,
                  unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
                FROM documents)
              SELECT term, count(*) AS n_docs, TRUE AS cms_ok
              FROM tok GROUP BY term
              ORDER BY n_docs DESC, term LIMIT 20"""),
      doc = "Sketches: Count-Min heavy hitters in one shuffle-free pass, error-contract-checked"),

    Q(
      "t16_unigram_ppl",
      (s, dir) => {
        // LM-PERPLEXITY QUALITY FILTER (CCNet shape, unigram LM standing
        // in for KenLM): score every document by its average per-token
        // negative log-probability under the corpus's own unigram
        // distribution — the filter that drops boilerplate/gibberish
        // whose token mix diverges from the corpus. One kernel pass
        // yields per-doc (tok, multiplicity) pairs, so the vocab join
        // carries DISTINCT doc-tokens, not token instances; the corpus
        // freq table is vocab-sized (AQE arbitrates broadcast vs
        // shuffle at real scale, nothing forces a broadcast of an
        // unbounded vocab). Determinism: per-token nll is quantized to
        // integer micro-nats BEFORE summing (ln ulp differences between
        // engines round away; long sums are order-independent under
        // partial aggregation, the engine's integer-quantized-math
        // story), and the final avg is one exact IEEE division.
        val pairs = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(call_function("graft_token_counts", col("text"))).as("p"))
          .select(col("doc_id"), col("p.tok").as("tok"), col("p.m").as("m"))
        val freq = pairs.groupBy(col("tok")).agg(sum(col("m")).as("c"))
        val tot = freq.agg(sum(col("c")).as("n"))
        pairs.join(freq, "tok").crossJoin(broadcast(tot))
          .select(col("doc_id"), col("m"),
            round((log(col("n").cast("double")) - log(col("c").cast("double"))) * 1e6)
              .cast("long").as("nll_micro"))
          .groupBy(col("doc_id"))
          .agg(sum(col("m")).as("n_toks"),
            sum(col("m") * col("nll_micro")).as("nll_sum_micro"))
          .select(col("doc_id"), col("n_toks"),
            (col("nll_sum_micro").cast("double") / 1e6 / col("n_toks").cast("double"))
              .as("avg_nll"))
      },
      Some("""WITH tok AS (SELECT doc_id,
                unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
              FROM documents),
              p AS (SELECT doc_id, tok, count(*)::BIGINT AS m FROM tok GROUP BY doc_id, tok),
              f AS (SELECT tok, sum(m)::BIGINT AS c FROM p GROUP BY tok),
              n AS (SELECT sum(c)::BIGINT AS n FROM f)
              SELECT p.doc_id, sum(p.m)::BIGINT AS n_toks,
                     sum(p.m * round((ln(n.n::DOUBLE) - ln(f.c::DOUBLE)) * 1e6)::BIGINT)::DOUBLE
                       / 1e6 / sum(p.m)::DOUBLE AS avg_nll
              FROM p JOIN f ON p.tok = f.tok CROSS JOIN n
              GROUP BY p.doc_id"""),
      doc = "Quality: unigram-LM per-doc perplexity scoring, integer-quantized nll"),

    Q(
      "bpe2_greedy_encode",
      (s, dir) => {
        // TOKENIZER APPLY (closes the loop bpe1's merge LEARNING opened):
        // greedy longest-prefix piece encoding of every document against
        // a corpus-derived vocabulary — the wordpiece-family inference
        // step a pretraining pipeline runs to get token budgets from the
        // real tokenizer rather than the whitespace proxy. Vocab = the
        // top-64 corpus tokens (count-desc, lex tie-break), collected
        // once (64 strings — the sim7 codebook pattern) and baked into
        // the plan; encoding is ONE codegen'd kernel call per document
        // (the vocab rides as a codegen reference object), so the corpus
        // pass stays a narrow scan with zero shuffles and zero
        // per-piece expression evaluation. At a real 50k-entry vocab the
        // kernel's linear probe becomes a trie — the plan shape
        // (broadcast vocab constant + per-row kernel) is unchanged.
        val vocab: Seq[String] = t(s, dir, "documents")
          .select(explode(call_function("graft_token_counts", col("text"))).as("p"))
          .groupBy(col("p.tok")).agg(sum(col("p.m")).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(64)
          .collect().map(_.getString(0)).toSeq
        val st = call_function("graft_greedy_pieces", col("text"), typedlit(vocab))
        t(s, dir, "documents")
          .select(col("doc_id"), st.as("st"))
          .select(col("doc_id"),
            col("st").getItem(0).as("n_pieces"),
            col("st").getItem(1).as("covered_chars"),
            col("st").getItem(2).as("word_chars"))
      },
      Some("""WITH RECURSIVE tok AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
                FROM documents),
              cnt AS (SELECT tok, count(*)::BIGINT AS c FROM tok GROUP BY tok),
              vocab AS (SELECT tok AS v FROM cnt ORDER BY c DESC, tok LIMIT 64),
              st AS (
                SELECT doc_id, tok AS w, 1 AS i, 0::BIGINT AS pieces, 0::BIGINT AS covered
                FROM tok
                UNION ALL
                SELECT doc_id, w, (i + coalesce(len(best), 1))::INT, pieces + 1,
                       covered + coalesce(len(best), 0)
                FROM (SELECT st.*,
                        (SELECT v FROM vocab
                         WHERE len(v) <= len(st.w) - st.i + 1
                           AND substr(st.w, st.i, len(v)) = v
                         ORDER BY len(v) DESC, v LIMIT 1) AS best
                      FROM st WHERE i <= len(w)) s)
              SELECT doc_id, sum(pieces)::BIGINT AS n_pieces,
                     sum(covered)::BIGINT AS covered_chars,
                     sum(len(w))::BIGINT AS word_chars
              FROM st WHERE i > len(w)
              GROUP BY doc_id"""),
      doc = "Tokenizer apply: greedy longest-prefix piece encode vs corpus vocab, one kernel pass"),

    Q(
      "t18_tokenizer_fertility",
      (s, dir) => {
        // PER-SOURCE TOKENIZER FERTILITY + OOV (the pretraining
        // diagnostic run before committing a token budget: which
        // domains does the tokenizer encode efficiently, and where does
        // vocabulary coverage collapse?). Rides bpe2's greedy-encode
        // kernel (vocab = top-64 corpus tokens, baked as a codegen
        // reference object) — one kernel call per doc, then a
        // sources-sized groupBy (map-side combined; ≤ |sources| groups
        // at any corpus scale). fertility_milli = pieces per 1000 word
        // chars (lower = cheaper encoding); oov_permille = share of
        // word chars no vocab piece covered (the single-char fallback
        // path). All-integer outputs so the compare is hash-exact.
        val vocab: Seq[String] = t(s, dir, "documents")
          .select(explode(call_function("graft_token_counts", col("text"))).as("p"))
          .groupBy(col("p.tok")).agg(sum(col("p.m")).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(64)
          .collect().map(_.getString(0)).toSeq
        val st = call_function("graft_greedy_pieces", col("text"), typedlit(vocab))
        t(s, dir, "documents")
          .select(col("source"), st.as("st"))
          .groupBy(col("source"))
          .agg(sum(col("st").getItem(0)).as("n_pieces"),
            sum(col("st").getItem(1)).as("covered_chars"),
            sum(col("st").getItem(2)).as("word_chars"))
          .select(col("source"), col("n_pieces"), col("word_chars"),
            permille(col("n_pieces"), col("word_chars")).as("fertility_milli"),
            permille(col("word_chars") - col("covered_chars"), col("word_chars"))
              .as("oov_permille"))
      },
      Some("""WITH RECURSIVE tok AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
                FROM documents),
              cnt AS (SELECT tok, count(*)::BIGINT AS c FROM tok GROUP BY tok),
              vocab AS (SELECT tok AS v FROM cnt ORDER BY c DESC, tok LIMIT 64),
              st AS (
                SELECT doc_id, tok AS w, 1 AS i, 0::BIGINT AS pieces, 0::BIGINT AS covered
                FROM tok
                UNION ALL
                SELECT doc_id, w, (i + coalesce(len(best), 1))::INT, pieces + 1,
                       covered + coalesce(len(best), 0)
                FROM (SELECT st.*,
                        (SELECT v FROM vocab
                         WHERE len(v) <= len(st.w) - st.i + 1
                           AND substr(st.w, st.i, len(v)) = v
                         ORDER BY len(v) DESC, v LIMIT 1) AS best
                      FROM st WHERE i <= len(w)) s),
              perdoc AS (SELECT doc_id, sum(pieces)::BIGINT AS n_pieces,
                     sum(covered)::BIGINT AS covered_chars,
                     sum(len(w))::BIGINT AS word_chars
                FROM st WHERE i > len(w)
                GROUP BY doc_id)
              SELECT d.source, sum(p.n_pieces)::BIGINT AS n_pieces,
                     sum(p.word_chars)::BIGINT AS word_chars,
                     (sum(p.n_pieces) * 1000 // sum(p.word_chars))::BIGINT AS fertility_milli,
                     ((sum(p.word_chars) - sum(p.covered_chars)) * 1000 // sum(p.word_chars))::BIGINT AS oov_permille
              FROM perdoc p JOIN documents d USING (doc_id)
              GROUP BY d.source"""),
      doc = "Tokenizer diagnostic: per-source fertility + OOV share under the corpus vocab"),

    Q(
      "t19_span_dedup",
      (s, dir) => {
        // EXACT-SUBSTRING SPAN DEDUP (the Lee et al. 2022 "Deduplicating
        // Training Data Makes Language Models Better" family, re-shaped
        // for Spark): slide a 16-token window with stride 1 over every
        // doc, find windows whose exact text repeats ANYWHERE in the
        // corpus, merge each doc's repeated windows into MAXIMAL
        // overlapping-or-adjacent intervals (gaps-and-islands), excise
        // every covered token, and reassemble the survivors in order.
        // Differs from t11 on both axes that matter: windows slide (a
        // repeat is caught at any offset, not only on an 8-token line
        // grid) and removal is by merged span (a 40-token boilerplate
        // block is one island, not five independent lines). An 18-token
        // boilerplate is spliced onto BOTH ends of every doc so the op
        // has real work at any sf: every doc excises at least the 36
        // spliced tokens (2 islands), plus junction windows that
        // GENUINELY repeat corpus-wide (the synthetic vocab is small,
        // so another doc often shares the few content tokens adjacent
        // to the splice — measured 2-4 extra tokens/doc at sf0.01) and
        // full-doc coverage for exact-duplicate docs (1 island).
        // TextSpanSpec pins these removal invariants.
        //
        // SCALE SHAPE: |windows| ≈ |tokens| (stride 1), so the
        // window-count shuffle is linear in corpus tokens with map-side
        // partial aggregation — the same honest bound as t11's line
        // counts, paid once. The repeated set is duplication-bounded
        // (tiny for a healthy corpus), AQE arbitrates the probe join;
        // per-doc island merging is one window sort bounded by the
        // doc's own span count (identical docs collapse to ONE island,
        // so dup-heavy corpora stay linear — no quadratic pair risk
        // anywhere). The tokenized base is checkpointed: text parses
        // once, reassembly reuses it.
        val W = 16
        val boiler = "all rights reserved this document is provided as is " +
          "without warranty of any kind either express or implied"
        val base = t(s, dir, "documents")
          .select(col("doc_id"),
            tokens(concat(lit(boiler), lit(" "), col("text"),
              lit(" "), lit(boiler))).as("w"))
          .withColumn("n", size(col("w")).cast("long"))
          .localCheckpoint(false) // feeds window-gen AND ordered reassembly
        // r15: window signatures ride the graft_window_hashes kernel (one
        // JIT'd pass with a reused digest buffer) — the HOF form paid an
        // interpreted slice+array_join+md5 lambda per window ≈ per token
        // (4.6 s of the query's 4.9 s noop-actioned cost at sf0.1); the
        // window offset falls out of posexplode instead of a struct
        val wins = base.filter(col("n") >= W)
          .select(col("doc_id"),
            posexplode(call_function("graft_window_hashes", col("w"), lit(W)))
              .as(Seq("k", "h")))
          .select(col("doc_id"), col("k").cast("long").as("st"),
            (col("k") + (W - 1)).cast("long").as("en"), col("h"))
        val rep = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select(col("h"))
        val spans = wins.join(rep, Seq("h"))
          .select(col("doc_id"), col("st"), col("en"))
        import org.apache.spark.sql.expressions.Window
        val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("st"))
        val prevMax = max(col("en"))
          .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
        val islands = spans
          .withColumn("ni",
            when(prevMax.isNull || col("st") > prevMax + 1, 1L).otherwise(0L))
          .withColumn("isl", sum(col("ni"))
            .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("doc_id"), col("isl"))
          .agg(min(col("st")).as("s"), max(col("en")).as("e"))
        val perDoc = islands.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(col("e") - col("s") + 1).as("n_removed"),
            collect_list(struct(col("s"), col("e"))).as("sp"))
        base.join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n").as("n_tokens"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("n_removed"), lit(0L)).as("n_removed"),
            when(col("sp").isNull, md5(array_join(col("w"), " ")))
              .otherwise(md5(array_join(
                filter(col("w"), (x, i) =>
                  not(exists(col("sp"), p =>
                    i.cast("long").geq(p.getField("s")) &&
                      i.cast("long").leq(p.getField("e"))))),
                " "))).as("kept_md5"))
      },
      Some("""WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(
                  'all rights reserved this document is provided as is without warranty of any kind either express or implied '
                  || text ||
                  ' all rights reserved this document is provided as is without warranty of any kind either express or implied',
                  '\s+'), x -> x <> '') AS w
                FROM documents),
              b AS (SELECT doc_id, w, len(w)::BIGINT AS n FROM w),
              wins AS (SELECT doc_id, k::BIGINT AS k,
                  md5(array_to_string(w[k+1:k+16], ' ')) AS h
                FROM (SELECT doc_id, w, unnest(range(0, len(w)-15)) AS k
                      FROM b WHERE len(w) >= 16)),
              rep AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
              sp AS (SELECT doc_id, k AS st, k+15 AS en FROM wins JOIN rep USING (h)),
              gi AS (SELECT doc_id, st, en,
                  CASE WHEN max(en) OVER pw IS NULL OR st > max(en) OVER pw + 1
                       THEN 1 ELSE 0 END AS ni
                FROM sp
                WINDOW pw AS (PARTITION BY doc_id ORDER BY st
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              gi2 AS (SELECT doc_id, st, en,
                  sum(ni) OVER (PARTITION BY doc_id ORDER BY st
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
                FROM gi),
              isl AS (SELECT doc_id, isl, min(st) AS s, max(en) AS e
                FROM gi2 GROUP BY 1, 2),
              stats AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
                  sum(e - s + 1)::BIGINT AS n_removed FROM isl GROUP BY 1),
              tokix AS (SELECT doc_id, unnest(w) AS tok,
                  (generate_subscripts(w, 1) - 1)::BIGINT AS i FROM b),
              kept AS (SELECT t.doc_id,
                  md5(string_agg(t.tok, ' ' ORDER BY t.i)) AS km
                FROM tokix t
                WHERE NOT EXISTS (SELECT 1 FROM isl s
                  WHERE s.doc_id = t.doc_id AND t.i BETWEEN s.s AND s.e)
                GROUP BY t.doc_id)
              SELECT b.doc_id, b.n AS n_tokens,
                coalesce(st.n_spans, 0)::BIGINT AS n_spans,
                coalesce(st.n_removed, 0)::BIGINT AS n_removed,
                coalesce(k.km, md5('')) AS kept_md5
              FROM b LEFT JOIN stats st USING (doc_id)
                     LEFT JOIN kept k USING (doc_id)"""),
      doc = "Text: exact-substring span dedup (sliding 16-gram repeats, maximal-island excision)")
  )
}
