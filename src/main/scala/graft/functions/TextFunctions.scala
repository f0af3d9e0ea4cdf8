package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, fingerprints, quality signals, language ID.
  *
  * All pure column expressions (built-ins + higher-order functions) — no
  * UDFs, no collect; every operator is a narrow map over the corpus and
  * scales linearly with executors. Hash-bearing ops use the portable
  * [[HashFunctions.h60]] so results are oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped (split('\s+') leaves a leading ""
    * for leading whitespace).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Per-row token multiplicities: `array<struct<tok,m>>` with one entry
    * per DISTINCT token of `toks` and its in-row count. Sort + run-length
    * over the sorted array — all codegen'd HOFs, no per-row hash map, no
    * corpus-wide aggregation. This is the map-side shrink for
    * token-instance pipelines (t7): exploding these pairs instead of raw
    * tokens means the per-(doc, tok) aggregate that would otherwise hash
    * every token INSTANCE never exists (at sf10 that aggregate alone cost
    * more than the rest of the query).
    *
    * Indices: `b` holds the 0-based positions where a new run starts; run
    * j spans [b[j], b[j+1]) with size(ts) closing the last run.
    * `element_at` is 1-based, hence the +1/+2 shifts; the CASE guards the
    * out-of-range lookup before it happens (ANSI mode errors on OOB).
    */
  def tokenCounts(toks: Column): Column =
    DedupFunctions.let1(array_sort(toks)) { ts =>
      DedupFunctions.let1(
        // greatest(.., 0): sequence(0, -1) would go DESCENDING for an empty
        // ts and the filter lambda would probe element_at(ts, 0) — the
        // empty result is produced by the outer CASE instead
        filter(sequence(lit(0), greatest(size(ts) - 1, lit(0))),
          i => (i === 0) || (element_at(ts, i + 1) =!= element_at(ts, i)))) { b =>
        when(size(ts) === 0, array().cast("array<struct<tok:string,m:bigint>>"))
          .otherwise(
            transform(sequence(lit(0), size(b) - 1), j =>
              struct(
                element_at(ts, element_at(b, j + 1) + 1).as("tok"),
                (when(j === size(b) - 1, size(ts))
                  .otherwise(element_at(b, j + 2)) - element_at(b, j + 1)).cast("long").as("m"))))
      }
    }

  /** Word n-gram shingles: array of n-token strings joined by single
    * spaces; fewer than n tokens → empty array (sequence() would go
    * DESCENDING for stop<start — must be guarded).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(typedlit(Seq.empty[String]))

  /** Per-row token stats `struct<n_tokens, n_distinct_tokens>` — the
    * executable spec for the `graft_tok_stats` kernel (bit-parity
    * asserted in NativeTextExpressionsSpec). The diversity-permille
    * quality score t8/tp3 rank on is `permille(n_distinct_tokens,
    * n_tokens)` over this struct.
    */
  def tokStats(toks: Column): Column =
    struct(
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"))

  /** Per-row bigram repetition stats
    * `struct<n_bigrams, n_distinct_bigrams, top_bigram_m>` — the
    * executable spec for the `graft_rep_stats` kernel (bit-parity
    * asserted in NativeTextExpressionsSpec). Composes two existing
    * spec'd HOFs: bigrams = `shingles(toks, 2)`, multiplicities =
    * `tokenCounts(bigrams)` (generic over any string array); the top
    * count is the max `m`. Fewer than 2 tokens → (0, 0, 0).
    */
  def repStats(toks: Column): Column =
    DedupFunctions.let1(tokenCounts(shingles(toks, 2))) { tc =>
      struct(
        coalesce(aggregate(tc, lit(0L), (acc, e) => acc + e.getField("m")), lit(0L))
          .as("n_bigrams"),
        size(tc).cast("long").as("n_distinct_bigrams"),
        coalesce(array_max(transform(tc, e => e.getField("m"))), lit(0L))
          .as("top_bigram_m"))
    }

  /** Non-overlapping n-token "lines" in document order, each joined by
    * single spaces; the last line keeps the remainder; zero tokens →
    * empty array. The executable spec for the `graft_line_grams` kernel
    * (bit-parity asserted in NativeTextExpressionsSpec) — t11's C4-style
    * line segmentation.
    */
  def lineGrams(text: Column, n: Int): Column =
    DedupFunctions.let1(tokens(text)) { toks =>
      when(size(toks) === 0, typedlit(Seq.empty[String]))
        .otherwise(transform(
          sequence(lit(0), ceil(size(toks) / n.toDouble).cast("int") - 1),
          k => array_join(slice(toks, k * n + 1, lit(n)), " ")))
    }

  /** Distinct sorted shingles — the set used by Jaccard/MinHash. */
  def shingleSet(text: Column, n: Int): Column =
    array_sort(array_distinct(shingles(tokens(text), n)))

  /** Distinct HASHED 3-gram shingle set (array<bigint>), the fast path for
    * Jaccard/MinHash at corpus scale: ONE portable md5-derived hash per
    * TOKEN, then each shingle hash is an arithmetic mix of 3 consecutive
    * token hashes — shingle-count md5 calls (the dominant cost: lambda
    * bodies are interpreted per element) drop to token-count.
    *
    * Mix: ((h1 % M)*4093 + (h2 % M)*8191 + (h3 % M)) % M with M = 2^40 —
    * every intermediate stays < 2^54, so the arithmetic neither wraps in
    * Spark nor overflows DuckDB's checked BIGINT; any of the ~2^-40-rate
    * collisions is reproduced identically by the oracle.
    */
  def hashedShingleSet(text: Column): Column = {
    val M = 1L << 40
    DedupFunctions.let1(transform(tokens(text), t => HashFunctions.h60(t) % M)) { hs =>
      when(size(hs) >= 3,
        array_distinct(transform(sequence(lit(0), size(hs) - 3),
          i => (element_at(hs, i + 1) * 4093L +
            element_at(hs, i + 2) * 8191L +
            element_at(hs, i + 3)) % M)))
        .otherwise(typedlit(Seq.empty[Long]))
    }
  }

  /** Exact content fingerprint: md5 of whitespace-normalized casefolded
    * text (the exact-dedup key).
    */
  def contentFingerprint(text: Column): Column =
    md5(array_join(tokens(lower(text)), " "))

  /** Polynomial rolling hash over the token stream:
    * fold acc = (acc * 31 + h60(tok) % M) % M, M = 1e9+7.
    * Order-sensitive (unlike the content fingerprint) — a cheap
    * order-preserving document signature.
    */
  def rollingHash(toks: Column): Column = {
    val M = 1000000007L
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(HashFunctions.h60(t), lit(M)), lit(M)))
  }

  /** Token count via a BPE-ish regex: splits words, numbers, and single
    * punctuation marks the way byte-pair pretokenizers do
    * (letters+ | digits+ | single non-space symbol).
    */
  def bpeTokenCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      t => trim(t) =!= lit("")))

  /** Integer permille via exact integral division (`div` =
    * IntegralDivide): bit-identical to DuckDB's integer `//` after
    * *1000 at ANY magnitude — the earlier floor-over-double form was
    * exact only while num*1000 stayed under 2^53, which a corpus-wide
    * token sum (t7's denominator) can exceed at the 100 TB design point
    * (ADVICE r8). Both operands are nonnegative counts here, so
    * truncation == floor == DuckDB's `//`. The zero-denominator guard
    * mirrors DuckDB: `// 0` is NULL (Spark's non-ANSI div also nulls,
    * but the explicit guard keeps the contract visible). The ratio
    * idiom every quality/overlap/duplication signal uses.
    */
  def permille(num: Column, den: Column): Column =
    when(den === 0, lit(null))
      .otherwise(call_function("div", num.cast("long") * 1000L, den.cast("long")))
      .cast("long")

  /** Tiny per-language marker lexicons (stopword heuristic) for language
    * ID. On synthetic corpora the interesting part is the *mechanism*:
    * per-language marker hit counts → argmax with deterministic tie-break
    * (count desc, list order).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  /** Marker-argmax language id as a pure column expression — the
    * executable SPEC for the native `graft_lang_id` kernel
    * ([[graft.expressions.TextKernels.langId]]), which computes the same
    * argmax in one token pass instead of one interpreted filter per
    * language.
    */
  def detectedLangHof(text: Column): Column = {
    val toks = tokens(lower(text))
    val ranked = LangMarkers.zipWithIndex.map { case ((code, markers), i) =>
      struct(
        size(filter(toks, x => x.isin(markers.map(lit(_)): _*))).as("hits"),
        lit(LangMarkers.length - i).as("prio"),
        lit(code).as("code"))
    }
    array_max(array(ranked: _*)).getField("code")
  }
}
