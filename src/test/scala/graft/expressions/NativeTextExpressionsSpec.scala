package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.DedupFunctions.simhashSql
import graft.functions.TextFunctions.{hashedShingleSet, shingles, tokens}
import graft.functions.HashFunctions.h60

/** The native codegen expressions must be bit-identical to their
  * higher-order-function specs (which the DuckDB oracle independently
  * recomputes) — including whitespace edge cases, short docs, and nulls.
  */
class NativeTextExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading and   multiple   spaces\tand tabs\nnewlines  ",
    "one two",                     // < 3 tokens -> no shingles
    "",                            // empty
    "dup dup dup dup",             // repeated tokens / repeated shingles
    "a b c a b c a b c",           // repeated shingles across positions
    "single").toDF("text")

  test("graft_simhash60 matches the HOF simhash spec") {
    val spec = docs
      .withColumn("hs", transform(tokens(col("text")), tk => h60(tk)))
      .selectExpr(simhashSql("hs") + " AS want")
      .as[Long].collect()
    val got = docs.select(call_function("graft_simhash60", col("text")))
      .as[Long].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_shingle_hashes matches hashedShingleSet as a set") {
    val spec = docs.select(array_sort(hashedShingleSet(col("text"))))
      .as[Seq[Long]].collect()
    val got = docs.select(array_sort(call_function("graft_shingle_hashes", col("text"))))
      .as[Seq[Long]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_shingle_strings matches shingles(tokens, 3) with multiplicity") {
    val spec = docs.select(shingles(tokens(col("text")), 3))
      .as[Seq[String]].collect()
    val got = docs.select(call_function("graft_shingle_strings", col("text")))
      .as[Seq[String]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_line_grams matches lineGrams(text, n) including remainders") {
    Seq(3, 8).foreach { n =>
      val spec = docs.select(graft.functions.TextFunctions.lineGrams(col("text"), n))
        .as[Seq[String]].collect()
      val got = docs.select(call_function("graft_line_grams", col("text"), lit(n)))
        .as[Seq[String]].collect()
      assert(got.toSeq == spec.toSeq, s"n=$n")
    }
  }

  test("graft_alpha_count matches length(regexp_replace(text, non-alpha, ''))") {
    val extra = (docs.as[String].collect().toSeq ++
      Seq("Ünïcode mixés ascii AZaz09", "日本語 text with LATIN", "123 !@# []"))
      .toDF("text")
    val spec = extra.select(
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
      .as[Long].collect()
    val got = extra.select(call_function("graft_alpha_count", col("text")))
      .as[Long].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_window_hashes matches per-window md5(array_join(slice)) HOF") {
    // the kernel emits RAW digest bytes (r16); the HOF spec's hex strings
    // are compared through unhex — the bijection the narrowing relies on
    Seq(2, 16).foreach { n =>
      val w = tokens(col("text"))
      val spec = docs.select(
        when(size(w) >= n,
          transform(sequence(lit(0), size(w) - n),
            k => unhex(md5(array_join(slice(w, k + 1, lit(n)), " ")))))
          .otherwise(typedlit(Seq.empty[Array[Byte]])))
        .as[Seq[Array[Byte]]].collect()
      val got = docs.select(
        call_function("graft_window_hashes", tokens(col("text")), lit(n)))
        .as[Seq[Array[Byte]]].collect()
      assert(got.length == spec.length, s"n=$n")
      got.zip(spec).zipWithIndex.foreach { case ((g, sp), i) =>
        assert(g.length == sp.length, s"n=$n doc=$i")
        g.zip(sp).foreach { case (gb, sb) =>
          assert(java.util.Arrays.equals(gb, sb), s"n=$n doc=$i")
        }
      }
    }
  }

  test("graft_bpe_pairs / graft_bpe_merge match the BpeLearner HOF specs") {
    val words = Seq("aaa", "banana", "ab", "a", "", "aabab", "xyxyxy")
      .toDF("w").select(split(col("w"), "").as("symbols"))
    val pairSpec = words.select(graft.functions.BpeLearner
      .pairsHof(col("symbols"))).as[Seq[(String, String)]].collect()
    val pairGot = words.select(call_function("graft_bpe_pairs", col("symbols")))
      .as[Seq[(String, String)]].collect()
    assert(pairGot.toSeq == pairSpec.toSeq)
    Seq(("a", "a"), ("a", "b"), ("b", "a"), ("x", "y")).foreach { case (l, r) =>
      val mSpec = words.select(graft.functions.BpeLearner
        .applyMergeHof(col("symbols"), l, r)).as[Seq[String]].collect()
      val mGot = words.select(
        call_function("graft_bpe_merge", col("symbols"), lit(l), lit(r)))
        .as[Seq[String]].collect()
      assert(mGot.toSeq == mSpec.toSeq, s"merge ($l,$r)")
    }
  }

  test("array-input kernels reject nullable-element arrays at analysis time") {
    // ADVICE r15: the kernels fold element bytes and would NPE on a null
    // element; the guard must fail ANALYSIS, not execution. split()/tokens()
    // declare containsNull=false, so real callers are unaffected.
    val nullable = Seq(Seq("a", "b")).toDF("symbols")
      .select(col("symbols").cast("array<string>").as("symbols")) // containsNull=true
    assert(nullable.schema("symbols").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    Seq(
      call_function("graft_bpe_pairs", col("symbols")),
      call_function("graft_bpe_merge", col("symbols"), lit("a"), lit("b")),
      call_function("graft_window_hashes", col("symbols"), lit(2))
    ).foreach { e =>
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        nullable.select(e).collect()
      }
      assert(err.getMessage.contains("non-nullable elements"), err.getMessage)
    }
    // and the non-nullable form still passes analysis + runs
    val ok = Seq("ab").toDF("w").select(split(col("w"), "").as("symbols"))
    assert(ok.select(call_function("graft_bpe_pairs", col("symbols")))
      .collect().length == 1)
  }

  test("graft_chunk_hashes matches per-chunk md5(substring) HOF incl. remainder") {
    val payloads = Seq(0L, 1L, 42L, 97L).toDF("id")
      .select(col("id"), graft.multimodal.MediaPipeline
        .syntheticPayload(col("id"), (col("id") % 5 + 1).cast("int") * 3).as("p"))
      .union(Seq(5L).toDF("id").select(col("id"), lit(Array.empty[Byte]).as("p")))
    val nb = length(col("p")).cast("long")
    // kernel emits raw digest bytes (r16) — hex() the binary h back up to
    // compare against the md5-hex HOF spec (hex() uppercases; lower())
    val spec = payloads.select(
      when(nb === 0,
          typedlit(Seq.empty[(String, Long)]).cast("array<struct<h:string,sz:bigint>>"))
        .otherwise(transform(
          sequence(lit(0L), floor((nb + 63L) / 64L).cast("long") - 1L),
          ci => struct(
            md5(substring(col("p"), (ci * 64 + 1).cast("int"), lit(64))).as("h"),
            least(lit(64L), nb - ci * 64L).as("sz")))
          .cast("array<struct<h:string,sz:bigint>>")))
      .as[Seq[(String, Long)]].collect()
    val got = payloads.select(
      transform(call_function("graft_chunk_hashes", col("p")),
        c => struct(lower(hex(c.getField("h"))).as("h"), c.getField("sz").as("sz"))))
      .as[Seq[(String, Long)]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_vocab_hits matches size(filter(tokens, isin(vocab)))") {
    val stop = Seq("the", "a", "of", "and", "in", "to", "is", "dup")
    val spec = docs.select(
      size(filter(tokens(col("text")), x => x.isin(stop.map(lit(_)): _*)))
        .cast("long")).as[Long].collect()
    val got = docs.select(
      call_function("graft_vocab_hits", col("text"), typedlit(stop)))
      .as[Long].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_synth_payload matches the unhex(concat_ws(md5...)) HOF spec") {
    // nb >= 1 only: the HOF's sequence(0, nb-1) goes DESCENDING for
    // nb=0 (garbage blocks), while the kernel returns empty — queries
    // always pass nb >= 8 (blocksOf), so the sane kernel contract wins
    val ids = Seq((0L, 1), (1L, 8), (42L, 31), (97L, 256)).toDF("id", "nb")
    val spec = ids.select(graft.multimodal.MediaPipeline
        .syntheticPayloadHof(col("id"), col("nb"))).as[Array[Byte]].collect()
    val got = ids.select(graft.multimodal.MediaPipeline
        .syntheticPayload(col("id"), col("nb"))).as[Array[Byte]].collect()
    spec.zip(got).zipWithIndex.foreach { case ((w, g), i) =>
      assert(java.util.Arrays.equals(w, g), s"row $i")
    }
  }

  test("graft_shingle_strings with explicit n matches shingles(tokens, n)") {
    Seq(2, 8).foreach { n =>
      val spec = docs.select(shingles(tokens(col("text")), n))
        .as[Seq[String]].collect()
      val got = docs.select(call_function("graft_shingle_strings", col("text"), lit(n)))
        .as[Seq[String]].collect()
      assert(got.toSeq == spec.toSeq, s"n=$n")
    }
  }

  test("graft_token_counts matches the HOF tokenCounts spec as a sorted set") {
    // entry order differs by design (first-occurrence vs sorted) — sort
    // both; consumers explode + re-aggregate so order never reaches a query
    val spec = docs
      .select(array_sort(graft.functions.TextFunctions.tokenCounts(tokens(col("text")))).as("tc"))
      .selectExpr("cast(tc as array<struct<tok:string,m:bigint>>)")
      .as[Seq[(String, Long)]].collect()
    val got = docs
      .select(array_sort(call_function("graft_token_counts", col("text"))))
      .as[Seq[(String, Long)]].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("graft_bucket_counts matches the md5-conv column-form spec") {
    // spec: bucket = conv(substring(md5(tok),1,4),16,10) % n over token
    // occurrences — the same expression qc1's DuckDB oracle replays with
    // instr digit folding
    for (n <- Seq(8, 64)) {
      val spec = docs
        .select(transform(sequence(lit(0L), lit(n - 1L)), i =>
          aggregate(
            filter(tokens(col("text")), tk =>
              pmod(conv(substring(md5(tk), 1, 4), 16, 10).cast("long"),
                lit(n.toLong)) === i),
            lit(0L), (a, _) => a + 1L)).as("v"))
        .as[Seq[Long]].collect()
      val got = docs
        .select(call_function("graft_bucket_counts", col("text"), lit(n)))
        .as[Seq[Long]].collect()
      assert(got.toSeq == spec.toSeq, s"n=$n")
    }
  }

  test("graft_content_fingerprint matches the HOF contentFingerprint spec") {
    val mixed = docs.union(Seq("MiXeD CaSe  WORDS and\tÜmläuts ÉÉ").toDF("text"))
    val spec = mixed.select(graft.functions.TextFunctions.contentFingerprint(col("text")))
      .as[String].collect()
    val got = mixed.select(call_function("graft_content_fingerprint", col("text")))
      .as[String].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("randomized parity: 200 generated texts agree native-vs-HOF on all kernels") {
    // deterministic random texts: mixed vocab, repeats, odd whitespace runs
    // (tabs/newlines/multi-space), mixed case, unicode, tiny docs
    val rnd = new scala.util.Random(777)
    val vocab = Vector("the", "Fox", "jumps", "dup", "a", "Ümläut", "x9", "-")
    val seps = Vector(" ", "  ", "\t", "\n", " \t ")
    val texts = Seq.fill(200) {
      val n = rnd.nextInt(8)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    }.toDF("text").localCheckpoint(false)

    val simSpec = texts
      .withColumn("hs", transform(tokens(col("text")), tk => h60(tk)))
      .selectExpr(simhashSql("hs") + " AS want").as[Long].collect().toSeq
    val simGot = texts.select(call_function("graft_simhash60", col("text")))
      .as[Long].collect().toSeq
    assert(simGot == simSpec)

    val shSpec = texts.select(array_sort(hashedShingleSet(col("text"))))
      .as[Seq[Long]].collect().toSeq
    val shGot = texts.select(array_sort(call_function("graft_shingle_hashes", col("text"))))
      .as[Seq[Long]].collect().toSeq
    assert(shGot == shSpec)

    val sgSpec = texts.select(shingles(tokens(col("text")), 3)).as[Seq[String]].collect().toSeq
    val sgGot = texts.select(call_function("graft_shingle_strings", col("text")))
      .as[Seq[String]].collect().toSeq
    assert(sgGot == sgSpec)

    val tcSpec = texts
      .select(array_sort(graft.functions.TextFunctions.tokenCounts(tokens(col("text")))).as("tc"))
      .selectExpr("cast(tc as array<struct<tok:string,m:bigint>>)")
      .as[Seq[(String, Long)]].collect().toSeq
    val tcGot = texts.select(array_sort(call_function("graft_token_counts", col("text"))))
      .as[Seq[(String, Long)]].collect().toSeq
    assert(tcGot == tcSpec)

    val rsSpec = texts
      .select(graft.functions.TextFunctions.repStats(tokens(col("text"))).as("r"))
      .select(col("r.n_bigrams"), col("r.n_distinct_bigrams"), col("r.top_bigram_m"))
      .as[(Long, Long, Long)].collect().toSeq
    val rsGot = texts.select(call_function("graft_rep_stats", col("text")).as("r"))
      .select(col("r.n_bigrams"), col("r.n_distinct_bigrams"), col("r.top_bigram_m"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rsGot == rsSpec)

    val tsSpec = texts
      .select(graft.functions.TextFunctions.tokStats(tokens(col("text"))).as("r"))
      .select(col("r.n_tokens"), col("r.n_distinct_tokens"))
      .as[(Long, Long)].collect().toSeq
    val tsGot = texts.select(call_function("graft_tok_stats", col("text")).as("r"))
      .select(col("r.n_tokens"), col("r.n_distinct_tokens"))
      .as[(Long, Long)].collect().toSeq
    assert(tsGot == tsSpec)
  }

  test("graft_rep_stats matches the HOF repStats spec plus hand-checked values") {
    val spec = docs.select(graft.functions.TextFunctions.repStats(tokens(col("text"))).as("r"))
      .select(col("r.n_bigrams"), col("r.n_distinct_bigrams"), col("r.top_bigram_m"))
      .as[(Long, Long, Long)].collect().toSeq
    val got = docs.select(call_function("graft_rep_stats", col("text")).as("r"))
      .select(col("r.n_bigrams"), col("r.n_distinct_bigrams"), col("r.top_bigram_m"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == spec)
    val m = docs.select(col("text"), call_function("graft_rep_stats", col("text")).as("r"))
      .select(col("text"), col("r.n_bigrams"), col("r.n_distinct_bigrams"), col("r.top_bigram_m"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("dup dup dup dup") == ((3L, 1L, 3L)))       // "dup dup" x3
    assert(m("a b c a b c a b c") == ((8L, 3L, 3L)))     // "a b"x3 "b c"x3 "c a"x2
    assert(m("") == ((0L, 0L, 0L)))
    assert(m("single") == ((0L, 0L, 0L)))                // < 2 tokens
  }

  test("graft_lang_id matches the HOF detectedLang spec incl. marker overlap ties") {
    // "de" is both a Spanish and a pinyin marker; "la" Spanish and French —
    // overlap + tie cases must break to the earliest language in the table
    val tricky = docs.union(Seq(
      "de de la la",            // es 4 hits? es: de,la -> 4; fr: la -> 2; zh: de -> 2
      "le le de de",            // fr 2, es 2, zh 4 -> zh
      "der die das und ist",    // de sweep
      "el y que",               // es
      "nothing matches here at all").toDF("text"))
    val spec = tricky.select(graft.functions.TextFunctions.detectedLangHof(col("text")))
      .as[String].collect()
    val got = tricky.select(call_function("graft_lang_id", col("text")))
      .as[String].collect()
    assert(got.toSeq == spec.toSeq)
  }

  test("randomized parity: lang-id agrees native-vs-HOF on 300 marker soups") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("the", "a", "of", "el", "la", "de", "que", "der", "die",
      "le", "les", "shi", "bu", "wo", "und", "est", "y", "is", "zz", "Qq")
    val texts = Seq.fill(300) {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toDF("text").localCheckpoint(false)
    val spec = texts.select(graft.functions.TextFunctions.detectedLangHof(col("text")))
      .as[String].collect().toSeq
    val got = texts.select(call_function("graft_lang_id", col("text")))
      .as[String].collect().toSeq
    assert(got == spec)
  }

  test("graft_multi_values matches the HOF split-trim-distinct-sort tree") {
    import graft.functions.GraftFunctions.MultiValueDelim
    def hofVals(c: org.apache.spark.sql.Column) =
      array_sort(array_distinct(
        filter(transform(split(coalesce(c, lit("")), MultiValueDelim), x => trim(x)),
          x => x =!= lit(""))))
    val cases = Seq(
      "1;URGENT", "URGENT;1", " a ; b;a;  ", ";;", "", "solo", "a;;b; ;c",
      "B;A;C;B", "Ü;é; Ü ", "x" + ";" * 5 + "y", "tab\there;no trim of\tme ",
      "5-LOW", "1-URGENT;1-URGENT").toDF("v")
    val got = cases.select(call_function("graft_multi_values", col("v")))
      .as[Seq[String]].collect().toSeq
    val spec = cases.select(hofVals(col("v"))).as[Seq[String]].collect().toSeq
    assert(got == spec)
    // randomized: delimiter runs, space runs, dup values, unicode
    val rnd = new scala.util.Random(4242)
    val toks = Vector("URGENT", "LOW", "a", "b", " c ", "Ü", "", " ", "x y")
    val rand = Seq.fill(300) {
      Seq.fill(rnd.nextInt(6))(toks(rnd.nextInt(toks.size)))
        .mkString(if (rnd.nextBoolean()) ";" else ";;")
    }.toDF("v").localCheckpoint(false)
    val g2 = rand.select(call_function("graft_multi_values", col("v")))
      .as[Seq[String]].collect().toSeq
    val s2 = rand.select(hofVals(col("v"))).as[Seq[String]].collect().toSeq
    assert(g2 == s2)
    // null in -> null out (the call site coalesces, but the kernel must
    // still be null-safe on its own)
    val nl = Seq[Option[String]](None).toDF("v")
      .select(call_function("graft_multi_values", col("v"))).collect()
    assert(nl(0).isNullAt(0))
  }

  test("null input yields null, not a crash") {
    val n = Seq[Option[String]](None, Some("a b c d")).toDF("text")
    val r = n.select(
      call_function("graft_simhash60", col("text")).as("s"),
      call_function("graft_shingle_hashes", col("text")).as("h")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(!r(1).isNullAt(0) && !r(1).isNullAt(1))
  }
}
