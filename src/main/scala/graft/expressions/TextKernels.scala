package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native text expressions ([[Simhash60]],
  * [[ShingleHashes]], [[ShingleStrings]]).
  *
  * These compute EXACTLY the same values as the higher-order-function
  * formulations in `graft.functions` (which remain the executable spec and
  * the DuckDB oracle's definition) — the only difference is that a single
  * JIT-compiled loop replaces per-element interpreted Catalyst lambdas,
  * which is where the dedup/text pipelines spent most of their time.
  *
  * Portability contract (shared with the oracle): tokenization is
  * `split('\s+')` with empties dropped; the per-token hash is the first 15
  * hex chars of md5 as a 60-bit long (`HashFunctions.h60`); shingle hashes
  * mix 3 consecutive token hashes as
  * `((h1%M)*4093 + (h2%M)*8191 + h3%M) % M`, M = 2^40.
  */
object TextKernels {

  private val Mod: Long = 1L << 40

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 (== parsing the first 15 hex chars), nonneg. */
  private def h60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  private def tokenBytes(text: UTF8String): Array[Array[Byte]] = {
    val toks = text.toString.split("\\s+")
    val out = new Array[Array[Byte]](toks.length)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        out(n) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        n += 1
      }
      i += 1
    }
    if (n == toks.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** 60-bit SimHash over the token stream (multiplicity kept): bit b set
    * when the ±1 vote across token-hash bits b is positive.
    */
  def simhash60(text: UTF8String): Long = {
    val toks = tokenBytes(text)
    val counts = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = h60(toks(i))
      var b = 0
      while (b < 60) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Distinct hashed word-3-gram set, first-occurrence order; fewer than 3
    * tokens → empty. Mirrors `TextFunctions.hashedShingleSet`.
    */
  def shingleHashes(text: UTF8String): ArrayData = {
    val toks = tokenBytes(text)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { hs(i) = h60(toks(i)) % Mod; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long](toks.length * 2)
    i = 0
    while (i < toks.length - 2) {
      seen.add((hs(i) * 4093L + hs(i + 1) * 8191L + hs(i + 2)) % Mod)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Order-insensitive-normalized content fingerprint: md5 hex of the
    * lowercased, whitespace-normalized token join. Mirrors
    * `TextFunctions.contentFingerprint` — lowercasing via
    * `UTF8String.toLowerCase`, the same call Spark's `lower()` makes.
    */
  def contentFingerprint(text: UTF8String): UTF8String = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val sb = new java.lang.StringBuilder(text.numBytes)
    var i = 0
    var first = true
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    val md = digests.get()
    md.reset()
    val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Byte](32)
    val alphabet = "0123456789abcdef"
    var j = 0
    while (j < 16) {
      hex(2 * j) = alphabet.charAt((d(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = alphabet.charAt(d(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  // marker token → indexes of the languages listing it (markers overlap:
  // "de" is a Spanish AND a Chinese-pinyin marker), built once from the
  // single table in TextFunctions
  private lazy val markerLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    graft.functions.TextFunctions.LangMarkers.zipWithIndex.foreach {
      case ((_, markers), i) =>
        markers.foreach { t =>
          val prev = m.getOrDefault(t, Array.empty[Int])
          m.put(t, prev :+ i)
        }
    }
    m
  }
  private lazy val langCodes: Array[UTF8String] =
    graft.functions.TextFunctions.LangMarkers
      .map { case (c, _) => UTF8String.fromString(c) }.toArray

  /** Marker-argmax language id in ONE pass over the lowercased token
    * stream (mirrors `TextFunctions.detectedLangHof`, which walks the
    * token array once per language through interpreted filter lambdas):
    * winner = max marker hits, ties to the earliest language in the table.
    */
  def langId(text: UTF8String): UTF8String = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val counts = new Array[Int](langCodes.length)
    var i = 0
    while (i < toks.length) {
      val langs = markerLangs.get(toks(i))
      if (langs != null) {
        var j = 0
        while (j < langs.length) { counts(langs(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    var b = 1
    while (b < counts.length) {
      if (counts(b) > counts(best)) best = b
      b += 1
    }
    langCodes(best)
  }

  /** Per-document token multiplicities: one `(tok, m)` struct per DISTINCT
    * token, first-occurrence order. Mirrors `TextFunctions.tokenCounts`
    * (sorted-run-length over HOFs) up to entry order — consumers explode
    * and re-aggregate, so order is immaterial; the parity spec compares
    * sorted. Fusing tokenize+count into one JIT'd pass matters twice: the
    * HOF form pays an interpreted `array_sort` + three lambda walks per
    * row, and the pre-`tokenCounts` form shipped every token INSTANCE into
    * a corpus-wide `(doc, tok)` hash aggregate (at sf10 that aggregate
    * alone cost more than the rest of t7).
    */
  def tokenCounts(text: UTF8String): ArrayData = {
    val toks = text.toString.split("\\s+")
    val counts = new java.util.LinkedHashMap[String, Array[Long]](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val slot = counts.get(toks(i))
        if (slot == null) counts.put(toks(i), Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-token md5-prefix hash-bucket occurrence counts (qc1's feature
    * vector): bucket = the digest's first 2 bytes as an int (== the
    * first 4 hex chars) mod `n`, identical to the column-form spec
    * `conv(substring(md5(tok),1,4),16,10) % n`, which stays the DuckDB
    * oracle's definition. One kernel pass replaces a 64-way interpreted
    * filter/aggregate scan whose CollapseProject'd md5 ran once PER
    * BUCKET per token (the 91 s sf1 reading that motivated this).
    */
  def bucketCounts(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenBytes(text)
    val counts = new Array[Long](n)
    val md = digests.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i))
      counts((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % n) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Per-document bigram repetition stats in ONE split+hash pass:
    * `struct<n_bigrams, n_distinct_bigrams, top_bigram_m>` (all long).
    * Mirrors `TextFunctions.repStats` (shingles(2) + tokenCounts over
    * them); fewer than 2 tokens → (0, 0, 0). The per-row hash map is
    * bounded by the document's own bigram count — nothing corpus-sized.
    */
  def repStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    val n = if (toks.length < 2) 0 else toks.length - 1
    val counts = new java.util.HashMap[String, Array[Long]](n * 2)
    var top = 0L
    var i = 0
    while (i < n) {
      val key = toks(i) + " " + toks(i + 1)
      val slot = counts.get(key)
      val c = if (slot == null) { counts.put(key, Array(1L)); 1L }
              else { slot(0) += 1L; slot(0) }
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, counts.size.toLong, top))
  }

  /** Per-document token stats in ONE split+hash pass:
    * `struct<n_tokens, n_distinct_tokens>` (both long). Mirrors
    * `TextFunctions.tokStats` (size + array_distinct over the token
    * array) without materializing the array; the per-row set is bounded
    * by the document's own token count.
    */
  def tokStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split("\\s+")
    val seen = new java.util.HashSet[String](toks.length * 2)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) { n += 1L; seen.add(toks(i)) }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, seen.size.toLong))
  }

  /** Word-n-gram strings with multiplicity (space-joined), document order;
    * fewer than n tokens → empty. Mirrors `TextFunctions.shingles` for any
    * n (3 for the MinHash family, 8 for span-level dedup).
    */
  def shingleStrings(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(n * 8)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of ASCII letters in the text — the alpha-ratio numerator of
    * the quality scores (t2/t12). Mirrors
    * `length(regexp_replace(text, "[^A-Za-z]", ""))`, which materializes
    * a stripped copy of every document through the regex engine just to
    * take its length. Byte-walk is exact for ANY input: UTF-8
    * continuation/lead bytes are ≥ 0x80, so ASCII letter bytes are
    * always standalone letter characters.
    */
  def alphaCount(text: UTF8String): Long = {
    val n = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var i = 0
    var c = 0L
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) c += 1L
      i += 1
    }
    c
  }

  /** Count of token INSTANCES present in a literal vocabulary (t12/t2's
    * stopword-count signal). Mirrors
    * `size(filter(tokens(text), x.isin(vocab)))` — the HOF form walks the
    * materialized token array through an interpreted per-element isin
    * lambda; this is one split+set-probe pass. Matching is exact string
    * equality, like `isin` on strings.
    */
  def vocabHits(text: UTF8String, vocab: java.util.HashSet[String]): Long = {
    val toks = text.toString.split("\\s+")
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty && vocab.contains(toks(i))) n += 1L
      i += 1
    }
    n
  }

  /** Deterministic synthetic binary payload (MediaPipeline): `nBlocks`
    * 16-byte blocks, block i = md5 digest of `id + ":" + i` — the raw
    * digest IS unhex(md5hex), so the kernel skips the hex round-trip the
    * HOF spec (`unhex(concat_ws("", transform(sequence, i ->
    * md5(concat(id, ':', i)))))`) pays, along with its interpreted
    * per-block lambda. Parity asserted in NativeTextExpressionsSpec.
    */
  def synthPayload(id: Long, nBlocks: Int): Array[Byte] = {
    if (nBlocks <= 0) return Array.empty[Byte]
    val md = digests.get()
    val out = new Array[Byte](nBlocks * 16)
    val idStr = java.lang.Long.toString(id)
    var i = 0
    while (i < nBlocks) {
      md.reset()
      val d = md.digest((idStr + ":" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.arraycopy(d, 0, out, i * 16, 16)
      i += 1
    }
    out
  }

  /** Non-overlapping n-token "lines" (C4-style line segmentation, t11):
    * tokens grouped n at a time in document order, each joined by single
    * spaces; the last line keeps whatever remainder exists; zero tokens →
    * empty array. Mirrors `TextFunctions.lineGrams` (the guarded HOF
    * spec) — the HOF form paid an interpreted transform + slice +
    * array_join lambda walk per line, and t11 evaluates the segmentation
    * in TWO subtrees (corpus line counting and the per-doc probe side).
    */
  def lineGrams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length == 0) return new GenericArrayData(Array.empty[AnyRef])
    val nLines = (toks.length + n - 1) / n
    val out = new Array[AnyRef](nLines)
    var k = 0
    while (k < nLines) {
      val sb = new java.lang.StringBuilder(n * 8)
      var j = k * n
      val end = math.min(j + n, toks.length)
      while (j < end) {
        if (j > k * n) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** md5 hex of every sliding n-token window (stride 1) of a token
    * array, each window joined by single spaces — t19's span-dedup
    * window signature. Mirrors
    * `transform(sequence(0, len-n), k -> md5(array_join(slice(w, k+1, n), ' ')))`
    * (an interpreted slice+join+md5 lambda per window ≈ per token);
    * fewer than n tokens → empty. One reusable byte buffer per row.
    */
  def windowHashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val words = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      words(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    // r16 (guide §2.3, narrower types): emit the RAW 16-byte digest, not
    // its 32-char hex string. The signature is a join/group KEY that
    // never reaches any query output (t19 drops it after the rep join),
    // and digest bytes <-> hex is a bijection, so every downstream
    // count/join/set is value-identical while the |windows|-sized
    // count shuffle carries half the key bytes and the kernel skips a
    // 32-byte alloc + hex-encode loop per window (~ per token).
    val out = new Array[AnyRef](len - n + 1)
    var k = 0
    while (k < out.length) {
      md.reset()
      var j = k
      while (j < k + n) {
        if (j > k) md.update(' '.toByte)
        md.update(words(j))
        j += 1
      }
      out(k) = md.digest()
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent symbol pairs of a word's symbol array (BPE pair counting):
    * one `struct<l, r>` per neighboring pair, document order. Mirrors
    * `zip_with(slice(symbols,1,n-1), slice(symbols,2,n-1), struct)` —
    * an interpreted two-slice lambda walk per word per merge round.
    */
  def bpePairs(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - 1)
    var prev = toks.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = toks.getUTF8String(i)
      out(i - 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Left-to-right non-overlapping merge of adjacent (left, right) into
    * the fused symbol (one BPE merge-rule application). Mirrors
    * `BpeLearner.applyMerge`'s aggregate HOF: append each symbol unless
    * it completes the pair with the output's tail, in which case the
    * tail is replaced by the fusion; a just-fused tail (left+right)
    * never re-matches `left`, so consuming two symbols and continuing
    * is the identical greedy scan (BpeLearnerSpec pins the semantics
    * against a driver-side reference loop).
    */
  def bpeMerge(toks: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = toks.numElements()
    val fused = UTF8String.concat(left, right)
    val out = new Array[AnyRef](n)
    var k = 0
    var i = 0
    while (i < n) {
      val cur = toks.getUTF8String(i)
      if (i + 1 < n && cur.equals(left) && toks.getUTF8String(i + 1).equals(right)) {
        out(k) = fused
        i += 2
      } else {
        out(k) = cur
        i += 1
      }
      k += 1
    }
    new GenericArrayData(
      if (k == n) out else java.util.Arrays.copyOf(out, k))
  }

  /** Fixed-64-byte chunk digests of a binary payload (mm5's storage-dedup
    * chunking): one `struct<h: md5-hex, sz: bytes>` per chunk, the last
    * chunk keeping the remainder. Mirrors the HOF form
    * `transform(sequence(0, ceil(nb/64)-1), ci -> struct(
    *    md5(substring(payload, ci*64+1, 64)), least(64, nb-ci*64)))`
    * — an interpreted substring+md5 lambda per chunk — in one JIT'd pass
    * with a reused digest. Empty payload → empty array.
    */
  def chunkHashes(payload: Array[Byte]): ArrayData = {
    val nb = payload.length
    if (nb == 0) return new GenericArrayData(Array.empty[AnyRef])
    val nChunks = (nb + 63) / 64
    val md = digests.get()
    // r16: raw digest bytes, not hex — the chunk id is a pure grouping
    // key (mm5 reduces to a one-row ledger), so the only data-sized
    // shuffle carries 16-byte keys instead of 32-char strings and the
    // per-chunk hex encode disappears. Bijective: dedup counts unchanged.
    val out = new Array[AnyRef](nChunks)
    var ci = 0
    while (ci < nChunks) {
      val off = ci * 64
      val sz = math.min(64, nb - off)
      md.reset()
      md.update(payload, off, sz)
      out(ci) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](md.digest(), sz.toLong))
      ci += 1
    }
    new GenericArrayData(out)
  }

  /** Greedy longest-prefix piece encoding of the token stream against a
    * vocabulary (wordpiece-style tokenizer APPLY step). `vocab` must be
    * pre-sorted longest-first with lexicographic tie-break — the first
    * entry that prefixes the remaining word is by construction the
    * greedy choice (the same selection the oracle's
    * `ORDER BY len(v) DESC, v LIMIT 1` makes). A position no vocab entry
    * covers consumes one character as an unknown piece. Returns
    * `[n_pieces, covered_chars, word_chars]`: pieces emitted, characters
    * consumed by vocab pieces, total non-whitespace characters.
    * Positions are UTF-16 units (== codepoints == DuckDB's reading on
    * the ASCII synthetic corpus; the shared-kernel contract above).
    */
  def greedyPieceStats(text: UTF8String, vocab: Array[String]): ArrayData = {
    val toks = text.toString.split("\\s+")
    var pieces = 0L
    var covered = 0L
    var wchars = 0L
    var ti = 0
    while (ti < toks.length) {
      val w = toks(ti)
      if (w.nonEmpty) {
        wchars += w.length
        var i = 0
        while (i < w.length) {
          var matched: String = null
          var k = 0
          while (matched == null && k < vocab.length) {
            val v = vocab(k)
            if (v.length <= w.length - i && w.startsWith(v, i)) matched = v
            k += 1
          }
          if (matched != null) { covered += matched.length; i += matched.length }
          else i += 1
          pieces += 1L
        }
      }
      ti += 1
    }
    new GenericArrayData(Array(pieces, covered, wchars))
  }

  /** `;`-delimited multi-value canonicalization: split, trim spaces, drop
    * empties, distinct, sort. One tight loop replacing the interpreted
    * 6-deep HOF tree (split → transform(trim) → filter → array_distinct →
    * array_sort) that P9's sub-source explode — and Catalyst's inferred
    * `size(...) > 0` Generate filter — evaluated per row THREE times, each
    * outside whole-stage codegen. Parity notes: trim removes 0x20 only
    * (Spark's `trim`, NOT Java's `String.trim` which eats all control
    * chars); sort order is UTF8String byte comparison (what `array_sort`
    * uses for strings, NOT UTF-16 `String` order — they differ above the
    * BMP). `MultiValuesKernelSpec`-style parity is asserted in
    * NativeTextExpressionsSpec against the HOF formulation.
    */
  def multiValues(s: UTF8String): ArrayData = {
    val str = s.toString
    val set = new java.util.TreeSet[UTF8String]()
    val n = str.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ';') {
        var a = start
        var b = i
        while (a < b && str.charAt(a) == ' ') a += 1
        while (b > a && str.charAt(b - 1) == ' ') b -= 1
        if (b > a) set.add(UTF8String.fromString(str.substring(a, b)))
        start = i + 1
      }
      i += 1
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
