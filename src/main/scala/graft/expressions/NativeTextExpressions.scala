package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/dedup hot paths.
  *
  * The higher-order-function formulations in `graft.functions` evaluate
  * their lambda bodies through the interpreted expression evaluator — once
  * per array element — which made md5-per-token/shingle the dominant cost
  * of the dedup family. These expressions generate a single static-call
  * into [[TextKernels]] inside whole-stage codegen: no virtual dispatch,
  * no per-element expression-tree walk, null handling inherited from
  * `UnaryExpression`. Each computes bit-identical results to its
  * column-expression spec (asserted by NativeTextExpressionsSpec and by
  * the DuckDB oracle, which independently recomputes the definition).
  */
trait NativeTextExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
  protected def kernelCall(c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, kernelCall)
}

object NativeTextExpression {
  /** Array-input kernels (BpePairs/BpeMerge/WindowHashes) fold element
    * bytes directly and declare containsNull=false outputs, so a null
    * ELEMENT would NPE mid-kernel where the HOF specs they replace would
    * have propagated the null (ADVICE r15). Today's producers (`split`,
    * `tokens()`, the kernels themselves) all declare containsNull=false;
    * reject nullable-element arrays at analysis time so a future call
    * site fails with a type error instead of a runtime NPE.
    */
  def requireNonNullStringArray(t: DataType, name: String): TypeCheckResult =
    t match {
      case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<STRING> with non-nullable elements " +
          "(the kernel folds element bytes; a null element would NPE) — " +
          "filter or coalesce null elements before calling")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<STRING>, got ${other.sql}")
    }
}

/** 60-bit SimHash of a document (see `DedupFunctions.simhashSql`). */
case class Simhash60(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = LongType
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.simhash60($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash60(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash60"
}

/** Distinct hashed 3-gram shingle set (see `TextFunctions.hashedShingleSet`). */
case class ShingleHashes(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.shingleHashes($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** Normalized-content md5 fingerprint (see `TextFunctions.contentFingerprint`). */
case class ContentFingerprint(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = StringType
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.contentFingerprint($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.contentFingerprint(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ContentFingerprint =
    copy(child = newChild)
  override def prettyName: String = "graft_content_fingerprint"
}

/** Marker-argmax language id (see `TextFunctions.detectedLangHof`). */
case class LangId(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = StringType
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.langId($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "graft_lang_id"
}

/** Per-document distinct-token multiplicities `array<struct<tok,m>>` (see
  * `TextFunctions.tokenCounts`; entry order is first-occurrence here vs
  * sorted there — consumers explode + re-aggregate, parity spec sorts).
  */
case class TokenCounts(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("m", LongType, nullable = false))),
    containsNull = false)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.tokenCounts($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenCounts(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
  override def prettyName: String = "graft_token_counts"
}

/** Per-document token stats `struct<n_tokens, n_distinct_tokens>` in one
  * split+hash pass (see `TextFunctions.tokStats` — the shared input of
  * the diversity-permille quality score t8/tp3 rank on, without
  * materializing a token array or evaluating split() once per signal).
  */
case class TokStats(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false)))
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.tokStats($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokStats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokStats =
    copy(child = newChild)
  override def prettyName: String = "graft_tok_stats"
}

/** Per-document bigram repetition stats
  * `struct<n_bigrams, n_distinct_bigrams, top_bigram_m>` (see
  * `TextFunctions.repStats` — the Gopher-style repetition-filter
  * signals, computed in one pass instead of a shingle array + two
  * interpreted HOF reductions).
  */
case class RepStats(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_bigram_m", LongType, nullable = false)))
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.repStats($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repStats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
  override def prettyName: String = "graft_rep_stats"
}

/** Greedy longest-prefix piece encoding stats against a plan-time
  * vocabulary (`array<long>`: [n_pieces, covered_chars, word_chars]) —
  * the tokenizer APPLY step. The vocab arrives as a foldable literal
  * (collected + broadcast-in-plan, like MinhashBands' band counts), is
  * sorted longest-first/lex at construction so the kernel's first
  * prefix hit IS the greedy choice, and rides into generated code as a
  * reference object — one static call per row, no per-piece expression
  * evaluation.
  */
case class GreedyPieceStats(child: Expression, vocab: Array[String])
    extends NativeTextExpression {
  private lazy val sortedVocab: Array[String] =
    vocab.sortWith((a, b) => a.length > b.length || (a.length == b.length && a < b))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // kernelCall is unused: doGenCode needs the vocab reference object
  override protected def kernelCall(c: String): String =
    throw new IllegalStateException("GreedyPieceStats generates via doGenCode")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("greedyVocab", sortedVocab, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.greedyPieceStats($c, $vref)")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.greedyPieceStats(input.asInstanceOf[UTF8String], sortedVocab)
  override protected def withNewChildInternal(newChild: Expression): GreedyPieceStats =
    copy(child = newChild)
  override def prettyName: String = "graft_greedy_pieces"
}

/** Per-token md5-bucket occurrence counts, dense `array<long>` of length
  * `n` (see `TextKernels.bucketCounts`; `n` is a plan-time constant —
  * qc1's hashed-unigram feature dimension).
  */
case class BucketCounts(child: Expression, n: Int) extends NativeTextExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.bucketCounts($c, $n)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bucketCounts(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): BucketCounts =
    copy(child = newChild)
  override def prettyName: String = "graft_bucket_counts"
}

/** n-gram shingle strings with multiplicity (see `TextFunctions.shingles`);
  * n is a plan-time constant baked into the generated code (3 = MinHash
  * family default, 8 = span-level dedup).
  */
/** Canonical `;`-multi-value array: split, trim, drop empties, distinct,
  * byte-order sort (the P9 sub-source value set — see
  * `exec/SubSourceExploder` and `TextKernels.multiValues` for parity notes).
  */
case class MultiValues(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.multiValues($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.multiValues(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): MultiValues =
    copy(child = newChild)
  override def prettyName: String = "graft_multi_values"
}

/** ASCII-letter count (see `TextKernels.alphaCount`) — the alpha-ratio
  * numerator `length(regexp_replace(text, "[^A-Za-z]", ""))` without the
  * stripped-copy materialization.
  */
case class AlphaCount(child: Expression) extends NativeTextExpression {
  override def dataType: DataType = LongType
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.alphaCount($c)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.alphaCount(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): AlphaCount =
    copy(child = newChild)
  override def prettyName: String = "graft_alpha_count"
}

/** Count of token instances found in a plan-time vocabulary (see
  * `TextKernels.vocabHits`) — the stopword-count signal of the quality
  * scores (t2/t12). The vocab literal becomes a shared HashSet reference
  * object in the generated code: one static call per row, no per-token
  * isin expression walk.
  */
case class VocabHits(child: Expression, vocab: Array[String])
    extends NativeTextExpression {
  private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  override def dataType: DataType = LongType
  // kernelCall is unused: doGenCode needs the vocab reference object
  override protected def kernelCall(c: String): String =
    throw new IllegalStateException("VocabHits generates via doGenCode")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.vocabHits($c, $vref)")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.vocabHits(input.asInstanceOf[UTF8String], vocabSet)
  override protected def withNewChildInternal(newChild: Expression): VocabHits =
    copy(child = newChild)
  override def prettyName: String = "graft_vocab_hits"
}

/** Deterministic synthetic binary payload: nBlocks 16-byte md5 blocks
  * keyed on (id, block index) — see `TextKernels.synthPayload` and
  * `MediaPipeline.syntheticPayload` (whose HOF form is the spec).
  */
case class SynthPayload(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, INT), got ${l.sql}, ${r.sql}")
    }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override protected def nullSafeEval(id: Any, n: Any): Any =
    TextKernels.synthPayload(id.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextKernels.synthPayload($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SynthPayload =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_synth_payload"
}

/** Adjacent symbol pairs of a symbol array (see `TextKernels.bpePairs`)
  * — BPE pair counting.
  */
case class BpePairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    NativeTextExpression.requireNonNullStringArray(child.dataType, prettyName)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("l", StringType, nullable = false),
      StructField("r", StringType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpePairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.bpePairs($c)")
  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_pairs"
}

/** One BPE merge-rule application over a symbol array (see
  * `TextKernels.bpeMerge`); the (left, right) pair is a plan-time
  * constant — the round's learned merge.
  */
case class BpeMerge(child: Expression, l: String, r: String)
    extends UnaryExpression {
  private lazy val lU = org.apache.spark.unsafe.types.UTF8String.fromString(l)
  private lazy val rU = org.apache.spark.unsafe.types.UTF8String.fromString(r)
  override def checkInputDataTypes(): TypeCheckResult =
    NativeTextExpression.requireNonNullStringArray(child.dataType, prettyName)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeMerge(input.asInstanceOf[ArrayData], lU, rU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", lU,
      "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeRight", rU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.bpeMerge($c, $lRef, $rRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_merge"
}

/** Fixed-64-byte chunk digests of a BINARY payload (see
  * `TextKernels.chunkHashes`) — mm5's storage-dedup chunking.
  */
case class ChunkHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${t.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      // raw md5 digest (r16): chunk id is a pure grouping key — 16-byte
      // binary instead of the 32-char hex string (see chunkHashes)
      StructField("h", org.apache.spark.sql.types.BinaryType, nullable = false),
      StructField("sz", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.chunkHashes(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.chunkHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_chunk_hashes"
}

/** Sliding n-token window md5 signatures over a token ARRAY (see
  * `TextKernels.windowHashes`) — t19's span windows; n is a plan-time
  * constant.
  */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    NativeTextExpression.requireNonNullStringArray(child.dataType, prettyName)
  override def nullIntolerant: Boolean = true
  // raw md5 digests (r16): the signature is key-only downstream, so the
  // 16-byte binary form halves key bytes vs the 32-char hex string
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.BinaryType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.windowHashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.windowHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_window_hashes"
}

/** Non-overlapping n-token line segmentation (see
  * `TextFunctions.lineGrams`); n is a plan-time constant (8 = the C4-style
  * line-dedup granularity of t11).
  */
case class LineGrams(child: Expression, n: Int) extends NativeTextExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.lineGrams($c, $n)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.lineGrams(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): LineGrams =
    copy(child = newChild)
  override def prettyName: String = "graft_line_grams"
}

case class ShingleStrings(child: Expression, n: Int = 3) extends NativeTextExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.TextKernels.shingleStrings($c, $n)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleStrings(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_strings"
}
