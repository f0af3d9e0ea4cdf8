package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the native text expressions with the session's function
  * registry (the idiomatic `SparkSessionExtensions` path — usable from
  * SQL text and via `functions.call_function`). Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)`; cluster
  * deployments would set `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  /** Plan-time integer parameter (band counts, dims, …): must be a foldable
    * literal — the value is baked into the generated code.
    */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: parameter must be a literal integer, got $e")
    e.eval(null) match {
      case n: Number => n.intValue()
      case v => throw new IllegalArgumentException(s"$fn: expected integer literal, got $v")
    }
  }

  /** Plan-time string parameter: foldable literal evaluated once. */
  private def stringArg(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn: parameter must be a literal string, got $e")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case v => throw new IllegalArgumentException(s"$fn: expected string literal, got $v")
    }
  }

  /** Plan-time string-array parameter (vocabularies): foldable literal
    * evaluated once at build, baked into the expression.
    */
  private def stringArrayArg(e: Expression, fn: String): Array[String] = {
    require(e.foldable, s"$fn: vocab must be a literal array of strings, got $e")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
      case v => throw new IllegalArgumentException(s"$fn: expected array literal, got $v")
    }
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash60" -> (es => Simhash60(es.head)),
    "graft_shingle_hashes" -> (es => ShingleHashes(es.head)),
    "graft_shingle_strings" -> (es => ShingleStrings(es.head,
      if (es.length > 1) intArg(es(1), "graft_shingle_strings") else 3)),
    "graft_line_grams" -> (es => LineGrams(es(0), intArg(es(1), "graft_line_grams"))),
    "graft_vocab_hits" -> (es => VocabHits(es(0),
      stringArrayArg(es(1), "graft_vocab_hits"))),
    "graft_alpha_count" -> (es => AlphaCount(es.head)),
    "graft_window_hashes" -> (es => WindowHashes(es(0),
      intArg(es(1), "graft_window_hashes"))),
    "graft_chunk_hashes" -> (es => ChunkHashes(es.head)),
    "graft_bpe_pairs" -> (es => BpePairs(es.head)),
    "graft_bpe_merge" -> (es => BpeMerge(es(0),
      stringArg(es(1), "graft_bpe_merge"), stringArg(es(2), "graft_bpe_merge"))),
    "graft_synth_payload" -> (es => SynthPayload(es(0), es(1))),
    "graft_content_fingerprint" -> (es => ContentFingerprint(es.head)),
    "graft_multi_values" -> (es => MultiValues(es.head)),
    "graft_token_counts" -> (es => TokenCounts(es.head)),
    "graft_bucket_counts" -> (es => BucketCounts(es(0),
      intArg(es(1), "graft_bucket_counts"))),
    "graft_tok_stats" -> (es => TokStats(es.head)),
    "graft_rep_stats" -> (es => RepStats(es.head)),
    "graft_lang_id" -> (es => LangId(es.head)),
    "graft_quantize_milli" -> (es => QuantizeMilli(es.head)),
    "graft_dot_milli" -> (es => DotMilli(es(0), es(1))),
    "graft_minhash_bands" -> (es => MinhashBands(es(0),
      intArg(es(1), "graft_minhash_bands"),
      intArg(es(2), "graft_minhash_bands"),
      intArg(es(3), "graft_minhash_bands"))),
    "graft_bloom_might_contain" -> (es => BloomMightContainLong(es(0), es(1))),
    "graft_greedy_pieces" -> (es => GreedyPieceStats(es(0),
      stringArrayArg(es(1), "graft_greedy_pieces"))),
    "graft_lsh_bands" -> (es => LshBands(es(0),
      intArg(es(1), "graft_lsh_bands"),
      intArg(es(2), "graft_lsh_bands"),
      intArg(es(3), "graft_lsh_bands"))))
}
