package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-5 rewrote three top-k/keeper selections from window/checkpoint
  * forms into map-side-combining aggregate (or two-phase) forms after the
  * decade-scale measurements (SCALE.md) showed the originals go
  * superlinear or pin parallelism. The rewrites must be invisible in the
  * RESULTS: each spec recomputes the original form inline as the semantic
  * reference and asserts set equality, and the plan specs machine-check
  * the scale property the rewrite exists for.
  */
class TopOneRewriteSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, sf)

  test("a4 struct-min aggregate == row_number window reference") {
    // the original form: rank every event per user by (priority, signed
    // ts, event_id), keep rank 1
    val e = Tables.t(spark, sf, "events")
    val prio = when(col("event_type") === "error", lit(0)).otherwise(lit(1))
    val tsOrd = when(prio === 0, unix_micros(col("ts")))
      .otherwise(-unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(prio, tsOrd, col("event_id"))
    val ref = e.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
    val got = run("a4_latest_per_group")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("a4 plans a partial-aggregating HashAggregate, not a window sort") {
    val p = run("a4_latest_per_group").queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"a4 still plans a window:\n$p")
    assert(p.contains("partial_min"), s"a4 lost the map-side combine:\n$p")
  }

  test("t8 two-phase salted rank == single-window reference") {
    import graft.functions.TextFunctions.{permille, tokens}
    val toks = tokens(col("text"))
    val scored = Tables.t(spark, sf, "documents").select(
      col("doc_id"), col("source"),
      permille(size(array_distinct(toks)), size(toks)).as("diversity_permille"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("diversity_permille").desc, col("doc_id"))
    val ref = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
    val got = run("t8_quality_topk")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("t8 phase-1 shards cannot starve a source of answers") {
    // every source with >= 5 docs must still emit exactly 5 rows with
    // contiguous ranks 1..5 (a wrong phase-1 cut would surface here as a
    // short or gapped rank list)
    val counts = Tables.t(spark, sf, "documents")
      .groupBy(col("source")).count()
    val got = run("t8_quality_topk")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("max_rank"),
        sum(col("rank")).as("rank_sum"))
      .join(counts, Seq("source"))
    val bad = got.filter(
      (col("count") >= 5 && (col("n") =!= 5 || col("max_rank") =!= 5 || col("rank_sum") =!= 15)) ||
      (col("count") < 5 && (col("n") =!= col("count") ||
        col("rank_sum") =!= col("n") * (col("n") + 1) / 2)))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("tp1 struct-min keeper == groupBy + semi-join reference") {
    import graft.functions.TextFunctions.tokens
    val d = Tables.t(spark, sf, "documents")
      .withColumn("n_toks", size(tokens(col("text"))))
      .withColumn("det", graft.queries.TextOps.detectedLang(col("text")))
      .filter(col("det") === col("lang") && col("n_toks") >= 25)
      .withColumn("fp", call_function("graft_content_fingerprint", col("text")))
    val keepers = d.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val ref = d.join(keepers, Seq("fp", "doc_id"), "left_semi")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("sum_tokens"))
    val got = run("tp1_corpus_filter")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("sim1 two-phase rank == single-window reference") {
    // the shared topkPerQuery helper backs all four ANN paths; sim1's
    // brute-force scoring recomputed inline with the original one-window
    // rank is the semantic reference
    import graft.functions.VectorFunctions._
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val scored = e.filter(col("vec_id") >= 10).crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        (dotQN(col("qq"), col("q")).cast("double") /
          (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val ref = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    val got = run("sim1_brute_topk")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("tp1 plans no text column past the scan-side project") {
    // the rewrite's point at scale: only (fp, doc_id, source, n_toks)
    // reach the shuffle — the exchange input must not carry `text`
    val p = run("tp1_corpus_filter").queryExecution.executedPlan.toString
    val exchangeOn = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchangeOn.contains("text"), s"text crosses a shuffle:\n$exchangeOn")
    assert(!p.contains("Checkpoint"), s"tp1 still checkpoints:\n$p")
  }
}
