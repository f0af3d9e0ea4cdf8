package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.permille
import Tables.t

/** Scratch A/B probe for t7's plan shapes at decade scale.
  *   sbt "Test/runMain graft.queries.T7Probe <sfDir> [reps]"
  * Times each variant reps times (after one untimed warm pass of the
  * first variant to absorb JVM/codegen spin-up) and prints seconds.
  * Correctness of the candidate shapes vs the registry plan is asserted
  * by sum-equality of the output columns (exact longs).
  */
object T7Probe {

  private def pairs(s: SparkSession, dir: String, repart: Boolean): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val src = if (repart) base.repartition(col("doc_id")) else base
    src.select(col("doc_id"),
        explode(call_function("graft_token_counts", col("text"))).as("p"))
      .select(col("doc_id"), col("p.tok").as("tok"), col("p.m").as("m"))
  }

  private def rankFromSorted(sorted: DataFrame): DataFrame = {
    val offsets = sorted.groupBy(col("pid"))
      .agg(count(lit(1)).as("pn"))
      .select(col("pid"),
        (sum(col("pn")).over(Window.orderBy(col("pid"))) - col("pn")).as("off"))
    sorted.join(broadcast(offsets), Seq("pid"))
      .select(col("tok"), (col("off") + col("local") + 1L).as("rank"))
  }

  private def sortVocab(vocab: DataFrame): DataFrame =
    vocab.orderBy(col("n").desc, col("tok"))
      .select(col("tok"), monotonically_increasing_id().as("mid"))
      .select(col("tok"),
        shiftright(col("mid"), 33).as("pid"),
        col("mid").bitwiseAND(lit((1L << 33) - 1)).as("local"))
      .localCheckpoint(false)

  private def score(docTok: DataFrame, ranked: DataFrame): DataFrame =
    docTok.join(ranked, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("m")).as("n_tokens"),
        permille(sum(col("rank") * col("m")), sum(col("m"))).as("mean_rank_permille"))

  /** Current registry shape: two tokenize passes, each text-repartitioned. */
  private def current(s: SparkSession, dir: String): DataFrame = {
    def docTok = pairs(s, dir, repart = true)
    val sorted = sortVocab(docTok.groupBy(col("tok")).agg(sum(col("m")).as("n")))
    score(pairs(s, dir, repart = true), rankFromSorted(sorted))
  }

  /** Two passes, NO text repartition (tokenize parallelism = input splits). */
  private def noRepart(s: SparkSession, dir: String): DataFrame = {
    val sorted = sortVocab(
      pairs(s, dir, repart = false).groupBy(col("tok")).agg(sum(col("m")).as("n")))
    score(pairs(s, dir, repart = false), rankFromSorted(sorted))
  }

  /** ONE tokenize pass: pairs repartitioned on tok once, both consumers
    * hang off that single exchange (the pre-r7 shape, ReuseExchange).
    */
  private def tokExchange(s: SparkSession, dir: String): DataFrame = {
    val docTok = pairs(s, dir, repart = true).repartition(col("tok"))
    val sorted = sortVocab(docTok.groupBy(col("tok")).agg(sum(col("m")).as("n")))
    score(docTok, rankFromSorted(sorted))
  }

  /** ONE tokenize pass, pairs persisted (memory-and-disk, serialized)
    * instead of re-derived or pre-shuffled.
    */
  private def persistPairs(s: SparkSession, dir: String): DataFrame = {
    val docTok = pairs(s, dir, repart = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val sorted = sortVocab(docTok.groupBy(col("tok")).agg(sum(col("m")).as("n")))
    score(docTok, rankFromSorted(sorted))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val s = graft.GraftSession.local("t7probe")
    s.sparkContext.setLogLevel("ERROR")
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "current" -> current,
      "noRepart" -> noRepart,
      "tokExchange" -> tokExchange,
      "persistPairs" -> persistPairs)

    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(sum(col("doc_id")), sum(col("n_tokens")),
        sum(col("mean_rank_permille"))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    // warm pass + reference checksum
    val ref = checksum(current(s, dir))
    println(s"[t7probe] reference checksum: $ref")
    variants.foreach { case (name, fn) =>
      val sums = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c = checksum(fn(s, dir))
        val dt = (System.nanoTime() - t0) / 1e9
        require(c == ref, s"$name checksum mismatch: $c vs $ref")
        s.sharedState.cacheManager.clearCache()
        System.gc()
        dt
      }
      println(f"[t7probe] $name%-14s ${sums.min}%.2f s (min of $reps)")
    }
    s.stop()
  }
}
