package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exec.Scd2

/** Streaming SCD2 maintenance: a change-data feed keeps a versioned
  * dimension history continuously current — the streaming face of
  * `exec/Scd2`, via `foreachBatch` (the standard Structured Streaming
  * shape for sink-side merge logic the built-in sinks don't express).
  *
  * Each micro-batch applies `Scd2.merge`, so per-batch work is bounded by
  * the batch's key set (broadcast semi/anti joins against the history),
  * never the dimension's size. The updated history is staged to a side
  * directory and atomically swapped in, because a query must not overwrite
  * its own input mid-read.
  *
  * Exactly-once without sink transactions: after a crash between swap and
  * checkpoint commit, the batch REPLAYS against a history that already
  * contains it — and `Scd2.merge` is idempotent for re-applied changes
  * (a change equal to the key's version at its timestamp re-collapses as
  * a no-op; `Scd2StreamSpec` asserts replay-equality directly). A crash
  * INSIDE the swap (between the two moves) is repaired on the next read:
  * `readHistory` restores the newest stranded `__old_<batchId>` pre-image
  * when the history dir is absent and clears staging debris, so the
  * replayed batch merges against the real prior history rather than
  * silently rebuilding from itself. The
  * append-only event-time arrival the merge contract requires is exactly
  * what a CDC feed provides.
  */
object Scd2Stream {

  /** Current history frame (empty-schema-safe read). Before reading,
    * repair any half-finished swap a crash left behind: a failure
    * between the two `Files.move` calls leaves NO history dir and a
    * stranded `__old_<batchId>` — without recovery the replayed batch
    * would see an absent history and silently rebuild from itself
    * alone, dropping every prior version. The newest complete `__old`
    * is the pre-swap history, so it is restored; stale `__stage_*`
    * dirs (crash before the first move) are merely dead staging output
    * and are removed.
    */
  def readHistory(spark: org.apache.spark.sql.SparkSession, dir: String): Option[DataFrame] = {
    recover(dir)
    if (Files.exists(Paths.get(dir))) Some(spark.read.parquet(dir)) else None
  }

  private def leftovers(dir: String, marker: String): Seq[java.nio.file.Path] = {
    val p = Paths.get(dir)
    val parent = Option(p.getParent).getOrElse(Paths.get("."))
    if (!Files.exists(parent)) return Seq.empty
    val prefix = p.getFileName.toString + marker
    scala.util.Using.resource(Files.list(parent)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator.asScala
        .filter(_.getFileName.toString.startsWith(prefix)).toSeq
    }.sortBy(q => q.getFileName.toString.stripPrefix(prefix).toLongOption.getOrElse(-1L))
  }

  /** Idempotent swap repair — safe to call any time the stream is not
    * mid-batch (start() calls it through readHistory every batch).
    */
  def recover(dir: String): Unit = {
    val olds = leftovers(dir, "__old_")
    if (!Files.exists(Paths.get(dir)) && olds.nonEmpty)
      // highest batch id = the interrupted swap's pre-image
      Files.move(olds.last, Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
    // anything else is debris: earlier __old dirs whose delete was
    // interrupted, or staged output whose swap never started
    leftovers(dir, "__old_").foreach(deleteRecursively)
    leftovers(dir, "__stage_").foreach(deleteRecursively)
  }

  def start(changes: DataFrame, historyDir: String, checkpointDir: String,
      key: String, ts: String, tie: String, attr: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty micro-batch (all rows filtered upstream) must not
        // write an empty history: parquet emits no part files for it and
        // the next batch's readHistory would fail schema inference
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val merged = readHistory(spark, historyDir) match {
            case None => Scd2.history(batch, key, ts, tie, attr)
            case Some(cur) => Scd2.merge(cur, batch, key, ts, tie, attr)
          }
          val stage = s"${historyDir}__stage_$batchId"
          merged.write.mode(SaveMode.Overwrite).parquet(stage)
          // atomic swap: the staged result becomes the history in one move
          val tgt = Paths.get(historyDir)
          if (Files.exists(tgt)) {
            val old = Paths.get(s"${historyDir}__old_$batchId")
            Files.move(tgt, old, StandardCopyOption.ATOMIC_MOVE)
            Files.move(Paths.get(stage), tgt, StandardCopyOption.ATOMIC_MOVE)
            deleteRecursively(old)
          } else Files.move(Paths.get(stage), tgt, StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      // Files.walk holds a directory handle until closed — materialize
      // the listing inside Using so a handle isn't leaked per micro-batch
      val paths = scala.util.Using.resource(Files.walk(p))(_.iterator.asScala.toSeq)
      paths.reverse.foreach(Files.delete)
    }
  }
}
