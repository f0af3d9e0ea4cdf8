package org.apache.spark

/** Deterministic shuffle-file reclamation for disk-bounded iterative
  * jobs (graft's PageRank at decade scale).
  *
  * Spark's ContextCleaner deletes a shuffle's files only after its
  * `ShuffleDependency` is garbage-collected — but the DAGScheduler's
  * shuffle-stage registry keeps a strong reference until later job
  * activity churns it, so `System.gc()` + waiting reclaims NOTHING on a
  * quiet context (measured: a 17 GB build shuffle survived gc + 90 s of
  * polling). On a 35 GB scratch budget that turns a 1.17B-edge PageRank
  * into `No space left on device`.
  *
  * This shim lives in `org.apache.spark` to reach the package-private
  * cleaner API and drops EVERY registered shuffle, blocking until the
  * files are gone. It is only safe to call at a barrier where all live
  * datasets are checkpoint- or block-backed (no in-flight job, nothing
  * lazily derived from a prior exchange) — exactly the points where an
  * iterative operator has just eagerly checkpointed its state. If a
  * later stage does turn out to need a dropped shuffle, Spark recomputes
  * it from lineage: a performance cost, never a correctness one.
  */
object GraftShuffleReaper {

  /** Drop all registered shuffles' map outputs and files, blocking. */
  def dropAll(sc: SparkContext): Unit = {
    val cleanerOpt = sc.cleaner
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster =>
        val ids = m.shuffleStatuses.keys.toArray
        cleanerOpt match {
          case Some(cleaner) =>
            ids.foreach(id => cleaner.doCleanupShuffle(id, blocking = true))
          case None =>
            ids.foreach { id =>
              m.unregisterShuffle(id)
              SparkEnv.get.blockManager.master.removeShuffle(id, blocking = true)
            }
        }
      case _ => // executor-side tracker: nothing to do
    }
  }
}
