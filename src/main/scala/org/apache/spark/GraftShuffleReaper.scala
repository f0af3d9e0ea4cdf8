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
  * cleaner API. Reaping is SCOPED: a caller snapshots `liveIds` before
  * its own shuffle-producing stages and reaps only ids registered
  * after the snapshot — shuffles belonging to OTHER operators on the
  * shared context (cached signature frames, a concurrent stream's
  * state) are never touched. A forced recompute of a foreign dropped
  * shuffle would be "perf, never correctness" only for deterministic
  * lineage; t7's `monotonically_increasing_id` and the Ordinals
  * zipWithIndex are not, so scope is the safety boundary, not
  * recompute-from-lineage. As a second belt, reaping is skipped
  * entirely (loudly) while any job is active on the context: a
  * concurrent fetch hitting a vanishing shuffle surfaces as a
  * mid-stage failure even when the data is deterministic.
  *
  * It remains safe only at a barrier where the caller's own live
  * datasets are checkpoint- or block-backed (nothing lazily derived
  * from one of its OWN pre-barrier exchanges); there a recompute of an
  * own-scope shuffle is pure perf. At sf100 each reclaimed
  * build/iteration shuffle is ~10-17 GB of local disk — the difference
  * between completing and No-space.
  */
object GraftShuffleReaper {

  /** Single-concurrent-operator contract, ENFORCED (VERDICT r10 #4): the
    * snapshot-then-reap pattern is check-then-act — a shuffle registered
    * by a concurrent operator after this one took its `liveIds` snapshot
    * is not in the keep set and WOULD be reaped, which is silent data
    * loss for non-deterministic lineage. One JVM-wide owner slot turns
    * that latent hazard into a loud error: the second operator's
    * `acquire` throws instead of both proceeding. A lock (blocking) would
    * be wrong here — the second operator's snapshot would still predate
    * the first's remaining reaps, so waiting doesn't make it safe;
    * failing fast with a clear message does.
    */
  private val owner =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Claim the reaper for one operator's snapshot→reap scope. Throws if
    * another operator holds it. `tag` is diagnostic (shows up in the
    * loser's error).
    */
  def acquire(tag: String): Unit = {
    // first-use gate on every scope: the cleanup path below is 4.1.2
    // behavior, and a quietly different Spark must fail loudly here,
    // not half-reclaim at a decade probe (VERDICT r11 #4)
    GraftInternalsPin.check("GraftShuffleReaper", "ShuffleReaperSpec")
    val prev = owner.compareAndExchange(null, tag)
    if (prev != null) throw new IllegalStateException(
      s"GraftShuffleReaper is held by operator '$prev' (requested by '$tag') — " +
        "concurrent scoped reaping would drop the holder's shuffles " +
        "(its liveIds snapshot predates yours); run disk-bounded " +
        "operators serially or disable diskBound for one of them")
  }

  /** Release a scope taken with [[acquire]]. Throws on a mismatched tag —
    * releasing someone else's scope is the same hazard as never acquiring.
    */
  def release(tag: String): Unit = {
    if (!owner.compareAndSet(tag, null)) throw new IllegalStateException(
      s"GraftShuffleReaper.release('$tag') but holder is " +
        s"'${Option(owner.get).getOrElse("<none>")}'")
  }

  /** Ids of every shuffle currently registered on the context — the
    * snapshot a scoped caller takes BEFORE creating its own shuffles.
    */
  def liveIds(sc: SparkContext): Set[Int] = {
    GraftInternalsPin.check("GraftShuffleReaper", "ShuffleReaperSpec")
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keys.toSet
      case _                         => Set.empty
    }
  }

  /** Drop the map outputs and files of every shuffle NOT in `keep`,
    * blocking until the files are gone. Requires the caller to hold the
    * reaper via [[acquire]] — reaping outside an owned scope is exactly
    * the concurrent hazard the owner slot exists to prevent. No-op (with
    * a stderr note) when other jobs are running on the context — reaping
    * mid-job could fail a concurrent fetch, and the disk win can wait
    * for the next barrier.
    */
  def dropCreatedSince(sc: SparkContext, keep: Set[Int]): Unit = {
    if (owner.get == null) throw new IllegalStateException(
      "GraftShuffleReaper.dropCreatedSince outside an acquired scope — " +
        "bracket the operator with acquire(tag)/release(tag); the " +
        "single-concurrent-operator contract is enforced, not documented")
    if (sc.statusTracker.getActiveJobIds.nonEmpty) {
      System.err.println(
        "[GraftShuffleReaper] active jobs on context — skipping reap at this barrier")
      return
    }
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster =>
        val ids = m.shuffleStatuses.keys.toArray.filterNot(keep)
        sc.cleaner match {
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

  /** Unscoped reap — every registered shuffle. Only for a context the
    * caller owns outright (single-query probes); operators on the shared
    * registry session must snapshot + `dropCreatedSince`. Takes its own
    * scope for the call, so it too fails loudly against a concurrent
    * holder instead of deleting the holder's shuffles.
    */
  def dropAll(sc: SparkContext): Unit = {
    acquire("dropAll")
    try dropCreatedSince(sc, Set.empty) finally release("dropAll")
  }
}
