package org.apache.spark

/** Loud version pin for the two shims that reach into Spark internals
  * (`GraftShuffleReaper`, `sql.GraftPartitionedCheckpoint`).
  *
  * Both are written against Spark 4.1.2-specific behavior — the
  * MapOutputTrackerMaster/ContextCleaner shuffle-cleanup path and the
  * LogicalRDD constructor shape + the AQE invariant that
  * REPARTITION_BY_NUM output is never coalesced. A Spark upgrade changes
  * those silently: the reaper could stop reclaiming (disk-full at decade
  * scale) or the checkpoint could claim a layout the blocks no longer
  * have (wrong join results). Header warnings alone proved too quiet
  * (VERDICT r11 #4) — this guard turns the first use under an unpinned
  * version into an immediate, named failure with the re-verify recipe.
  */
object GraftInternalsPin {

  /** The Spark version these shims were verified against. */
  val Pinned = "4.1.2"

  /** Throw unless `version` is the pinned one. `shim` and `respec` name
    * the caller and its verifying spec in the failure message. The
    * version is a parameter (defaulting to the running Spark's) so the
    * spec can prove the guard fires without spoofing a global.
    */
  def check(shim: String, respec: String,
      version: String = SPARK_VERSION): Unit =
    if (version != Pinned) throw new IllegalStateException(
      s"$shim is pinned to Spark $Pinned internals but this is Spark " +
        s"$version — the internal APIs it reaches may have changed " +
        s"meaning. Re-verify against the new Spark source, re-run " +
        s"$respec, then update GraftInternalsPin.Pinned. Failing fast " +
        "here beats silently wrong reclamation/layout at scale.")
}
