package graft.exec

import graft.SparkTestBase
import org.apache.spark.GraftShuffleReaper

/** The reaper's single-concurrent-operator contract is ENFORCED, not
  * documented (VERDICT r10 #4): a second scoped reap attempt while one
  * operator holds the owner slot must fail loudly — the alternative is
  * two operators whose liveIds snapshots each predate the other's reaps,
  * i.e. silent cross-operator shuffle loss.
  */
class ShuffleReaperSpec extends SparkTestBase {

  test("second concurrent acquire fails loudly, naming the holder") {
    GraftShuffleReaper.acquire("op-a")
    try {
      val e = intercept[IllegalStateException] {
        GraftShuffleReaper.acquire("op-b")
      }
      assert(e.getMessage.contains("op-a") && e.getMessage.contains("op-b"))
    } finally GraftShuffleReaper.release("op-a")
    // after release the slot is free again
    GraftShuffleReaper.acquire("op-b")
    GraftShuffleReaper.release("op-b")
  }

  test("scoped reap outside an acquired scope is an error, not a silent drop") {
    val e = intercept[IllegalStateException] {
      GraftShuffleReaper.dropCreatedSince(spark.sparkContext, Set.empty)
    }
    assert(e.getMessage.contains("acquire"))
  }

  test("mismatched release is an error") {
    GraftShuffleReaper.acquire("op-a")
    try {
      intercept[IllegalStateException] {
        GraftShuffleReaper.release("op-z")
      }
    } finally GraftShuffleReaper.release("op-a")
  }

  test("internals version pin: guard fires on a spoofed version, passes on the real one") {
    import org.apache.spark.GraftInternalsPin
    // the running Spark IS the pinned one (otherwise every acquire above
    // would already have failed) — assert that explicitly so an upgrade
    // flips this suite red before any internals misbehave quietly
    assert(GraftInternalsPin.Pinned == org.apache.spark.SPARK_VERSION)
    GraftInternalsPin.check("GraftShuffleReaper", "ShuffleReaperSpec")
    val e = intercept[IllegalStateException] {
      GraftInternalsPin.check("GraftShuffleReaper", "ShuffleReaperSpec",
        version = "4.2.0")
    }
    // the message must carry the re-verify recipe: shim name, the spec to
    // re-run, and both version strings
    assert(e.getMessage.contains("GraftShuffleReaper"))
    assert(e.getMessage.contains("ShuffleReaperSpec"))
    assert(e.getMessage.contains("4.1.2") && e.getMessage.contains("4.2.0"))
  }

  test("scoped reap inside an acquired scope keeps the snapshot's shuffles") {
    import spark.implicits._
    GraftShuffleReaper.acquire("op-spec")
    try {
      // force one shuffle, snapshot, force another, reap since snapshot.
      // Assertions are one-sided on purpose: ids in `keep` that belong to
      // earlier suites' garbage can be ContextCleaner-reclaimed at any
      // moment, so `liveIds == keep` is a race — what the reaper
      // guarantees is (a) every post-snapshot id is gone and (b) nothing
      // outside keep survives.
      val before = Seq(1, 2, 2, 3).toDF("x").groupBy("x").count()
      before.collect()
      val keep = GraftShuffleReaper.liveIds(spark.sparkContext)
      val extra = Seq(4, 5, 5).toDF("y").groupBy("y").count()
      extra.collect()
      val newIds = GraftShuffleReaper.liveIds(spark.sparkContext) -- keep
      assert(newIds.nonEmpty)
      GraftShuffleReaper.dropCreatedSince(spark.sparkContext, keep)
      val after = GraftShuffleReaper.liveIds(spark.sparkContext)
      assert((after & newIds).isEmpty, "post-snapshot shuffles survived the reap")
      assert(after.subsetOf(keep), "reap left ids outside the keep set")
    } finally GraftShuffleReaper.release("op-spec")
  }
}
