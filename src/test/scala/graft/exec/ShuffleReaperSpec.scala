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

  test("scoped reap inside an acquired scope keeps the snapshot's shuffles") {
    import spark.implicits._
    GraftShuffleReaper.acquire("op-spec")
    try {
      // force one shuffle, snapshot, force another, reap since snapshot
      val before = Seq(1, 2, 2, 3).toDF("x").groupBy("x").count()
      before.collect()
      val keep = GraftShuffleReaper.liveIds(spark.sparkContext)
      Seq(4, 5, 5).toDF("y").groupBy("y").count().collect()
      GraftShuffleReaper.dropCreatedSince(spark.sparkContext, keep)
      assert(GraftShuffleReaper.liveIds(spark.sparkContext) == keep)
    } finally GraftShuffleReaper.release("op-spec")
  }
}
