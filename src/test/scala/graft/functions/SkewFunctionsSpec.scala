package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Salted two-phase aggregation must equal the direct single-shuffle
  * formulation on skewed data — same values, spread shuffle.
  */
class SkewFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedCollectList equals direct groupBy+collect_list on a hot key") {
    // one hot key with 10k children, many cold keys with one
    val rows = (1 to 10000).map(i => ("hot", s"c$i")) ++
      (1 to 200).map(i => (s"k$i", s"v$i"))
    val df = rows.toDF("k", "v").repartition(8)

    val salted = SkewFunctions.saltedCollectList(df, col("k"), col("v"), shards = 16)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val direct = df.groupBy(col("k"))
      .agg(array_sort(collect_list(col("v"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

    assert(salted == direct)
    assert(salted("hot").size == 10000)
  }

  test("saltedJoin equals the plain join and never broadcasts") {
    // hot fact key: 5k rows on one key, trickle on the rest
    val fact = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (2 to 100).map(i => (i.toLong, i.toLong * 10)))
      .toDF("k", "payload")
    val dim = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("k", "attr")

    val salted = SkewFunctions.saltedJoin(fact, dim, "k", col("payload"), 16)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.columns.toSeq == plain.columns.toSeq, "salt must not leak")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    val phys = salted.queryExecution.executedPlan.toString
    assert(phys.contains("ShuffledHashJoin"), phys)
    assert(!phys.contains("BroadcastHashJoin"), phys)
    // the hot key's probes spread across shards: count distinct shards hit
    val shardsHit = fact.filter(col("k") === 1L)
      .select(SkewFunctions.shard(col("payload"), 16).as("s"))
      .distinct().count()
    assert(shardsHit == 16)
  }

  test("shard is deterministic and bounded") {
    val df = (1 to 1000).map(_.toString).toDF("v")
    val a = df.select(SkewFunctions.shard(col("v"), 16).as("s"))
      .collect().map(_.getInt(0))
    val b = df.select(SkewFunctions.shard(col("v"), 16).as("s"))
      .collect().map(_.getInt(0))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(s => s >= 0 && s < 16))
    assert(a.distinct.size > 1)
  }
}
