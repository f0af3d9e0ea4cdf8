package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys.
  *
  * AQE's skew-join splitting handles joins; a skewed GROUP BY key still
  * funnels every row of the hot key through one reducer when the
  * aggregate is not map-side combinable (`collect_list`, exact distinct).
  * [[saltedAgg]] runs the classic two-phase shape: salt the key with a
  * deterministic shard id, aggregate per (key, salt), then merge the
  * shards per key — the hot key's work spreads over `shards` reducers and
  * the second shuffle carries only `shards` pre-aggregated rows per key.
  *
  * For combinable aggregates (sum/count/min/max) Spark's partial
  * aggregation already does this implicitly — use salting only for the
  * holistic ones.
  */
object SkewFunctions {

  /** Deterministic per-row shard in [0, shards): hashes the whole row's
    * salt source (a distinct-ish column, e.g. the child id being
    * collected), NOT rand() — retries and speculative tasks must land each
    * row in the same shard for exactly-once semantics.
    */
  def shard(saltSource: Column, shards: Int): Column =
    pmod(xxhash64(saltSource), lit(shards)).cast("int")

  /** Two-phase `groupBy(key).agg(collect_list(value))` with salting:
    * per-(key,shard) partial lists, then per-key shard merge via
    * `flatten(collect_list(...))` with shards in deterministic order.
    * Returns (key, values:array) with values sorted for a canonical
    * result (the id-list rollups of the harmonized graph are
    * order-insensitive sets; sorting makes them reproducible under any
    * partitioning — same contract as GraphLinker).
    */
  def saltedCollectList(
      df: DataFrame, key: Column, value: Column, shards: Int): DataFrame =
    df.select(key.as("__key"), value.as("__v"))
      .withColumn("__shard", shard(col("__v"), shards))
      .groupBy(col("__key"), col("__shard"))
      .agg(collect_list(col("__v")).as("__part"))
      .groupBy(col("__key"))
      .agg(array_sort(flatten(collect_list(col("__part")))).as("__values"))
      .toDF("key", "values")

  /** Salted equi-join for a skewed fact key against a dimension TOO LARGE
    * to broadcast: the dimension is replicated `shards` times (a narrow
    * explode — `shards`× the dim's bytes, amortized across the cluster)
    * and each fact row lands in a deterministic shard, so the hot key's
    * probe work spreads over `shards` reducers instead of funneling one.
    * Result is exactly `fact JOIN dim USING (key)`.
    *
    * AQE's skew-join split handles this case REACTIVELY when it sees the
    * skew at runtime; the salted form is the static guarantee for keys
    * known to be pathological (a null-bucket surrogate, a "unknown user"
    * id) and for the sort-merge-free `shuffle_hash` path pinned here —
    * the hint keeps Spark from choosing broadcast (which would make the
    * replication pointless) so the plan exercises the shape that matters
    * at dimension sizes where broadcast is impossible.
    *
    * Measured boundary (r10 A/B, SCALE.md): on UNIFORM hotness — many
    * equally-hot keys, e.g. the events table's 150 users — salting is
    * 1.7–4.1× SLOWER than the plain AQE join (every post-shuffle
    * partition is already the same size; the `shards`× dim replication
    * and wider key are pure overhead). Reach for this ONLY when one or
    * a few specific keys dominate; otherwise let AQE handle it.
    *
    * `saltSource` must be deterministic per row (an id column, NOT
    * rand()) so retries and speculative tasks shard identically.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, shards: Int): DataFrame = {
    require(shards > 1, "saltedJoin needs >1 shards")
    val f = fact.withColumn("__shard", shard(saltSource, shards))
    val d = dim.withColumn("__shard",
      explode(lit((0 until shards).toArray)))
    f.join(d.hint("shuffle_hash"), Seq(key, "__shard")).drop("__shard")
  }
}
