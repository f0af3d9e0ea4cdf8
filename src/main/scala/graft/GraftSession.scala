package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * Local testing runs `local[N]` in one JVM, but every config here is chosen
  * to also be the right default on a large cluster: AQE for runtime re-plan
  * (skew joins, dynamic coalescing), modest shuffle partitions for the local
  * data scale (would be raised via `spark.sql.shuffle.partitions` on a real
  * cluster), broadcast threshold sized for dimension tables.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Shuffle partition count — defaults to the core count for the driver's
    * small-sf runs; decade-scale measurements raise it the way a cluster
    * deployment would (partition size, not partition count, is what must
    * stay bounded as data grows).
    */
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // the synthetic events table carries parquet TIMESTAMP(NANOS), which
      // Spark 4 otherwise rejects; read as epoch-nanos long and let the
      // table loader convert to a proper timestamp column
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // checkpointed/cached RDD blocks are stored lz4-compressed: the
      // engine leans on localCheckpoint for reused frames (edge lists,
      // signature frames, ANN candidates), and at decade scale their
      // UNCOMPRESSED disk blocks are the binding resource — g1's sf100
      // edge checkpoints (587M distinct pairs on the r8 generation)
      // overran the machine's 35 GB of free disk and took the whole
      // bench suite down with No-space failures. lz4 on integer-heavy
      // rows is a 3-5x shrink for a few percent CPU; on a real cluster
      // this is the standard setting for disk-spilled caches.
      .config("spark.rdd.compress", "true")
      // Kryo for DATA serialization (RDD block store + broadcast values;
      // closures always stay on Java serialization). The checkpoint-heavy
      // operators (g1's 1.17B-row DISK_ONLY adjacency, ANN/CC/dedup
      // frames) pay the block serializer on every store AND every re-scan;
      // JavaSerializationStream's per-object bookkeeping (type handles,
      // reset-interval table) was a measured chunk of g1's sf100 build —
      // UnsafeRow implements KryoSerializable as a raw byte-copy. Standard
      // production setting; SQL shuffles are unaffected (UnsafeRowSerializer
      // regardless). SPARK_GRAFT_SERIALIZER=java reverts — kept as an env
      // toggle so serializer regressions can be bisected without a rebuild.
      .config("spark.serializer",
        if (sys.env.get("SPARK_GRAFT_SERIALIZER").contains("java"))
          "org.apache.spark.serializer.JavaSerializer"
        else "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      // Stall tolerance (r13): the sf100 gate's cohort-2 JVM died when a
      // 144 s whole-JVM stall (STW GC / hypervisor steal during g1's
      // diskBound churn, under the host's pathological buffered-writeback
      // path) tripped HeartbeatReceiver's 120 s default — which in local
      // mode removes the only executor and tears down the SparkContext
      // mid-suite. 10 min tolerates any plausible stall; on a real
      // cluster the same setting is the standard large-heap guidance
      // (a reaped executor there costs recompute, here it costs the run).
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "30s")

  /** Local session for tests / Verify / Bench. */
  def local(appName: String): SparkSession = {
    val s = builder(appName).master(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
