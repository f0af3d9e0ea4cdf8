package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge frame — the clustering step that
  * turns near-duplicate PAIRS (MinHash / SimHash / embedding candidates)
  * into duplicate GROUPS with one canonical representative (min id) per
  * group, so a training-data pipeline can keep exactly one member.
  *
  * Algorithm: iterative min-label propagation. Each round every node takes
  * the min of its own label and its neighbors' labels; convergence after
  * O(component diameter) rounds. Near-dup components are overwhelmingly
  * tiny (pairs/triples — dedup thresholds are high), so the loop
  * terminates in 2–4 rounds regardless of corpus size; each round is one
  * shuffle-join + one aggregation, both partitioned by node id. At
  * 100 TB-scale graphs with long chains the same driver loop would host
  * the large-star/small-star variant (alternate rounds contracting to the
  * component min), which converges in O(log n) rounds; the min-label
  * round below IS small-star, so only the alternation would be added.
  *
  * Every round materializes via `localCheckpoint` — the lineage would
  * otherwise double per iteration and the convergence check would re-run
  * the whole history.
  */
object ConnectedComponents {

  /** Size-adaptive entry point — the broadcast-join logic applied to graph
    * clustering: a small edge set (it is known exactly after candidate
    * generation) is solved with driver-side union-find in one collect,
    * skipping the per-round shuffle+checkpoint cost entirely; a large one
    * runs the distributed [[minLabelPropagation]] loop. Near-dup graphs at
    * high thresholds are edge-sparse, so the local path is the common case
    * even on huge corpora — the loop is the safety net, not the default.
    *
    * @param edges undirected edge frame (one row per pair, either order)
    * @return frame (id, label): label = min node id in the component
    */
  def components(
      edges: DataFrame, srcCol: String, dstCol: String,
      localThreshold: Long = 1L << 20): DataFrame = {
    val fwd = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(false)
    if (fwd.count() > localThreshold) minLabelPropagation(fwd, "src", "dst")
    else {
      // union-find with path halving; roots then remapped to component min
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent(x) != x) {
          parent(x) = parent(parent(x))
          x = parent(x)
        }
        x
      }
      fwd.collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
      parent.keys.foreach { n =>
        val r = find(n)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
      }
      val spark = edges.sparkSession
      import spark.implicits._
      parent.keys.toSeq.sorted.map(n => (n, minOfRoot(find(n)))).toDF("id", "label")
    }
  }

  /** Distributed path of [[components]] (also directly spec-tested).
    *
    * @param edges undirected edge frame (one row per pair, either order)
    * @return frame (id, label): label = min node id in the component
    */
  def minLabelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    // no distinct() on the edge list: duplicate edges cannot change a min,
    // they only fan out the join a little — cheaper than a dedup shuffle
    val fwd = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val bidir = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false)
    // label init FUSED with propagation round 1: each node's first label is
    // min(self, neighbors) from one aggregation, no init frame + no join
    var labels = bidir.groupBy(col("src").as("id"))
      .agg(least(min(col("src")), min(col("dst"))).as("label"))
      .localCheckpoint(false)
    // Convergence via the label-sum invariant: min-propagation only ever
    // DECREASES labels, so sum(label) is strictly monotone until the fixed
    // point — an unchanged sum IS convergence. One tiny aggregate per round
    // instead of a join-and-compare pass (halves the jobs per round, which
    // is what the loop's wall time is made of once components are small).
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = bidir.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels
  }
}
