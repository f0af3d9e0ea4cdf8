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

  /** @param edges undirected edge frame (one row per pair, either order)
    * @return frame (id, label): label = min node id in the component
    */
  def minLabelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val bidir = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    var labels = bidir.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(false)
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
