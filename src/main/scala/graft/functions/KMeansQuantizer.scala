package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over integer-quantized vectors — the
  * trainer for the IVF coarse quantizer (SimilarityOps sim3 uses fixed
  * seed vectors as its stand-in; this is the production path: train on a
  * sample, then partition the corpus by nearest centroid).
  *
  * Deterministic BY CONSTRUCTION, under any partitioning / retry /
  * speculative execution:
  *  - init = the k lowest-id vectors (not random sampling);
  *  - assignment = argmin of EXACT integer squared distances, ties to the
  *    lowest centroid index (a codegen'd when-chain over k literal
  *    centroids, no UDF, no shuffle);
  *  - update = per-(cell, dim) integer sums via one explode + groupBy
  *    (map-side combined), centroid dim = round(sum/count) computed on
  *    the driver from exact longs (k x dims rows per iteration — metadata
  *    scale).
  * Distances stay in Long: |q| <= ~10^4 milliunits, 64 dims → max sq dist
  * ~2.6*10^10, far under 2^63.
  */
object KMeansQuantizer {

  /** Squared L2 distance between a quantized vector column and a literal
    * centroid: |q|² − 2·q·c + |c|², with the dot products on the NATIVE
    * codegen kernel (graft_dot_milli) and |c|² a plan-time constant —
    * exact integer math, no interpreted per-element lambda.
    */
  def sqDistTo(q: Column, centroid: Array[Long]): Column =
    graft.functions.VectorFunctions.dotQN(q, q) + reducedScore(q, centroid)

  /** −2·q·c + |c|² — equals sqDist minus the per-row constant |q|², so
    * argmin over these is argmin over true distances at 1/(k+1)th the
    * dot-product work.
    */
  private def reducedScore(q: Column, centroid: Array[Long]): Column = {
    val c2 = centroid.map(x => x * x).sum
    lit(c2) - lit(2L) * graft.functions.VectorFunctions.dotQN(q, typedlit(centroid.toSeq))
  }

  /** Argmin cell id over k literal centroids, ties to the lowest index. */
  def assignCell(q: Column, centroids: Array[Array[Long]]): Column = {
    val dists = centroids.map(c => reducedScore(q, c))
    val best = least(dists: _*)
    dists.zipWithIndex.foldRight(lit(-1)) { case ((d, i), other) =>
      when(d === best, lit(i)).otherwise(other)
    }
  }

  /** Train k centroids with `iters` Lloyd iterations.
    *
    * @param vecs frame holding an id column and a quantized ARRAY<BIGINT>
    *             vector column (see VectorFunctions.quantize)
    * @return (centroids, assignment frame (id, cell))
    */
  def train(
      vecs: DataFrame, idCol: String, qCol: String,
      k: Int, iters: Int): (Array[Array[Long]], DataFrame) = {
    val base = vecs.select(col(idCol).cast("long").as("id"), col(qCol).as("q"))
      .localCheckpoint(false) // consumed every iteration
    var centroids: Array[Array[Long]] = base.orderBy(col("id")).limit(k)
      .select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(centroids.length == k, s"need at least $k vectors, got ${centroids.length}")

    for (_ <- 0 until iters) {
      val assigned = base.withColumn("cell", assignCell(col("q"), centroids))
      val sums = assigned
        .select(col("cell"), posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val (cell, dim) = (r.getInt(0), r.getInt(1))
        // sums bounded well under 2^53 → the double division is exact
        // enough for a deterministic half-even round
        next(cell)(dim) = Math.round(r.getLong(2).toDouble / r.getLong(3))
      }
      centroids = next
    }
    (centroids, base.withColumn("cell", assignCell(col("q"), centroids))
      .select(col("id"), col("cell")))
  }

  /** Within-cluster sum of squared distances for a trained model —
    * the monotone objective Lloyd minimizes (spec asserts the decrease).
    */
  def cost(vecs: DataFrame, qCol: String, centroids: Array[Array[Long]]): Long = {
    val cell = assignCell(col(qCol), centroids)
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      when(cell === i, sqDistTo(col(qCol), c))
    }
    vecs.agg(coalesce(sum(coalesce(dists: _*)), lit(0L))).head.getLong(0)
  }
}
