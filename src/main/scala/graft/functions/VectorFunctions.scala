package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns, built from
  * higher-order functions (`zip_with`/`aggregate`/`transform`) — no UDFs,
  * no linear-algebra dependency, fully distributable.
  *
  * Exactness contract: similarity scores that feed correctness oracles are
  * computed over integer-QUANTIZED vectors (`round(x*1000)`). Products and
  * sums of those integers stay below 2^53, so every engine computes the
  * identical value no matter its summation order; the final
  * divide-by-norms is a deterministic IEEE op on identical inputs. This
  * removes float-reduction-order nondeterminism both across Spark
  * partitionings AND between Spark and the DuckDB oracle.
  */
object VectorFunctions {

  /** Quantize a float vector to integer milliunits. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity of two quantized vectors (double in [-1, 1]). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  // ---- Native fast paths ------------------------------------------------
  // The HOF forms above are the executable spec (and the DuckDB oracle's
  // definition); these call the codegen'd Catalyst expressions in
  // graft.expressions, which compute bit-identical values in one JIT loop.

  /** Native [[quantize]] (graft.expressions.QuantizeMilli). */
  def quantizeN(vec: Column): Column = call_function("graft_quantize_milli", vec)

  /** Native [[dotQ]] (graft.expressions.DotMilli). */
  def dotQN(a: Column, b: Column): Column = call_function("graft_dot_milli", a, b)

  /** [[cosineQ]] over the native dot product. */
  def cosineQN(a: Column, b: Column): Column =
    dotQN(a, b).cast("double") /
      (sqrt(dotQN(a, a).cast("double")) * sqrt(dotQN(b, b).cast("double")))

  /** Random-hyperplane LSH bucket id over a quantized vector.
    *
    * `planes` hyperplane coefficient vectors are derived deterministically
    * from the portable hash (`h60("p|d") % 2001 - 1000`), so bucket ids are
    * reproducible in any engine with md5 — no fitted model object to ship.
    * Bucket = integer whose bit p is sign(plane_p · v).
    */
  def lshBucket(vecQ: Column, planes: Int, dims: Int): Column = {
    val planeVecs: Seq[Seq[Long]] = (0 until planes).map { p =>
      (0 until dims).map { d =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16) % 2001 - 1000
      }
    }
    (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vecQ, typedlit(planeVecs(p)), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
