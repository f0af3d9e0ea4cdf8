package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.DedupFunctions

/** JVM kernels behind the native vector/MinHash expressions
  * ([[QuantizeMilli]], [[DotMilli]], [[MinhashBands]], [[LshBands]]).
  *
  * Same contract as [[TextKernels]]: these compute EXACTLY the values the
  * higher-order-function formulations in `graft.functions` compute (those
  * remain the executable spec, and the DuckDB oracle recomputes them
  * independently) — a single JIT-compiled loop replaces the per-element
  * interpreted Catalyst lambda walk.
  *
  * All hash-derived constants (MinHash permutation coefficients, LSH
  * hyperplane coefficients) come from [[DedupFunctions]] so there is one
  * definition; they are memoized per parameterization because expression
  * instances are short-lived but the coefficient tables are not.
  */
object VectorKernels {

  private val P: Long = DedupFunctions.MinhashP

  private val minhashCoefs = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def coefs(k: Int): (Array[Long], Array[Long]) =
    minhashCoefs.computeIfAbsent(
      k,
      kk => (DedupFunctions.minhashA(kk).toArray, DedupFunctions.minhashB(kk).toArray))

  private val planeCache = new ConcurrentHashMap[(Int, Int), Array[Long]]
  private def planeTable(totalPlanes: Int, dims: Int): Array[Long] =
    planeCache.computeIfAbsent(
      (totalPlanes, dims),
      { case (t, d) =>
        val out = new Array[Long](t * d)
        var p = 0
        while (p < t) {
          val cs = DedupFunctions.planeCoefs(p, d)
          var i = 0
          while (i < d) { out(p * d + i) = cs(i); i += 1 }
          p += 1
        }
        out
      })

  /** `round(x * 1000)` with Spark's `round` semantics (HALF_UP over the
    * decimal string form of the double) so results match both the HOF
    * quantize spec and DuckDB's `round(x*1000)::BIGINT`.
    */
  private def roundMilli(v: Double): Long =
    JBigDecimal.valueOf(v * 1000.0).setScale(0, RoundingMode.HALF_UP).longValue()

  def quantizeFloat(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = roundMilli(vec.getFloat(i).toDouble); i += 1 }
    new GenericArrayData(out)
  }

  def quantizeDouble(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = roundMilli(vec.getDouble(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Exact integer dot product of two quantized vectors. [[DotMilli]]
    * pre-checks equal dimensionality and yields NULL on mismatch (HOF
    * parity); this kernel therefore only ever sees equal-length inputs
    * (the min() below is belt-and-braces for direct callers).
    */
  def dotMilli(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** MinHash(k) LSH band keys of a hashed shingle set: `bands` keys of
    * `rows` signature slots each, formatted `"b#s1,s2,…"` exactly like
    * `DedupFunctions.minhashBandKeys`. One pass over the shingles updates
    * all k permutation minima.
    */
  def minhashBands(hs: ArrayData, k: Int, bands: Int, rows: Int): ArrayData = {
    val (a, b) = coefs(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (a(j) * hm + b(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](bands)
    var bnd = 0
    while (bnd < bands) {
      val sb = new java.lang.StringBuilder(8 + 11 * rows)
      sb.append(bnd).append('#')
      val hi = math.min((bnd + 1) * rows, k)
      var r = bnd * rows
      while (r < hi) {
        if (r > bnd * rows) sb.append(',')
        sb.append(sig(r))
        r += 1
      }
      out(bnd) = UTF8String.fromString(sb.toString)
      bnd += 1
    }
    new GenericArrayData(out)
  }

  /** Banded random-hyperplane LSH keys of a quantized vector: `bands` keys
    * of `planesPerBand` sign bits each, formatted `"b#bits"` exactly like
    * `DedupFunctions.lshBandKeys`. Contract: the vector must have exactly
    * `dims` elements (one corpus, one dimensionality — enforced upstream
    * by the embedding schema); a shorter vector is treated as zero-padded,
    * which is NOT the HOF's null-propagation and is why the parity claim
    * is scoped to equal-dims inputs.
    */
  def lshBands(q: ArrayData, bands: Int, planesPerBand: Int, dims: Int): ArrayData = {
    val cs = planeTable(bands * planesPerBand, dims)
    val n = math.min(q.numElements(), dims)
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var j = 0
      while (j < planesPerBand) {
        val off = (b * planesPerBand + j) * dims
        var dot = 0L
        var i = 0
        while (i < n) { dot += q.getLong(i) * cs(off + i); i += 1 }
        if (dot > 0) bits |= 1L << j
        j += 1
      }
      out(b) = UTF8String.fromString(b.toString + "#" + bits)
      b += 1
    }
    new GenericArrayData(out)
  }
}
