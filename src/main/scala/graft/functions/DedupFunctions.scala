package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._


/** Near-duplicate detection primitives: MinHash signatures + LSH banding,
  * SimHash, and random-hyperplane LSH for embeddings.
  *
  * Design for 100 TB: every candidate-generation step is a *narrow* map
  * (signature per row) followed by ONE shuffle on the band key; candidate
  * pairs are verified with the exact measure inside the bucket. Nothing is
  * all-pairs; bucket sizes bound the quadratic work. All hashes derive from
  * the portable [[HashFunctions.h60]] so results verify against an external
  * oracle and are stable across partitionings, retries, and engines.
  */
object DedupFunctions {

  /** Poor-man's let-binding for column expressions: evaluates `e` exactly
    * once and binds it as a lambda variable for `body`. Catalyst's
    * CollapseProject happily inlines an expensive subexpression into every
    * use site (no CSE across higher-order lambdas) — wrapping it as the
    * input of a single-element `transform` forces one evaluation.
    * Measured on the MinHash pipeline: 96s → ~3s at sf0.1.
    */
  def let1(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), x => body(x)), 1)

  /** Affine-permutation MinHash parameters (universal hashing): the
    * portable hash is computed ONCE per shingle and the k permutations are
    * arithmetic — `(a_i * (h % P) + b_i) % P` — not k separate salted
    * hashes. Coefficients derive from md5 so any engine can reproduce them.
    */
  val MinhashP: Long = 1000000007L
  private def coefHash(tag: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
    java.lang.Long.parseLong(digest.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }
  def minhashA(k: Int): Seq[Long] = (0 until k).map(i => coefHash(s"a|$i") % (MinhashP - 1) + 1)
  def minhashB(k: Int): Seq[Long] = (0 until k).map(i => coefHash(s"b|$i") % MinhashP)

  /** MinHash signature of a PRE-HASHED shingle-set column (array<bigint>,
    * one portable h60 per shingle computed upstream — shingle sets are
    * hashed once at shingling time and every downstream op works on
    * longs): single fold taking the elementwise min of the k permutations.
    */
  def minhashSignature(hs: Column, k: Int): Column = {
    val a = typedlit(minhashA(k))
    val b = typedlit(minhashB(k))
    aggregate(
      hs,
      array_repeat(lit(MinhashP), k),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(k - 1)),
          i => (element_at(a, i + 1) * (h % lit(MinhashP)) + element_at(b, i + 1)) % lit(MinhashP)),
        (x, y) => least(x, y)))
  }

  /** LSH band keys straight from the hashed shingle set: `bands` keys of
    * `rowsPerBand` signature slots each, with the signature bound ONCE via
    * [[let1]]. Docs sharing ANY band key are candidate pairs.
    */
  def minhashBandKeys(hs: Column, k: Int, bands: Int, rowsPerBand: Int): Column =
    let1(minhashSignature(hs, k)) { sig =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws("#", b.cast("string"),
          array_join(
            transform(slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand)),
              x => x.cast("string")), ",")))
    }

  /** 60-bit SimHash as a SQL expression over a column of token hashes
    * (array<bigint>): bit b is set when the ±1 vote across token-hash bit b
    * is positive. Expression form because bit shifts by a lambda variable
    * need the SQL `shiftright`/`shiftleft` functions.
    *
    * Shape matters: ONE fold over the token hashes accumulating a
    * 60-counter array. The naive transpose (outer fold over 60 bits, inner
    * fold over tokens) re-evaluates the token-hash array — md5 included —
    * once per bit after Catalyst collapses the projection: 60x the hashing
    * cost. Measured 83s → 3s at sf0.1.
    */
  def simhashSql(hsCol: String): String =
    s"""aggregate(
         zip_with(
           aggregate($hsCol, array_repeat(0L, 60),
             (acc, h) -> zip_with(acc,
               transform(sequence(0, 59),
                 b -> IF((shiftright(h, b) & 1) = 1, 1L, -1L)),
               (x, y) -> x + y)),
           transform(sequence(0, 59), b -> shiftleft(1L, b)),
           (c, p) -> IF(c > 0, p, 0L)),
         0L, (s, x) -> s + x)"""

  /** Deterministic hyperplane coefficients in [-1000, 1000], derived from
    * the portable hash of "planeIdx|dim" — reproducible in any engine with
    * md5; no fitted model object to distribute.
    */
  def planeCoefs(plane: Int, dims: Int): Seq[Long] =
    (0 until dims).map { d =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$plane|$d".getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }

  /** Banded random-hyperplane LSH over a QUANTIZED embedding: `bands` keys
    * of `planesPerBand` sign bits each. Vectors sharing any band key are
    * near-neighbor candidates; more bands = higher recall at a given
    * similarity (multi-probe without distance tables).
    */
  def lshBandKeys(vecQ: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    array((0 until bands).map { b =>
      val bits = (0 until planesPerBand).map { j =>
        val coefs = planeCoefs(b * planesPerBand + j, dims)
        val dot = aggregate(
          zip_with(vecQ, typedlit(coefs), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x)
        when(dot > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      concat_ws("#", lit(b.toString), bits.cast("string"))
    }: _*)
}
