package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import HashFunctions.h60

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

  /** MinHash signature of a shingle-set column: k permutations simulated by
    * k salted hashes, sig[i] = min over shingles of h60(i + "|" + shingle).
    */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => h60(concat_ws("|", i.cast("string"), s)))))

  /** LSH band keys for a MinHash signature: `bands` keys, each hashing
    * `rowsPerBand` consecutive signature slots. Docs sharing ANY band key
    * are candidate pairs (standard banding amplification).
    */
  def minhashBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws("#", b.cast("string"),
        array_join(
          transform(slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",")))

  /** 60-bit SimHash as a SQL expression over a column of token hashes
    * (array<bigint>): bit b is set when the ±1 vote across token-hash bit b
    * is positive. Expression form because bit shifts by a lambda variable
    * need the SQL `shiftright`/`shiftleft` functions.
    */
  def simhashSql(hsCol: String): String =
    s"""aggregate(sequence(0, 59), 0L, (acc, b) -> acc +
       IF(aggregate($hsCol, 0L, (a, h) -> a + IF((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
          shiftleft(1L, b), 0L))"""

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
