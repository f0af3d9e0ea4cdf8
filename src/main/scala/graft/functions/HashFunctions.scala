package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything that feeds a correctness oracle must be reproducible OUTSIDE
  * Spark (the driver's DuckDB check) and INSIDE it, bit for bit, regardless
  * of partitioning. Spark's native `hash`/`xxhash64` are murmur-based and
  * Spark-specific, so the portable primitive here is an md5-derived 60-bit
  * integer: `h60(s) = int(md5(s)[0:15 hex], 16)` — nonnegative, fits a
  * LongType, identical in any engine with md5 (DuckDB:
  * `('0x' || substr(md5(s),1,15))::BIGINT`).
  *
  * For purely-internal hashing (shuffle keys, salting) prefer Spark's
  * `xxhash64` — faster, codegen'd — via [[fastHash]].
  */
object HashFunctions {

  /** Portable 60-bit nonnegative hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL-expression form usable inside higher-order lambdas. */
  def h60Sql(inner: String): String =
    s"CAST(conv(substring(md5($inner), 1, 15), 16, 10) AS BIGINT)"

  /** Engine-internal hash (not oracle-portable): whole-stage-codegen'd. */
  def fastHash(cols: Column*): Column = xxhash64(cols: _*)

  /** Salted key for skew mitigation: appends a stable salt in [0, buckets)
    * derived from `salt` so hot keys spread across `buckets` reducers while
    * remaining deterministic (no rand()) — replays and retries produce
    * identical partitioning.
    */
  def saltedKey(key: Column, salt: Column, buckets: Int): Column =
    concat_ws("#", key.cast("string"), pmod(xxhash64(salt), lit(buckets)).cast("string"))
}
