package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core scalar building blocks for the mapping DSL, all composed from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs in the hot path).
  */
object GraftFunctions {
  val MultiValueDelim = ";"

  /** Casefolded trim equality domain (reference: all value matching is
    * `str.strip().casefold()`, etl/target/c3dc_etl.py:212-214; casefold ≈
    * lower for the ASCII enum domain enforced by the schema).
    */
  def cf(c: Column): Column = lower(trim(c))

  /** '' and NULL are equivalent for matching (etl/target/c3dc_etl.py:1216-1217). */
  def blank(c: Column): Column = c.isNull || c === lit("")

  def blankTrim(c: Column): Column = c.isNull || trim(c) === lit("")

  /** Numeric predicate (reference is_number: parseable float,
    * etl/target/c3dc_etl.py:181-188). Spark's string→double cast returns
    * null for non-numerics, matching Python float() on this data's domain.
    */
  def isNumber(c: Column): Column = c.try_cast("double").isNotNull

  /** Deterministic content-derived UUID.
    *
    * The reference generates UUIDv4 from a seeded RNG whose draw ORDER
    * defines the ids (etl/target/c3dc_etl.py:547-549) — unreproducible in a
    * distributed engine. We instead derive a UUIDv3-style id from
    * md5(seed ':' name): stable under any partitioning, still idempotent per
    * seed (SURVEY.md §7.5-1). Pure built-ins → whole-stage codegen.
    */
  def deterministicUuid(seed: Column, name: Column): Column = {
    val h = md5(concat_ws(":", seed, name))
    concat(
      substring(h, 1, 8), lit("-"),
      substring(h, 9, 4), lit("-3"),
      substring(h, 14, 3), lit("-8"),
      substring(h, 18, 3), lit("-"),
      substring(h, 21, 12))
  }

  /** Horizontal `{sum}` (reference etl/target/c3dc_etl.py:1034-1064):
    * any blank addend → NULL (caller falls back to converted default);
    * any non-numeric addend → `default`; else the double sum.
    */
  def nullGatedSum(addends: Seq[Column], default: Column, absFirst: Boolean = false): Column = {
    val anyBlank = addends.map(blankTrim).reduce(_ || _)
    val allNumeric = addends.map(isNumber).reduce(_ && _)
    val terms = addends.zipWithIndex.map { case (c, i) =>
      if (absFirst && i == 0) abs(c.try_cast("double")) else c.try_cast("double")
    }
    when(anyBlank, lit(null)).when(allNumeric, terms.reduce(_ + _)).otherwise(default)
  }

  /** `{race}` merge (reference etl/target/c3dc_etl.py:551-589):
    * keep 'Hispanic or Latino' ethnicities; when any survive, add only
    * determinate races (drop Not Reported / Unknown / Not Allowed to
    * Collect); else add all races; canonicalize against the enum map
    * dropping misses; distinct + sort. Returns the `;`-joined string domain
    * used by the compiler (converted to array by the output conversion).
    */
  def raceMergeJoined(
      race: Column,
      ethnicity: Column,
      canonicalByLower: Map[String, String],
      default: Column): Column = {
    val canon = typedlit(canonicalByLower)
    def splitTrim(c: Column): Column =
      filter(transform(split(coalesce(c, lit("")), MultiValueDelim), x => trim(x)),
        x => x =!= lit(""))
    val eths = filter(splitTrim(ethnicity), e => lower(e) === lit("hispanic or latino"))
    val undetermined = Seq("not allowed to collect", "not reported", "unknown")
    val races = splitTrim(race)
    val keptRaces = when(size(eths) > 0,
      filter(races, r => !lower(r).isin(undetermined.map(lit(_)): _*)))
      .otherwise(races)
    val merged = array_distinct(concat(eths, keptRaces))
    val canonical = array_sort(array_distinct(
      filter(transform(merged, r => element_at(canon, lower(r))), x => x.isNotNull)))
    when(size(canonical) > 0, array_join(canonical, MultiValueDelim)).otherwise(default)
  }
}
