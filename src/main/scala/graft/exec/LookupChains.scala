package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F7/F8: the chained clinical-code lookups
  * (reference etl/mci/c3dc_etl.py:1540-1629).
  *
  * F7 `{diagnosis}`: an ICD-O morphology/topography code resolves to an
  * ICD-O term — 'Preferred' rows win over 'Synonym' rows for the same
  * code (:1550-1553) — and the term then casefold-matches a schema
  * permissible value; a miss falls back to the mapping default.
  * F8 `{diagnosis_category}`: the resolved diagnosis maps to a category
  * via the mapping sheet, enum-canonicalized.
  *
  * Scale: every lookup table is dimension-sized, so each hop is a
  * broadcast hash join — the fact side never shuffles, and the per-code
  * Preferred/Synonym collapse happens ONCE on the tiny table (a plan-time
  * sized aggregation), never per fact row.
  */
object LookupChains {

  /** Collapse an ICD-O table (code, term, term_type) to one term per code
    * with 'Preferred' beating 'Synonym' (ties broken by term for
    * determinism), ready to broadcast.
    */
  def collapseIcdo(icdo: DataFrame): DataFrame =
    icdo.groupBy(col("code"))
      .agg(min_by(col("term"),
        struct(
          when(col("term_type") === "Preferred", lit(0)).otherwise(lit(1)).as("p"),
          col("term").as("t"))).as("term"))

  /** F7: resolve `codeCol` through the collapsed ICD-O table, then
    * casefold-match the term against the enum's canonical casing;
    * unresolved codes fall back to `default`.
    *
    * @param enumCanon (lower(trim(term)) → canonical PV) pairs
    */
  def diagnosis(
      facts: DataFrame, codeCol: Column,
      icdoCollapsed: DataFrame, enumCanon: DataFrame,
      default: String): DataFrame = {
    val icdo = broadcast(icdoCollapsed
      .select(col("code").as("__code"), col("term").as("__term")))
    val canon = broadcast(enumCanon
      .select(lower(trim(col("term"))).as("__tkey"), col("canonical").as("__canon")))
    facts
      .join(icdo, lower(trim(codeCol)) === lower(trim(col("__code"))), "left")
      .join(canon, lower(trim(col("__term"))) === col("__tkey"), "left")
      .withColumn("diagnosis", coalesce(col("__canon"), lit(default)))
      .drop("__code", "__term", "__tkey", "__canon")
  }

  /** F8: map the resolved diagnosis to its category (second broadcast
    * hop); unmapped diagnoses yield null on the warn channel like the
    * reference's enum-canonicalization miss.
    */
  def diagnosisCategory(
      withDiagnosis: DataFrame, categories: DataFrame): DataFrame =
    withDiagnosis.join(
        broadcast(categories.select(
          lower(trim(col("diagnosis"))).as("__dkey"), col("category").as("__cat"))),
        lower(trim(col("diagnosis"))) === col("__dkey"), "left")
      .withColumn("diagnosis_category", col("__cat"))
      .drop("__dkey", "__cat")
}
