package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A2 + C3: duplicate-id detection and merged-graph referential validation
  * (reference etl/target/c3dc_etl.py:1596-1606,1663-1924).
  * All checks are anti-join / aggregate frames — nonempty means invalid.
  */
object GraphValidator {

  /** A2: node ids that occur more than once (reference aborts when any). */
  def duplicateIds(df: DataFrame, idCol: String): DataFrame =
    df.groupBy(col("`" + idCol + "`").as("id"))
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") > 1)

  /** C3: observation back-pointers that don't resolve to a participant. */
  def orphanObservations(
      obs: DataFrame,
      participant: DataFrame): DataFrame =
    obs.join(
      participant.select(col("participant_id")),
      obs("`participant.participant_id`") === participant("participant_id"),
      "left_anti")

  /** C3: node types that must occur exactly once per harmonized doc
    * (study, consent_group — reference :2186-2187 hard-errors on any
    * other count). Empty result = valid.
    */
  def singletonViolation(df: DataFrame, node: String): DataFrame =
    df.groupBy(lit(node).as("node"))
      .agg(count(lit(1)).as("records"))
      .filter(col("records") =!= 1)

  /** C3: ids present in the parent's id-list but missing from the child
    * frame (and vice versa via the second frame).
    */
  def idListMismatch(
      parent: DataFrame,
      listCol: String,
      child: DataFrame,
      childIdCol: String): (DataFrame, DataFrame) = {
    val listed = parent.select(explode(col("`" + listCol + "`")).as("id")).distinct()
    val actual = child.select(col("`" + childIdCol + "`").as("id")).distinct()
    (listed.join(actual, Seq("id"), "left_anti"),
      actual.join(listed, Seq("id"), "left_anti"))
  }
}
