package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.NodeType

/** Materializes the harmonized graph's relationship id-lists
  * (J1/J2/A1 — reference etl/target/c3dc_etl.py:1516-1594).
  *
  * Observations carry the back-pointer `participant.participant_id` (built
  * by their mappings); the parent side accumulates child id lists via
  * `groupBy(parent).agg(collect_list)` — one shuffle per relationship, all
  * partial-aggregated map-side. Lists are sorted for deterministic output
  * (the reference's list order is RNG-draw arrival order, which is not
  * reproducible distributed; sorted is the documented stronger contract).
  */
object GraphLinker {
  val ObservationNodes: Seq[String] = Seq(
    "diagnosis", "genetic_analysis", "laboratory_test", "survival",
    "synonym", "treatment", "treatment_response")

  private def fk(node: String): String = s"$node.${node}_id"

  /** Adds `<obs>.<obs>_id` array columns to the participant frame, one per
    * observation node frame keyed by `participant.participant_id`.
    */
  def linkObservationsToParticipant(
      participant: DataFrame,
      observations: Map[String, DataFrame]): DataFrame =
    observations.foldLeft(participant) { case (part, (obsNode, obs)) =>
      val idCol = NodeType.idProperty(obsNode)
      val rollup = obs
        .groupBy(col("`" + fk("participant") + "`").as("__pid"))
        .agg(sort_array(collect_list(col(idCol))).as(fk(obsNode)))
      part
        .join(rollup, part("participant_id") === rollup("__pid"), "left")
        .drop("__pid")
        .withColumn(fk(obsNode),
          coalesce(col("`" + fk(obsNode) + "`"), typedlit(Seq.empty[String])))
    }

  /** Adds a child-id array to a parent frame from an arbitrary child frame
    * (e.g. consent_group.participant_ids, study.consent_group_ids).
    *
    * No broadcast hint on purpose: the rollup has parent-count ROWS but
    * its array payload is child-count sized (a study's participant list is
    * the whole corpus's ids) — shipping that through the driver is the
    * anti-pattern. Both join sides are row-tiny, so the shuffle join is
    * cheap, and AQE may still pick broadcast when the payload is small.
    */
  def rollupChildren(
      parent: DataFrame,
      parentIdCol: String,
      child: DataFrame,
      childFkCol: String,
      childIdCol: String,
      outCol: String): DataFrame = {
    val rollup = child
      .groupBy(col("`" + childFkCol + "`").as("__pid"))
      .agg(sort_array(collect_list(col("`" + childIdCol + "`"))).as(outCol))
    parent
      .join(rollup, col("`" + parentIdCol + "`") === col("__pid"), "left")
      .drop("__pid")
      .withColumn(outCol, coalesce(col("`" + outCol + "`"), typedlit(Seq.empty[String])))
  }
}
