package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.model.NodeType

/** A7: cross-file deduplication
  * (reference etl/target/c3dc_etl.py:1926-2124; key normalization :278-329).
  *
  * Identity = sha1 over a canonical JSON of the record with volatile fields
  * blanked per node type (own id always; parents' child-id lists; reference
  * file guid), keyed with (participant_id, node). First occurrence by
  * transformation order wins — a single window, no driver-side cache.
  */
object Deduper {

  /** Volatile relationship-list fields blanked before hashing
    * (reference get_cacheable_record, etl/target/c3dc_etl.py:278-313).
    */
  private def volatileListFields(node: String): Seq[String] = node match {
    case "consent_group" => Seq("participant.participant_id")
    case "participant"   => GraphLinker.ObservationNodes.map(o => s"$o.${o}_id")
    case "study"         => Seq("consent_group.consent_group_id", "reference_file.reference_file_id")
    case _               => Nil
  }

  /** Canonical content hash of one record (column set = df schema minus
    * provenance), nulls serialized, arrays sorted, fields name-ordered.
    */
  def contentHash(node: String, df: DataFrame): Column = {
    val blankedLists = volatileListFields(node).toSet
    val ownId = NodeType.idProperty(node)
    val fields = df.schema.fields
      .filterNot(_.name.startsWith("__"))
      .sortBy(_.name)
      .map { f =>
        val c = col("`" + f.name + "`")
        val v =
          if (f.name == ownId) lit("")
          else if (blankedLists.contains(f.name)) typedlit(Seq.empty[String])
          else if (node == "reference_file" && f.name == "dcf_indexd_guid") lit("")
          else f.dataType match {
            case _: ArrayType => sort_array(c)
            case _            => c
          }
        v.as(f.name)
      }
    sha1(to_json(struct(fields.toIndexedSeq: _*), Map("ignoreNullFields" -> "false")))
  }

  /** Union per-transformation node frames, keep the first record per
    * (content hash, participant, node) by transformation order. Returns
    * (deduped frame, duplicate report frame for K3).
    *
    * @param frames (transformationName, order, frame) triples
    * @param participantCol per-record participant id column name ('' for
    *        participant-independent nodes like study)
    */
  def dedupe(
      node: String,
      frames: Seq[(String, Int, DataFrame)],
      participantCol: Option[String]): (DataFrame, DataFrame) = {
    require(frames.nonEmpty)
    val tagged = frames.map { case (name, order, df) =>
      df.withColumn("__xform", lit(name)).withColumn("__xorder", lit(order))
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

    val pid = participantCol.map(c => col("`" + c + "`").cast("string"))
      .getOrElse(lit(""))
    val keyed = tagged
      .withColumn("__key", concat_ws("", contentHash(node, tagged), pid, lit(node)))

    val w = Window.partitionBy(col("__key")).orderBy(col("__xorder"), col("__xform"))
    val ranked = keyed.withColumn("__rn", row_number().over(w))

    val deduped = ranked.filter(col("__rn") === 1)
      .drop("__xform", "__xorder", "__key", "__rn")

    val report = keyed
      .groupBy(col("__key"))
      .agg(
        first(pid).as("participant_id"),
        lit(node).as("node"),
        count(lit(1)).as("occurrences"),
        sort_array(collect_set(col("__xform"))).as("transformations"))
      .filter(col("occurrences") > 1)
      .drop("__key")
    (deduped, report)
  }
}
