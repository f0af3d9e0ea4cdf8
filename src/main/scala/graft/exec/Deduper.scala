package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType}

import graft.model.NodeType

/** A7: cross-file deduplication
  * (reference etl/target/c3dc_etl.py:1926-2124; key normalization :278-329).
  *
  * Identity = the NORMALIZED CONTENT of the record with volatile fields
  * blanked per node type (own id always; parents' child-id lists; reference
  * file guid), keyed with (participant_id, node). First occurrence by
  * transformation order wins.
  *
  * The reference hashes that normalized content (sha1 of a canonical JSON)
  * because its identity is a python dict key — a driver-side cache needs a
  * compact scalar. A distributed group-by does not: Spark aggregates on the
  * normalized struct DIRECTLY ([[contentKey]]), which is (a) exact at any
  * corpus size — no hash, not even a cryptographic one, is collision-free
  * over 10^11 records, while struct equality is bytewise on the UnsafeRow —
  * and (b) far cheaper per row: sha1(to_json(...)) serializes every record
  * to a JSON string and runs a crypto digest over it, which at the 100 TB
  * target is pure overhead the decade gate measured as the suite ceiling
  * (SCALE.md: a7 at sf100). [[contentHash]] (sha1 canonical JSON, bit-
  * compatible with the reference idiom) remains for EXTERNALLY VISIBLE
  * fingerprints — sinks or reports that must interop with reference
  * artifacts — just never as the shuffle key.
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

  /** Normalized content fields of one record (column set = df schema minus
    * provenance), arrays sorted, volatile fields blanked, name-ordered.
    */
  private def normalizedFields(node: String, df: DataFrame): Seq[Column] = {
    val blankedLists = volatileListFields(node).toSet
    val ownId = NodeType.idProperty(node)
    df.schema.fields
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
      }.toIndexedSeq
  }

  /** Canonical content hash of one record — the reference's externally
    * visible fingerprint idiom (sha1 of name-ordered canonical JSON, nulls
    * serialized). Use ONLY where the fingerprint itself is output; for
    * grouping use [[contentKey]].
    */
  def contentHash(node: String, df: DataFrame): Column =
    sha1(to_json(struct(normalizedFields(node, df): _*),
      Map("ignoreNullFields" -> "false")))

  /** Exact dedup identity: the normalized content itself as a struct.
    * Grouping on it is bytewise-exact (no collision exposure at any scale)
    * and skips the JSON serialization + crypto digest per row. Struct
    * grouping requires orderable types, so any MapType field falls back to
    * its canonical JSON form (maps don't occur in reference node schemas;
    * the guard keeps the operator total).
    */
  def contentKey(node: String, df: DataFrame): Column = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: MapType         => true
      case a: ArrayType       => hasMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case _                  => false
    }
    val fields = normalizedFields(node, df).zip(
      df.schema.fields.filterNot(_.name.startsWith("__")).sortBy(_.name))
      .map {
        case (c, f) if hasMap(f.dataType) =>
          to_json(c, Map("ignoreNullFields" -> "false")).as(f.name)
        case (c, _) => c
      }
    struct(fields.toIndexedSeq: _*)
  }

  /** Union per-transformation node frames, keep the first record per
    * (content key, participant) by transformation order. Returns
    * (deduped frame, duplicate report frame for K3).
    *
    * Survivor selection is `min(struct(order, xform, record))` per content
    * key — a hash aggregate, so duplicates COMBINE MAP-SIDE: the shuffle
    * carries one candidate per key per map partition and nothing is sorted
    * (the earlier row_number window shipped and sorted every record; at a
    * 10× duplication factor that is 10× the necessary shuffle volume).
    * `(order, xform)` ties — identical content twice in ONE transformation
    * — fall through to the record's own fields, which is deterministic
    * where the window's tie order was not.
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
    val recordCols = tagged.columns.filterNot(_.startsWith("__")).toIndexedSeq
    val keyed = tagged
      .withColumn("__key", struct(contentKey(node, tagged).as("content"), pid.as("pid")))

    val rec = struct(recordCols.map(n => col("`" + n + "`").as(n)): _*)
    val deduped = keyed
      .groupBy(col("__key"))
      .agg(min(struct(col("__xorder"), col("__xform"), rec.as("rec"))).as("__top"))
      .select(recordCols.map(n => col("__top").getField("rec").getField(n).as(n)): _*)

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

  /** Merged-output PARTICIPANT semantics (reference
    * `_create_merged_json_etl_file`, etl/target/c3dc_etl.py:2180-2187 with
    * :1971-2046): ONE record per participant id across transformations —
    * the first transformation's record wins WHOLE; later transformations
    * contribute only their non-duplicate observations (which ride the
    * observation frames through [[dedupe]]), never a rewritten participant
    * record. Content plays no part in this key, unlike [[dedupe]]: two
    * files describing the same id with different field values still merge
    * to the first file's record.
    *
    * Same map-side-combining `min(struct)` aggregate shape as [[dedupe]] —
    * at 100 TB the shuffle carries one candidate per id per map partition.
    * The report lists ids contributed by more than one DISTINCT
    * transformation (the reference logs these as merge updates,
    * `_update_participant_in_merged_data_set`; this engine reports them) —
    * one transformation repeating an id is a duplicate-id problem A2
    * surfaces, not a merge update, so it must not fire here.
    */
  def dedupeById(
      node: String,
      frames: Seq[(String, Int, DataFrame)],
      idCol: String): (DataFrame, DataFrame) = {
    require(frames.nonEmpty)
    val tagged = frames.map { case (name, order, df) =>
      df.withColumn("__xform", lit(name)).withColumn("__xorder", lit(order))
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    val recordCols = tagged.columns.filterNot(_.startsWith("__")).toIndexedSeq
    val id = col("`" + idCol + "`").cast("string")
    val rec = struct(recordCols.map(n => col("`" + n + "`").as(n)): _*)
    val deduped = tagged
      .groupBy(id.as("__id"))
      .agg(min(struct(col("__xorder"), col("__xform"), rec.as("rec"))).as("__top"))
      .select(recordCols.map(n => col("__top").getField("rec").getField(n).as(n)): _*)
    val report = tagged
      .groupBy(id.as("participant_id"))
      .agg(
        lit(node).as("node"),
        count(lit(1)).as("occurrences"),
        sort_array(collect_set(col("__xform"))).as("transformations"))
      .filter(size(col("transformations")) > 1)
    (deduped, report)
  }
}
