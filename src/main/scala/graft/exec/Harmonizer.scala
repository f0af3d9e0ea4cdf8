package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dsl.Transformation
import graft.model.{C3dcSchema, NodeType, PropType}

/** End-to-end orchestration of one transformation over one tabular source:
  * the Spark analogue of the reference's `_transform_source_data`
  * (etl/target/c3dc_etl.py:1462-1625).
  *
  * Plan shape per node type: (optional) sub-source explode → one projection
  * per type group → required filter → union. Graph linking adds one
  * map-side-combined shuffle per relationship. Nothing is collected on the
  * driver; each node frame stays distributed until the sink.
  */
final class Harmonizer(schema: C3dcSchema, xform: Transformation) {
  private val builder = new NodeBuilder(schema, xform)

  /** Explode-eligible output props: single-valued string enums whose PVs
    * don't contain ';' (reference etl/target/c3dc_etl.py:411-429), mapped
    * from a plain source field.
    */
  private def explodeFields(node: String): Seq[(String, String)] =
    xform.mappingsFor(node).filter { m =>
      val p = schema.prop(m.outputField)
      p.typ == PropType.Str && p.isEnum && !p.enumValues.exists(_.contains(";")) &&
        !m.isStringLiteralSource && m.sourceFields.length == 1
    }.map(m => m.property -> m.sourceField)

  private def isSingleton(node: String): Boolean =
    xform.mappingsFor(node).forall(_.isStringLiteralSource)

  /** Source field that carries the node's natural id (drives derived
    * `{id}_{n}` ids for exploded sub-source records).
    */
  private def sourceIdField(node: String): Option[String] =
    xform.mappingsFor(node)
      .find(m => m.property == NodeType.idProperty(node) && !m.isStringLiteralSource
        && m.sourceFields.length == 1)
      .map(_.sourceField)

  /** Structural observation backpointer (reference etl/target/c3dc_etl.py:
    * 1578-1583, etl/ccdi/c3dc_etl.py:1457-1462): every observation record
    * carries `participant.participant_id` — the participant id harmonized
    * from the SAME source row — set by the ENGINE, not by a mapping. The
    * participant id expression is compiled with the participant node's own
    * row key, so `{uuid}`-derived participant ids backlink identically.
    */
  private def participantBackpointer(rowKey: Column): Option[Column] =
    if (!xform.nodeTypes.contains("participant")) None
    else {
      val pKey = sourceIdField("participant")
        .map(f => col("`" + f + "`").cast("string")).getOrElse(rowKey)
      builder.compiledProperty("participant", "participant_id", pKey)
    }

  def buildNode(node: String, source: DataFrame, rowKey: Column): DataFrame = {
    if (isSingleton(node)) {
      // study / consent_group: constants built once per transformation
      // (reference :1516-1537), not once per source row
      val one = source.sparkSession.range(1).toDF("__one")
      return builder.build(node, one, lit("singleton"))
    }
    // Reference row-skip (etl/target/c3dc_etl.py:1549-1558): a source row
    // whose participant build yields != 1 record is excluded WHOLE — it
    // contributes no participant and no observation records (which would
    // otherwise dangle). The participant record count is a row-local
    // function of the source row (type-group admission; the reference
    // builds participants from the raw record, sub-source explode applies
    // to observations only), so the rule compiles to a filter pushed into
    // each scan — never a join against the built participant frame.
    // Applies to the tabular path only: workbook observations build from
    // per-tab frames whose rows don't correspond to participant rows.
    val skipped =
      if ((node == "participant" || GraphLinker.ObservationNodes.contains(node))
          && xform.nodeTypes.contains("participant")) {
        val pKey = sourceIdField("participant")
          .map(f => col("`" + f + "`").cast("string")).getOrElse(rowKey)
        source.filter(builder.admittedGroupCount("participant", pKey) === 1)
      } else source
    val idField = sourceIdField(node)
    val exploded = explodeFields(node).foldLeft(skipped) { case (df, (_, srcField)) =>
      idField match {
        case Some(id) => SubSourceExploder.explode(df, srcField, id)
        case None     => df
      }
    }
    // exploded rows must also derive a distinct row key: reuse the (suffixed)
    // source id field when available, else the raw row key
    val key = idField.map(f => col("`" + f + "`").cast("string")).getOrElse(rowKey)
    // engine-set backpointer, unless the transformation maps it itself
    val pass: Seq[(String, Column)] =
      if (GraphLinker.ObservationNodes.contains(node)
          && !xform.mappingsFor(node).exists(_.property == "participant.participant_id"))
        participantBackpointer(rowKey)
          .map(c => "participant.participant_id" -> c).toSeq
      else Nil
    builder.build(node, exploded, key, pass)
  }

  /** Build every node type in the transformation and link the graph
    * (reference linking: etl/target/c3dc_etl.py:1516-1594).
    *
    * Singleton nodes (study, consent_group) are 1-row constant frames; their
    * ids are read once on the driver (trivial action) and injected into the
    * distributed frames as literals — the all-to-one "joins" J2 never touch
    * the cluster. Child-id rollups stay distributed (collect_list shuffles
    * with map-side partial aggregation).
    */
  def harmonize(source: DataFrame, rowKey: Column): Map[String, DataFrame] =
    linkGraph(xform.nodeTypes.map(n => n -> buildNode(n, source, rowKey)).toMap)

  /** CCDI mode: each node builds from its tab-resolved workbook frame
    * (graft.dsl.TabResolver) — singleton nodes still come from constants —
    * then the same graph linking applies.
    */
  def harmonizeWorkbook(workbook: Map[String, DataFrame]): Map[String, DataFrame] =
    linkGraph(xform.nodeTypes.map { n =>
      n -> (if (isSingleton(n))
        buildNode(n, workbook.values.head, lit("singleton"))
      else graft.dsl.TabResolver.buildNode(schema, xform, n, workbook))
    }.toMap)

  /** Graph linking over already-built node frames (second half of the
    * reference's `_transform_source_data`, shared by the tabular and
    * workbook paths).
    */
  def linkGraph(built0: Map[String, DataFrame]): Map[String, DataFrame] = {
    var built: Map[String, DataFrame] = built0

    val cgId: Option[String] = built.get("consent_group")
      .map(_.select(col("consent_group_id")).head.getString(0))
    val studyId: Option[String] = built.get("study")
      .map(_.select(col("study_id")).head.getString(0))

    def fk(node: String): String = s"$node.${node}_id"
    def hasFk(node: String, target: String): Boolean =
      schema.nodes.get(node).exists(_.byName.contains(fk(target)))

    // observations → participant: id-list rollups (A1); only relationships
    // the schema declares are materialized
    val observations = built.view.filterKeys { n =>
      GraphLinker.ObservationNodes.contains(n) && hasFk("participant", n)
    }.toMap
    if (built.contains("participant")) {
      var part = GraphLinker.linkObservationsToParticipant(built("participant"), observations)
      cgId.filter(_ => hasFk("participant", "consent_group"))
        .foreach(id => part = part.withColumn(fk("consent_group"), lit(id)))
      studyId.filter(_ => hasFk("participant", "study"))
        .foreach(id => part = part.withColumn(fk("study"), lit(id)))
      built = built.updated("participant", part)
    }

    // consent_group: accumulate participant ids; point at study
    for (cg <- built.get("consent_group")) {
      var df = cg
      if (built.contains("participant") && hasFk("consent_group", "participant"))
        df = df.crossJoin(built("participant")
          .agg(sort_array(collect_list(col("participant_id"))).as(fk("participant"))))
      studyId.filter(_ => hasFk("consent_group", "study"))
        .foreach(id => df = df.withColumn(fk("study"), lit(id)))
      built = built.updated("consent_group", df)
    }

    // reference_file: point at study
    for (rf <- built.get("reference_file"); id <- studyId; if hasFk("reference_file", "study"))
      built = built.updated("reference_file", rf.withColumn(fk("study"), lit(id)))

    // study: accumulate consent_group + reference_file id lists
    for (st <- built.get("study")) {
      var df = st
      cgId.filter(_ => hasFk("study", "consent_group"))
        .foreach(id => df = df.withColumn(fk("consent_group"), typedlit(Seq(id))))
      if (built.contains("reference_file") && hasFk("study", "reference_file"))
        df = df.crossJoin(built("reference_file")
          .agg(sort_array(collect_list(col("reference_file_id"))).as(fk("reference_file"))))
      built = built.updated("study", df)
    }
    built
  }
}
