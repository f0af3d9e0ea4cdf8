package graft.validate

import org.apache.spark.sql.DataFrame

import graft.model.{C3dcSchema, NodeType, PropType}

/** Reference-style validator log lines — the opt-in parity layer for users
  * who diff harmonized-output validation logs against the reference's
  * (etl/target/c3dc_etl.py:625-628 logs one
  * `{json_path}: {message}` line per `iter_errors` violation;
  * schema/validate_json.py:53-76 logs the first message). The violation
  * DETECTION stays the distributed `OutputValidator` predicates — this
  * layer only renders that frame in the jsonschema Draft-2020-12 message
  * idiom, driver-side, over the same node map the document sink receives:
  *
  *   $.participants[3].sex_at_birth: 'Unknown' is not one of ['Female', 'Male']
  *   $.participants[3]: 'race' is a required property
  *   $.participants[4]: Additional properties are not allowed ('extra' was unexpected)
  *
  * Record indexes are positions in the EMITTED document (the same
  * DataFrame order `HarmonizedJsonSink.document` serializes), so a line
  * here points at the same array slot a reference-side validator would
  * flag in the written JSON. Line order is deterministic: container name,
  * then record index, then property position in the node spec (unknown
  * properties last) — message TEXT is the parity contract, not the python
  * library's keyword interleaving.
  */
object ReferenceMessages {

  /** python repr() of a string: single-quoted, backslash and quote
    * escaped (double-quote fallback when the value contains a single
    * quote but no double quote, matching repr's preference).
    */
  private[validate] def pyRepr(s: String): String =
    if (s.contains("'") && !s.contains("\""))
      "\"" + s.replace("\\", "\\\\") + "\""
    else "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def pyReprList(vs: Seq[String]): String =
    vs.map(pyRepr).mkString("[", ", ", "]")

  /** All violations of one harmonized node map, reference-log lines in
    * deterministic order. Containers the schema does not define render as
    * the root-level additionalProperties message.
    */
  def forDocument(schema: C3dcSchema, nodes: Map[String, DataFrame]): Seq[String] =
    nodes.toSeq.sortBy(_._1).flatMap { case (node, df) =>
      if (!schema.nodes.contains(node))
        Seq(s"$$: Additional properties are not allowed " +
          s"(${pyRepr(NodeType.pluralize(node))} was unexpected)")
      else forNode(schema, node, df)
    }

  def forNode(schema: C3dcSchema, node: String, df: DataFrame): Seq[String] = {
    val spec = schema.node(node)
    val plural = NodeType.pluralize(node)
    // document position of each record id: same DataFrame order the
    // document sink serializes (deterministic plans collect identically)
    val idx: Map[String, Int] = df
      .select(org.apache.spark.sql.functions.col("`" + spec.idProperty + "`").cast("string"))
      .collect().map(_.getString(0)).zipWithIndex.toMap
    val propPos: Map[String, Int] = spec.props.map(_.name).zipWithIndex.toMap

    val rows = OutputValidator.validateNode(schema, node, df).collect()
    val keyed = rows.toSeq.flatMap { r =>
      val prop = r.getAs[String]("property")
      val violation = r.getAs[String]("violation")
      val value = r.getAs[String]("value")
      val i = idx.getOrElse(r.getAs[String]("record_id"), -1)
      val recPath = s"$$.$plural[$i]"
      val p = spec.byName.get(prop)
      def reprScalar: String = p.map(_.typ) match {
        case Some(PropType.Str) | None => pyRepr(value)
        case _ => value // integers/numbers repr as themselves
      }
      val lines: Seq[String] = violation match {
        case "required property blank" =>
          Seq(s"$recPath: ${pyRepr(prop)} is a required property")
        case "property not permitted by schema" =>
          Seq(s"$recPath: Additional properties are not allowed (${pyRepr(prop)} was unexpected)")
        case "value not in enum domain" =>
          val dom = pyReprList(p.map(_.enumValues).getOrElse(Nil))
          p.map(_.typ) match {
            case Some(PropType.ArrStr) =>
              // jsonschema flags each offending ELEMENT with its own index
              val elems = parseJsonStringArray(value)
              val allowed = p.map(_.enumValues.toSet).getOrElse(Set.empty)
              elems.zipWithIndex.filterNot { case (e, _) => allowed.contains(e) }
                .map { case (e, j) =>
                  s"$recPath.$prop[$j]: ${pyRepr(e)} is not one of $dom" }
            case _ =>
              Seq(s"$recPath.$prop: $reprScalar is not one of $dom")
          }
        case v if v.startsWith("below minimum ") =>
          Seq(s"$recPath.$prop: $reprScalar is less than the minimum of ${v.stripPrefix("below minimum ")}")
        case v if v.startsWith("above maximum ") =>
          Seq(s"$recPath.$prop: $reprScalar is greater than the maximum of ${v.stripPrefix("above maximum ")}")
        case "array items not unique" =>
          Seq(s"$recPath.$prop: ${pyReprList(parseJsonStringArray(value))} has non-unique elements")
        case other =>
          Seq(s"$recPath.$prop: $other") // future violation kinds degrade readably
      }
      lines.map(l => (i, propPos.getOrElse(prop, Int.MaxValue), l))
    }
    keyed.sortBy { case (i, pp, l) => (i, pp, l) }.map(_._3)
  }

  /** The violations frame renders array values with `to_json` — recover
    * the elements for per-element messages.
    */
  private[validate] def parseJsonStringArray(json: String): Seq[String] = {
    if (json == null) return Nil
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    if (node == null || !node.isArray) Nil
    else {
      import scala.jdk.CollectionConverters._
      node.elements().asScala.map(_.asText()).toSeq
    }
  }
}
