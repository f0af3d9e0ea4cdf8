package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{C3dcSchema, NodeSpec, PropType}

/** C2: row-level JSON-Schema enforcement as DataFrame filters
  * (reference jsonschema validation: etl/target/c3dc_etl.py:591-628;
  * standalone schema/validate_json.py:53-76).
  *
  * Instead of a driver-side document validator, every constraint becomes a
  * distributed predicate producing a violations frame
  * (node, record id, property, violation, value) — scales to any record
  * count and short-circuits nothing.
  */
object OutputValidator {

  /** Columns a builder may legitimately carry past the schema surface
    * (provenance/audit) — never flagged as unknown properties.
    */
  private val Passthrough =
    Set(graft.sources.SourceReader.FileCol, graft.sources.SourceReader.AuditCol)

  def validateNode(schema: C3dcSchema, node: String, df: DataFrame): DataFrame = {
    val spec = schema.node(node)
    val id = col("`" + spec.idProperty + "`").cast("string")

    def render(name: String): Column = df.schema(name).dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.MapType => to_json(col("`" + name + "`"))
      case _ => col("`" + name + "`").cast("string")
    }

    val known: Seq[(String, Column, Column)] = spec.props
      .filter(p => df.columns.contains(p.name)).flatMap { p =>
        val c = col("`" + p.name + "`")
        val required: Seq[(String, Column, Column)] =
          if (!p.required) Nil
          else Seq((p.name, requiredViolation(p, c), lit("required property blank")))
        val enum: Seq[(String, Column, Column)] =
          if (!p.isEnum) Nil
          else p.typ match {
            case PropType.ArrStr => Seq((p.name,
              c.isNotNull && exists(c, x => !x.isin(p.enumValues.map(lit(_)): _*)),
              lit("value not in enum domain")))
            case _ => Seq((p.name,
              c.isNotNull && !c.isin(p.enumValues.map(lit(_)): _*),
              lit("value not in enum domain")))
          }
        val bounds: Seq[(String, Column, Column)] =
          (p.minimum.map(mn => (p.name, c.isNotNull && c < lit(mn), lit(s"below minimum $mn"))) ++
            p.maximum.map(mx => (p.name, c.isNotNull && c > lit(mx), lit(s"above maximum $mx")))).toSeq
        val unique: Seq[(String, Column, Column)] = p.typ match {
          case PropType.ArrStr => Seq((p.name,
            c.isNotNull && size(c) =!= size(array_distinct(c)),
            lit("array items not unique")))
          case _ => Nil
        }
        required ++ enum ++ bounds ++ unique
      }

    // additionalProperties: false (schema/schema_creator.py:349) — the
    // reference's whole-document validate rejects any key the node spec
    // does not declare, so a column outside the spec flags every record
    val unknown: Seq[(String, Column, Column)] = df.columns.toSeq
      .filterNot(c => spec.props.exists(_.name == c) || Passthrough.contains(c))
      .map(c => (c, lit(true), lit("property not permitted by schema")))

    val violationStructs = (known ++ unknown).map { case (propName, pred, msg) =>
      when(pred, struct(
        lit(node).as("node"),
        id.as("record_id"),
        lit(propName).as("property"),
        msg.as("violation"),
        render(propName).as("value")))
    }
    if (violationStructs.isEmpty)
      return df.sparkSession.emptyDataFrame
    df.select(explode(
      filter(array(violationStructs: _*), x => x.isNotNull)).as("v"))
      .select(col("v.*"))
  }

  private def requiredViolation(p: graft.model.PropSpec, c: Column): Column = p.typ match {
    case PropType.ArrStr =>
      c.isNull || !exists(c, x => x.isNotNull && x =!= lit(""))
    case PropType.Str => c.isNull || c === lit("")
    case _            => c.isNull
  }

  /** Container-shape checks on the harmonized document: a node container
    * the schema does not define, or a container missing its identifier
    * column, is a document-level violation (the reference's root schema
    * rejects both — unknown top-level keys via additionalProperties,
    * malformed containers via the per-node `required`). Driver-side
    * metadata facts (one row per bad CONTAINER, not per record), so the
    * frame is built locally and unions into the distributed violations.
    */
  def validateContainers(schema: C3dcSchema, nodes: Map[String, DataFrame]): DataFrame = {
    require(nodes.nonEmpty, "no nodes to validate")
    val spark = nodes.head._2.sparkSession
    val rows = nodes.toSeq.sortBy(_._1).flatMap { case (n, df) =>
      if (!schema.nodes.contains(n))
        Seq((n, null: String, null: String, "node container not defined by schema", null: String))
      else if (!df.columns.contains(schema.node(n).idProperty))
        Seq((n, null: String, schema.node(n).idProperty,
          "container missing identifier property", null: String))
      else Nil
    }
    import spark.implicits._
    rows.toDF("node", "record_id", "property", "violation", "value")
  }

  /** All nodes' violations unioned with the container-shape checks (the
    * driver assertion point; unknown containers surface here too instead
    * of being silently skipped).
    */
  def validateAll(schema: C3dcSchema, nodes: Map[String, DataFrame]): DataFrame =
    (nodes.collect { case (n, df) if schema.nodes.contains(n) =>
      validateNode(schema, n, df)
    }.filter(_.columns.nonEmpty).toSeq :+ validateContainers(schema, nodes))
      .reduceOption((a, b) => a.unionByName(b))
      .getOrElse(throw new IllegalArgumentException("no nodes to validate"))
}
