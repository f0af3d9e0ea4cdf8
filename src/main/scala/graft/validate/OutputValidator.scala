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

  def validateNode(schema: C3dcSchema, node: String, df: DataFrame): DataFrame = {
    val spec = schema.node(node)
    val id = col("`" + spec.idProperty + "`").cast("string")

    val checks: Seq[(String, Column, Column)] = spec.props
      .filter(p => df.columns.contains(p.name)).flatMap { p =>
        val c = col("`" + p.name + "`")
        val asStr = p.typ match {
          case PropType.ArrStr => to_json(c)
          case _               => c.cast("string")
        }
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
        (required ++ enum ++ bounds ++ unique).map { case (n, pred, msg) =>
          (n, pred, msg)
        }
      }

    val violationStructs = checks.map { case (propName, pred, msg) =>
      when(pred, struct(
        lit(node).as("node"),
        id.as("record_id"),
        lit(propName).as("property"),
        msg.as("violation"),
        (spec.byName(propName).typ match {
          case PropType.ArrStr => to_json(col("`" + propName + "`"))
          case _               => col("`" + propName + "`").cast("string")
        }).as("value")))
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

  /** All nodes' violations unioned (driver assertion point). */
  def validateAll(schema: C3dcSchema, nodes: Map[String, DataFrame]): DataFrame =
    nodes.collect { case (n, df) if schema.nodes.contains(n) =>
      validateNode(schema, n, df)
    }.filter(_.columns.nonEmpty)
      .reduceOption((a, b) => a.unionByName(b))
      .getOrElse(throw new IllegalArgumentException("no nodes to validate"))
}
