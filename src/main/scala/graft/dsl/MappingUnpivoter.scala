package graft.dsl

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import graft.model.C3dcSchema

/** V3: the mapping-sheet unpivoter
  * (reference mapping_unpivoter/mapping_unpivoter.py:221-305,463-500).
  *
  * Harmonization analysts author mappings as a WIDE spreadsheet — one row
  * per replacement pair with `Target Variable Name`, `Source Variable
  * Name`, `Type Group Index`, `Default Value If Null/Blank`, and either a
  * `Replacement Values` JSON list or a Source/Target permissible-value
  * term pair. This tool unpivots those rows into the engine's
  * transformation JSON: rows MERGE into one mapping per
  * (output_field, type_group_index) with replacement pairs appended in
  * sheet order, a single consistent source field, and consistent
  * defaults; target variables are validated against the schema.
  *
  * Plan-time config tooling — mapping programs are hundreds of rows, so
  * this is plain driver-side Scala, mirroring the reference's design.
  */
object MappingUnpivoter {

  /** One sheet row (blank strings = absent, like an empty spreadsheet
    * cell).
    */
  final case class SheetRow(
      targetVariable: String,
      sourceVariable: String = "",
      typeGroupIndex: String = "*",
      defaultValue: String = "",
      replacementValuesJson: String = "",
      sourcePvTerm: String = "",
      targetPvTerm: String = "")

  private val mapper = new ObjectMapper()

  /** Unpivot sheet rows into merged mappings, validating against the
    * schema (reference :234-295 merge rules, :463-500 row parse).
    */
  def unpivot(rows: Seq[SheetRow], schema: C3dcSchema): Seq[Mapping] = {
    rows.foreach { r =>
      val parts = r.targetVariable.split("\\.", 2)
      require(parts.length == 2,
        s"target variable '${r.targetVariable}' is not node.property")
      val props = schema.node(parts(0)).byName.keySet
      require(props.contains(parts(1)),
        s"target variable '${r.targetVariable}' not in schema (${parts(0)} has $props)")
    }
    // groupBy preserving first-appearance order of (field, tgi)
    val keys = rows.map(r => (r.targetVariable, r.typeGroupIndex)).distinct
    keys.map { case (tv, tgi) =>
      val group = rows.filter(r => r.targetVariable == tv && r.typeGroupIndex == tgi)
      val sources = group.map(_.sourceVariable).filter(_.nonEmpty).distinct
      require(sources.size <= 1,
        s"mapping $tv[$tgi] has conflicting source fields: $sources")
      val defaults = group.map(_.defaultValue).filter(_.nonEmpty).distinct
      require(defaults.size <= 1,
        s"mapping $tv[$tgi] has conflicting defaults: $defaults")
      val reps = group.flatMap { r =>
        val fromJson =
          if (r.replacementValuesJson.trim.isEmpty) Nil
          else mapper.readTree(r.replacementValuesJson).elements().asScala.toSeq.map { n =>
            Replacement(
              Option(n.get("old_value")).map(_.asText()).getOrElse("*"),
              ReplacementValue.Scalar(
                Option(n.get("new_value")).map(_.asText()).getOrElse("")))
          }
        val fromPvPair =
          if (r.sourcePvTerm.isEmpty && r.targetPvTerm.isEmpty) Nil
          else Seq(Replacement(r.sourcePvTerm, ReplacementValue.Scalar(r.targetPvTerm)))
        fromJson ++ fromPvPair
      }
      Mapping(
        outputField = tv,
        sourceField = sources.headOption.getOrElse("[string_literal]"),
        typeGroupIndex = tgi,
        defaultValue = defaults.headOption.map(ReplacementValue.Scalar),
        replacements = reps)
    }
  }

  /** Serialize mappings as the transformation JSON the engine loads —
    * round-trips through TransformationSpec.fromJson (spec-asserted).
    */
  def toTransformationJson(name: String, uuidSeed: String, mappings: Seq[Mapping]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def value(v: ReplacementValue): String = v match {
      case ReplacementValue.Scalar(s) => q(s)
      case ReplacementValue.Arr(vs) => vs.map(q).mkString("[", ",", "]")
    }
    val ms = mappings.map { m =>
      val reps = m.replacements.map(r =>
        s"""{"old_value": ${q(r.oldValue)}, "new_value": ${value(r.newValue)}}""")
        .mkString("[", ", ", "]")
      val default = m.defaultValue.map(d => s""", "default_value": ${value(d)}""").getOrElse("")
      s"""{"output_field": ${q(m.outputField)}, "source_field": ${q(m.sourceField)},
         | "type_group_index": ${q(m.typeGroupIndex)}$default,
         | "replacement_values": $reps}""".stripMargin
    }.mkString("[", ",\n", "]")
    s"""{"name": ${q(name)}, "uuid_seed": ${q(uuidSeed)}, "mappings": $ms}"""
  }
}
