package graft.dsl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One ordered replacement rule (reference mapping DSL: the JSON files under
  * etl/target/transformations/; loader etl/target/c3dc_etl.py:331-386).
  *
  * `oldValue`: "*" always matches; "+" matches nonblank; literal matches by
  * casefolded-trimmed equality; for compound sources, `;`-separated ordinals.
  * `newValue`: literal string / list of strings, or a macro (`{uuid}`,
  * `{field:NAME}`, `{sum}`, `{race}`, `{find_enum_value}`, ...).
  */
final case class Replacement(oldValue: String, newValue: ReplacementValue)

sealed trait ReplacementValue
object ReplacementValue {
  final case class Scalar(v: String) extends ReplacementValue
  final case class Arr(vs: Seq[String]) extends ReplacementValue
}

/** One field mapping: `output_field` = "node.prop"; `source_field` is a
  * header name, "[string_literal]", or compound "[f1, f2]";
  * `typeGroupIndexes` replicates the record-per-group semantics
  * (reference: etl/target/c3dc_etl.py:1127-1187). "*" = all groups.
  */
final case class Mapping(
    outputField: String,
    sourceField: String,
    typeGroupIndex: String = "*",
    defaultValue: Option[ReplacementValue] = None,
    replacements: Seq[Replacement] = Nil) {

  def nodeType: String = outputField.split("\\.", 2)(0)
  def property: String = outputField.split("\\.", 2)(1)

  def isStringLiteralSource: Boolean = sourceField == "[string_literal]"

  /** Compound "[f1, f2]" → Seq(f1, f2); plain name → Seq(name). */
  def sourceFields: Seq[String] =
    if (sourceField.startsWith("[") && sourceField.endsWith("]") && !isStringLiteralSource)
      sourceField.stripPrefix("[").stripSuffix("]").split(",").map(_.trim).toSeq
    else Seq(sourceField)

  def typeGroupIndexes: Seq[String] =
    typeGroupIndex.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

final case class Transformation(
    name: String,
    uuidSeed: String,
    mappings: Seq[Mapping]) {

  def mappingsFor(node: String): Seq[Mapping] =
    mappings.filter(_.nodeType == node)

  def nodeTypes: Seq[String] = mappings.map(_.nodeType).distinct
}

/** JSON codec for the transformation config
  * (shape: FIXTURES.md §2; reference loader etl/target/c3dc_etl.py:331-386).
  */
object TransformationSpec {
  private val mapper = new ObjectMapper()

  /** Accepts a local path, `file://`, `hdfs://`/`s3a://`, or an http(s)
    * URL (S8 remote transformation fetch — [[graft.sources.FileFetcher]]).
    */
  def fromFile(location: String): Seq[Transformation] =
    fromJson(graft.sources.FileFetcher.fetchString(location))

  def fromJson(json: String): Seq[Transformation] = {
    val root = mapper.readTree(json)
    Option(root.get("transformations")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq(root))
      .map(parseTransformation)
  }

  private def parseTransformation(t: JsonNode): Transformation =
    Transformation(
      name = Option(t.get("name")).map(_.asText()).getOrElse("unnamed"),
      uuidSeed = Option(t.get("uuid_seed")).map(_.asText()).getOrElse(""),
      mappings = Option(t.get("mappings")).map(_.elements().asScala.toSeq)
        .getOrElse(Nil).map(parseMapping))

  private def parseMapping(m: JsonNode): Mapping = {
    // C1 startup validation: a mapping without a well-formed output_field
    // is a config error with a message, never an NPE/MatchError later
    val of = Option(m.get("output_field")).filterNot(_.isNull).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        s"mapping missing output_field: $m"))
    val parts = of.split("\\.", 2)
    require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
      s"output_field must be 'node.property', got '$of'")
    Mapping(
      outputField = of,
      sourceField = Option(m.get("source_field")).map(_.asText()).getOrElse("[string_literal]"),
      typeGroupIndex = Option(m.get("type_group_index"))
        .filterNot(_.isNull).map(_.asText()).getOrElse("*"),
      defaultValue = Option(m.get("default_value")).filterNot(_.isNull).map(parseValue),
      replacements = Option(m.get("replacement_values")).map(_.elements().asScala.toSeq)
        .getOrElse(Nil).map { r =>
          Replacement(
            oldValue = Option(r.get("old_value")).filterNot(_.isNull)
              .map(_.asText()).getOrElse("*"),
            newValue = Option(r.get("new_value")).filterNot(_.isNull)
              .map(parseValue).getOrElse(ReplacementValue.Scalar("")))
        })
  }

  private def parseValue(n: JsonNode): ReplacementValue =
    if (n.isArray) ReplacementValue.Arr(n.elements().asScala.map(_.asText()).toSeq)
    else ReplacementValue.Scalar(n.asText())
}
