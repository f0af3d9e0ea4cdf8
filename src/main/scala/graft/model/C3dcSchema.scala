package graft.model

import org.apache.spark.sql.types._

/** Output property type (reference type map:
  * etl/target/c3dc_etl.py:91-96 — string | integer | number | array).
  */
sealed trait PropType
object PropType {
  case object Str extends PropType
  case object Int extends PropType
  case object Num extends PropType
  case object ArrStr extends PropType

  def toSpark(t: PropType): DataType = t match {
    case Str    => StringType
    case Int    => LongType
    case Num    => DoubleType
    case ArrStr => ArrayType(StringType, containsNull = false)
  }
}

/** One schema property: type, optional enum domain, required flag, integer
  * bounds (reference: schema/schema_creator.py:432-559).
  */
final case class PropSpec(
    name: String,
    typ: PropType,
    enumValues: Seq[String] = Nil,
    required: Boolean = false,
    minimum: Option[Long] = None,
    maximum: Option[Long] = None) {

  def isEnum: Boolean = enumValues.nonEmpty

  /** casefolded value → canonical schema casing
    * (reference enum canonicalization: etl/target/c3dc_etl.py:750-764).
    */
  lazy val canonicalByLower: Map[String, String] =
    enumValues.map(v => v.trim.toLowerCase -> v).toMap

  /** code → full PV: the prefix before ' : ' (the whole value when the
    * separator is absent — python str.partition semantics), raw-keyed with
    * no trim/casefold (reference: etl/target/c3dc_etl.py:431-437).
    */
  lazy val codeToValue: Map[String, String] =
    enumValues.map(v => v.split(" : ", 2)(0) -> v).toMap
}

/** One node type's compiled shape. */
final case class NodeSpec(name: String, props: Seq[PropSpec]) {
  lazy val byName: Map[String, PropSpec] = props.map(p => p.name -> p).toMap
  lazy val requiredProps: Seq[String] = props.filter(_.required).map(_.name)
  def idProperty: String = NodeType.idProperty(name)

  /** Spark output schema for this node (column order = schema order). */
  def structType: StructType =
    StructType(props.map(p => StructField(p.name, PropType.toSpark(p.typ))))
}

/** The compiled data model: the Spark analogue of the reference's cached
  * JSON-schema `$defs` (reference: etl/target/c3dc_etl.py:388-439).
  */
final case class C3dcSchema(nodes: Map[String, NodeSpec]) {
  def node(name: String): NodeSpec =
    nodes.getOrElse(name, throw new IllegalArgumentException(s"unknown node type: $name"))

  def prop(outputField: String): PropSpec = outputField.split("\\.", 2) match {
    // a dot-less / empty-part field must be a clean config error, not a
    // MatchError panic (C1 startup validation contract)
    case Array(n, p) if n.nonEmpty && p.nonEmpty =>
      node(n).byName.getOrElse(p,
        throw new IllegalArgumentException(s"unknown property: $outputField"))
    case _ => throw new IllegalArgumentException(
      s"output_field must be 'node.property', got '$outputField'")
  }
}
