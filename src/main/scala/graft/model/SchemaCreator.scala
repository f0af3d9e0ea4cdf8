package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Schema compiler: MDF-style YAML model (nodes + props sources) → the
  * JSON schema the engine loads (reference schema/schema_creator.py).
  *
  * Faithful semantics:
  *  - property type: `Type` string lowercased; `{value_type: list}` →
  *    `array` (else the value_type); Enum-only props are strings
  *    (schema_creator.py:498-531);
  *  - permissible values from `Enum` or a list Type's `item_type`, with
  *    `[---- … ----]` section-header entries dropped and non-ASCII values
  *    rejected (:533-560, :105-106, :466-489);
  *  - integer bounds: `file_size` min 0, `age_at*`/`*_age_at_*` max 54750
  *    = 365×150 (:461-465). NOTE the reference writes the misspelled key
  *    `mininum` (so the bound is never enforced); this compiler emits the
  *    CORRECT `minimum` — an intentional fix, covered by a spec;
  *  - array enums get `uniqueItems: true` (:491-493);
  *  - relationships become embedded id props `{remote}.{remote}_id` on
  *    BOTH endpoint nodes: `string` for to-one, `array[string]` for
  *    to-many, from the `Mul` spec (:371-420);
  *  - required = node Props ∩ PropDefinitions with `Req: true` (:422-431);
  *  - root container holds one pluralized array property per node
  *    (y→ies, sis→ses, else +s, :134-143).
  *
  * Driver-side plan-time tooling (models are hundreds of lines of YAML);
  * the output round-trips through [[SchemaLoader]].
  */
object SchemaCreator {

  private val yaml = new ObjectMapper(new YAMLFactory())
  private val json = new ObjectMapper()

  val MaxAgeDays = 54750 // 365 * 150
  private val HeaderPrefix = "[---- "
  private val HeaderSuffix = " ----]"

  def pluralize(name: String): String =
    if (name.endsWith("y")) name.dropRight(1) + "ies"
    else if (name.endsWith("sis")) name.dropRight(3) + "ses"
    else name + "s"

  /** Compile the two YAML sources to a JSON schema string (root `$defs`
    * per node + pluralized root container under `SCHEMA_ROOT_NODE`
    * semantics with node name `rootNode`).
    */
  def createSchemaJson(nodesYaml: String, propsYaml: String, rootNode: String = "nodes"): String = {
    val nodesSrc = yaml.readTree(nodesYaml)
    val propsSrc = yaml.readTree(propsYaml)
    val propDefs = propsSrc.get("PropDefinitions")
    require(propDefs != null, "props source has no PropDefinitions")
    val nodes = nodesSrc.get("Nodes")
    require(nodes != null, "nodes source has no Nodes")

    val root = json.createObjectNode()
    val defs = root.putObject("$defs")

    val nodeNames = nodes.fieldNames().asScala.toSeq
    require(!nodeNames.contains(rootNode),
      s"root node container name $rootNode already defined in YAML source")

    nodeNames.foreach { nodeName =>
      val nodeObj = nodes.get(nodeName)
      val nodeSchema = defs.putObject(nodeName)
      nodeSchema.put("type", "object")
      nodeSchema.put("additionalProperties", false)
      val props = nodeSchema.putObject("properties")
      val required = json.createArrayNode()
      nodeObj.get("Props").elements().asScala.foreach { p =>
        val propName = p.asText()
        val propObj = propDefs.get(propName)
        require(propObj != null,
          s"node '$nodeName': property '$propName' not found in props source")
        props.set[JsonNode](propName, propertySchema(propName, propObj))
        if (propObj.path("Req").asBoolean(false)) required.add(propName)
      }
      if (required.size() > 0) nodeSchema.set[JsonNode]("required", required)
    }

    // relationships → embedded id props on both endpoints
    Option(nodesSrc.get("Relationships")).foreach { rels =>
      rels.properties().asScala.foreach { e =>
        val mul = e.getValue.get("Mul").asText()
        val srcMul = mul.split("_to_").head.toLowerCase
        val dstMul = mul.split("_to_").last.toLowerCase
        e.getValue.get("Ends").elements().asScala.foreach { end =>
          val src = end.get("Src").asText()
          val dst = end.get("Dst").asText()
          Seq((src, dst, dstMul), (dst, src, srcMul)).foreach {
            case (local, remote, remoteMul) =>
              require(defs.has(local) && defs.has(remote),
                s"relationship ${e.getKey}: unknown node in ($src, $dst)")
              val rel = relationshipSchema(remoteMul, e.getKey)
              defs.get(local).get("properties").asInstanceOf[ObjectNode]
                .set[JsonNode](s"$remote.${remote}_id", rel)
          }
        }
      }
    }

    // pluralized root container with an array property per node
    val rootSchema = defs.putObject(rootNode)
    rootSchema.put("type", "object")
    val rootProps = rootSchema.putObject("properties")
    nodeNames.sorted.foreach { n =>
      val arr = rootProps.putObject(pluralize(n))
      arr.put("type", "array")
      arr.putObject("items").put("$ref", s"#/$$defs/$n")
    }
    json.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Compile + load in one step. */
  def create(nodesYaml: String, propsYaml: String): C3dcSchema =
    SchemaLoader.fromJson(createSchemaJson(nodesYaml, propsYaml))

  private def propertySchema(name: String, obj: JsonNode): ObjectNode = {
    val out = json.createObjectNode()
    val typ = propertyType(name, obj)
    out.put("type", typ)
    if (typ == "integer") {
      if (name == "file_size") out.put("minimum", 0)
      if (name.startsWith("age_at") || name.contains("_age_at_"))
        out.put("maximum", MaxAgeDays)
    }
    val pvs = permissibleValues(name, obj)
    pvs.foreach { pv =>
      require(pv.forall(_ < 128),
        s"Non-ascii character(s) found in permissible value for property '$name': '$pv'")
    }
    if (pvs.nonEmpty) {
      if (typ == "array") {
        out.put("uniqueItems", true)
        val items = out.putObject("items")
        items.put("type", "string")
        val en = items.putArray("enum")
        pvs.foreach(en.add)
      } else {
        val en = out.putArray("enum")
        pvs.foreach(en.add)
      }
    }
    out
  }

  private def propertyType(name: String, obj: JsonNode): String = {
    val t = obj.get("Type")
    if (t == null && obj.has("Enum")) "string"
    else if (t != null && t.isTextual) t.asText().toLowerCase
    else if (t != null && t.isObject) {
      val vt = t.path("value_type").asText("")
      require(vt.nonEmpty,
        s"YAML property '$name' sub-property Type has no value_type")
      if (vt == "list") "array" else vt
    } else throw new IllegalArgumentException(
      s"YAML property '$name' does not have Type or Enum defined")
  }

  private def permissibleValues(name: String, obj: JsonNode): Seq[String] = {
    val raw: Seq[String] =
      if (obj.has("Enum")) obj.get("Enum").elements().asScala.map(_.asText()).toSeq
      else {
        val t = obj.get("Type")
        if (t != null && t.isObject && t.path("value_type").asText("") == "list"
            && t.has("item_type")) {
          val vs = t.get("item_type").elements().asScala.map(_.asText()).toSeq
          require(vs.distinct.size == vs.size,
            s"YAML property '$name' contains duplicate permissible values")
          vs
        } else Nil
      }
    raw.filterNot(v => v.startsWith(HeaderPrefix) && v.endsWith(HeaderSuffix))
  }

  private def relationshipSchema(remoteMul: String, relName: String): ObjectNode = {
    val out = json.createObjectNode()
    remoteMul match {
      case "one" => out.put("type", "string")
      case "many" =>
        out.put("type", "array")
        out.putObject("items").put("type", "string")
      case other => throw new IllegalArgumentException(
        s"Unsupported relationship multiplicity: $other (relationship $relName)")
    }
    out
  }
}
