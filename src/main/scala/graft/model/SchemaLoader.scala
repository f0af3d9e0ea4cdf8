package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Compiles a JSON-Schema document (the reference's `schema/schema.json`
  * shape: root + `$defs` of node objects, reference:
  * schema/schema_creator.py:244-294) into a [[C3dcSchema]].
  *
  * Driver-side, plan-time IO — the schema is catalog metadata, not data.
  */
object SchemaLoader {
  private val mapper = new ObjectMapper()

  /** Accepts a local path, `file://`, `hdfs://`/`s3a://`, or an http(s)
    * URL (S8 remote schema fetch — [[graft.sources.FileFetcher]]).
    */
  def fromFile(location: String): C3dcSchema =
    fromJson(graft.sources.FileFetcher.fetchString(location))

  def fromJson(json: String): C3dcSchema = {
    val root = mapper.readTree(json)
    val defs = Option(root.get("$defs"))
      .getOrElse(throw new IllegalArgumentException("schema missing $defs"))
    val nodes = defs.properties().asScala.flatMap { e =>
      val (name, obj) = (e.getKey, e.getValue)
      // only object defs with properties are node types (skip "nodes" container)
      Option(obj.get("properties")).filter(_ => name != "nodes").map { props =>
        val required = Option(obj.get("required"))
          .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)
        name -> NodeSpec(name, props.properties().asScala.map { pe =>
          parseProp(pe.getKey, pe.getValue, required.contains(pe.getKey))
        }.toSeq)
      }
    }.toMap
    C3dcSchema(nodes)
  }

  private def parseProp(name: String, spec: JsonNode, required: Boolean): PropSpec = {
    def enumOf(n: JsonNode): Seq[String] =
      Option(n.get("enum")).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Nil)
    val typ = Option(spec.get("type")).map(_.asText()).getOrElse("string")
    typ match {
      case "array" =>
        val items = Option(spec.get("items")).getOrElse(mapper.createObjectNode())
        PropSpec(name, PropType.ArrStr, enumOf(items), required)
      case "integer" =>
        PropSpec(name, PropType.Int, Nil, required,
          // the reference misspells "minimum" as "mininum" making it
          // unenforced (reference: schema/schema_creator.py:461-462); we
          // accept both spellings but do enforce it.
          minimum = Option(spec.get("minimum")).orElse(Option(spec.get("mininum")))
            .map(_.asLong()),
          maximum = Option(spec.get("maximum")).map(_.asLong()))
      case "number" => PropSpec(name, PropType.Num, Nil, required)
      case _        => PropSpec(name, PropType.Str, enumOf(spec), required)
    }
  }
}
