package graft.sink

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.dsl.{Mapping, Replacement, ReplacementValue, Transformation}

/** K6: updated-transformation write-back
  * (reference etl/mci/c3dc_etl.py:1528-1538 — MCI appends synthesized
  * `reference_file` mappings for every harmonized subject's source file
  * and writes `{name}.ref_files.json`).
  *
  * Driver-side, plan-time IO: the transformation is catalog metadata.
  * Where the reference mutates its plan mid-run and re-executes, the
  * Spark engine derives the reference-file rows directly from the
  * manifest-joined participant frame (SURVEY.md §7.5.4) and only the
  * config serialization happens here.
  */
object UpdatedTransformationSink {

  /** One source file to record as a reference_file node (manifest-joined:
    * reference etl/mci/c3dc_etl.py:1357-1538).
    */
  final case class RefFile(
      name: String,
      md5: String,
      size: Long,
      url: String,
      category: String = "input source data")

  /** Append one type group of reference_file mappings per file, numbered
    * after the transformation's highest existing explicit group index.
    */
  def appendReferenceFiles(t: Transformation, files: Seq[RefFile]): Transformation = {
    val base = (0 +: t.mappings.flatMap(_.typeGroupIndexes)
      .filter(_ != "*").map(_.toInt)).max
    val added = files.zipWithIndex.flatMap { case (f, i) =>
      val g = (base + 1 + i).toString
      def m(prop: String, value: String, repl: Seq[Replacement] = Nil) =
        Mapping(
          outputField = s"reference_file.$prop",
          sourceField = "[string_literal]",
          typeGroupIndex = g,
          replacements =
            if (repl.nonEmpty) repl
            else Seq(Replacement("*", ReplacementValue.Scalar(value))))
      Seq(
        m("reference_file_id", "{uuid}"),
        m("file_name", f.name),
        m("file_category", f.category),
        m("md5sum", f.md5),
        m("file_size", f.size.toString),
        m("file_description", f.name),
        m("reference_file_url", f.url))
    }
    t.copy(mappings = t.mappings ++ added)
  }

  /** Serialize transformations back to the reference's config JSON shape
    * (`{"transformations": [...]}`); inverse of `TransformationSpec.fromJson`.
    */
  def toJson(ts: Seq[Transformation]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("transformations")
    ts.foreach(t => writeTransformation(arr.addObject(), t))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def write(path: String, ts: Seq[Transformation]): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      toJson(ts).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def writeTransformation(node: ObjectNode, t: Transformation): Unit = {
    node.put("name", t.name)
    node.put("uuid_seed", t.uuidSeed)
    val ms = node.putArray("mappings")
    t.mappings.foreach(m => writeMapping(ms.addObject(), m))
  }

  private def writeMapping(node: ObjectNode, m: Mapping): Unit = {
    node.put("output_field", m.outputField)
    node.put("source_field", m.sourceField)
    node.put("type_group_index", m.typeGroupIndex)
    m.defaultValue.foreach(v => putValue(node, "default_value", v))
    val rs = node.putArray("replacement_values")
    m.replacements.foreach { r =>
      val rn = rs.addObject()
      rn.put("old_value", r.oldValue)
      putValue(rn, "new_value", r.newValue)
    }
  }

  private def putValue(node: ObjectNode, field: String, v: ReplacementValue): Unit =
    v match {
      case ReplacementValue.Scalar(s) => node.put(field, s)
      case ReplacementValue.Arr(vs) =>
        val a: ArrayNode = node.putArray(field)
        vs.foreach(a.add)
    }
}
