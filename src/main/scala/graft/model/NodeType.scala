package graft.model

/** The harmonized node graph's 12 node types.
  *
  * Mirrors the reference's model-node enum
  * (reference: etl/target/c3dc_etl_model_node.py:10-21) and its
  * pluralization rules (`-is` → `-es`, `-y` → `-ies`, else `+s`;
  * reference: etl/target/c3dc_etl_model_node.py:34-46).
  */
object NodeType {
  val All: Seq[String] = Seq(
    "consent_group", "diagnosis", "genetic_analysis", "laboratory_test",
    "participant", "reference_file", "sample", "study", "survival",
    "synonym", "treatment", "treatment_response")

  def pluralize(node: String): String =
    if (node.endsWith("is")) node.dropRight(2) + "es"
    else if (node.endsWith("y")) node.dropRight(1) + "ies"
    else node + "s"

  /** Node's own primary-key property, `<node>_id`. */
  def idProperty(node: String): String = node + "_id"
}
