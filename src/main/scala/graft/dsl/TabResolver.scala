package graft.dsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.exec.NodeBuilder
import graft.model.C3dcSchema
import graft.sources.SourceReader

/** CCDI-mode tab-qualified field resolution (SURVEY §2.1 S4).
  *
  * The reference's CCDI engine reads one multi-tab workbook where each tab
  * holds one node type's records; a mapping's `source_field` may be
  * tab-qualified (`tab.field`), and each node's source tab is INFERRED
  * from its mappings' qualified names
  * (reference etl/ccdi/c3dc_etl.py:476-498 tab inference,
  * :1018-1046 qualified-name resolution). This is pure plan-time catalog
  * work: nothing here touches data until the resolved tab's frame is
  * handed to the NodeBuilder.
  */
object TabResolver {

  /** Split `tab.field` when `tab` names a known workbook tab; a dot inside
    * a field name that is NOT a tab prefix stays part of the bare name
    * (the reference resolves against the tab list the same way).
    */
  def qualified(name: String, tabs: Set[String]): Option[(String, String)] = {
    val i = name.indexOf('.')
    if (i > 0 && tabs.contains(name.take(i))) Some((name.take(i), name.drop(i + 1)))
    else None
  }

  /** The node's source tab: the first mapping source field qualified with
    * a known tab (reference iterates mappings in order, :476-498).
    */
  def tabForNode(x: Transformation, node: String, tabs: Set[String]): Option[String] =
    x.mappingsFor(node).iterator
      .flatMap(_.sourceFields)
      .flatMap(qualified(_, tabs).map(_._1))
      .nextOption()

  /** Rewrite the node's mappings to bare field names so the compiled plan
    * evaluates against the resolved tab's columns.
    */
  def dequalify(x: Transformation, node: String, tabs: Set[String]): Transformation =
    x.copy(mappings = x.mappings.map { m =>
      if (m.nodeType != node || m.isStringLiteralSource) m
      else {
        val bare = m.sourceFields.map(f => qualified(f, tabs).map(_._2).getOrElse(f))
        m.copy(sourceField =
          if (m.sourceField.trim.startsWith("[")) bare.mkString("[", ", ", "]")
          else bare.head)
      }
    })

  /** CCDI node build: infer the tab, drop blank-`{tab}_id` rows (S4's
    * per-tab filter), dequalify the mappings, run the standard builder
    * keyed by the tab's id column.
    */
  def buildNode(
      schema: C3dcSchema, x: Transformation, node: String,
      workbook: Map[String, DataFrame]): DataFrame = {
    val tabs = workbook.keySet
    val tab = tabForNode(x, node, tabs).getOrElse(throw new IllegalArgumentException(
      s"node '$node' has no tab-qualified source field matching workbook tabs $tabs"))
    val src = SourceReader.dropBlankId(workbook(tab), tab)
    new NodeBuilder(schema, dequalify(x, node, tabs))
      .build(node, src, col(s"${tab}_id").cast("string"))
  }
}
