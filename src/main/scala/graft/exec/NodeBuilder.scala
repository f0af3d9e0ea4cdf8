package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dsl.{CompileCtx, Mapping, MappingCompiler, Transformation}
import graft.model.{C3dcSchema, PropType}

/** P8: type-group collation (reference etl/target/c3dc_etl.py:1127-1187).
  * Mappings cluster into indexed groups, one output record per group per
  * source row; '*'-group mappings are replicated into every explicit group
  * (prepended, without overriding fields the group maps itself); the '*'
  * group survives only when it is the only group.
  */
object TypeGroups {
  def collate(mappings: Seq[Mapping]): Seq[(String, Seq[Mapping])] = {
    val grouped = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Mapping]]
    for (m <- mappings; gi <- m.typeGroupIndexes)
      grouped(gi) = grouped.getOrElse(gi, Vector.empty) :+ m
    val sorted = grouped.toSeq.sortBy { case (k, _) =>
      // non-integer tokens are a config error with a message, not a
      // NumberFormatException panic (C1 startup validation contract)
      if (k == "*" || k.isEmpty) 0
      else k.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"type_group_index token must be an integer or '*', got '$k'"))
    }
    val base = sorted.collect { case (k, ms) if k == "*" || k.isEmpty => ms }.flatten
    val nonBase = sorted.filterNot { case (k, _) => k == "*" || k.isEmpty }
    if (nonBase.isEmpty) sorted
    else nonBase.map { case (gi, ms) =>
      val own = ms.map(_.outputField).toSet
      gi -> (base.filterNot(b => own.contains(b.outputField)) ++ ms)
    }
  }
}

/** Builds one node type's records from a tabular source: one `select` per
  * type group (each field a compiled Column), a required-field filter per
  * group (P7, reference etl/target/c3dc_etl.py:1351-1373), then
  * `unionByName`. All plan-time logic — the physical plan is a single scan
  * per group with no shuffle.
  */
final class NodeBuilder(schema: C3dcSchema, xform: Transformation) {
  private val compiler = new MappingCompiler(schema)

  /** Stable ordinal of each mapping in the transformation (drives {uuid}
    * uniqueness across fields).
    */
  private val ordinals: Map[Mapping, Int] = xform.mappings.zipWithIndex.toMap

  /** @param rowKey natural key of each source row (audit row number or
    *               subject id) — feeds deterministic {uuid}s
    * @param passthrough extra columns carried through (e.g. the source
    *                    subject id for graph linking)
    */
  def build(
      node: String,
      source: DataFrame,
      rowKey: Column,
      passthrough: Seq[(String, Column)] = Nil): DataFrame = {
    val spec = schema.node(node)
    val groups = TypeGroups.collate(xform.mappingsFor(node))
    require(groups.nonEmpty, s"no mappings for node type $node")

    val frames = groups.flatMap { case (gi, ms) =>
      // assignment order, gate-aware (reference :1291-1322): mappings for
      // the same property assign in order and a P5-GATED mapping SKIPS —
      // the earlier mapping's value survives — so plain dict last-wins is
      // only right when the later mapping is ungated (an ungated null
      // still overwrites). Caught by TypeGroupsPropSpec program 36: a
      // gated trailing mapping nulled a value the reference keeps.
      val propsInOrder = ms.map(_.property).distinct
      val byProp = ms.groupBy(_.property)

      // a required property with no mapping in this group can never be
      // populated → the whole group yields no records (plan-time prune)
      val unmappedRequired = spec.requiredProps.filterNot(p => byProp.contains(p) || p == "id")
      if (unmappedRequired.nonEmpty) None
      else {
        val cols = propsInOrder.map { prop =>
          assignmentFold(node, gi, byProp(prop), rowKey).as(prop)
        } ++ passthrough.map { case (n, c) => c.as(n) }
        val projected = source.select(cols: _*)
        Some(projected.filter(requiredPred(spec, byProp.keySet.toSet)))
      }
    }
    require(frames.nonEmpty, s"no satisfiable type groups for node type $node")
    frames.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Gate-aware assignment fold (reference :1291-1322): mappings for the
    * same property assign in order; each later mapping overwrites unless
    * its P5 gate rejects, in which case the accumulated earlier value
    * shows through. Shared by [[build]], [[compiledProperty]] and
    * [[admittedGroupCount]].
    */
  private def assignmentFold(
      node: String, gi: String, chain: Seq[Mapping], rowKey: Column): Column = {
    def compiled(m: Mapping): Column = {
      val ctx = CompileCtx(xform.uuidSeed, node, gi, rowKey, ordinals.getOrElse(m, 0))
      compiler.compile(m, ctx)
    }
    chain.tail.foldLeft(compiled(chain.head)) { (acc, m) =>
      compiler.gateAdmitted(m) match {
        case None      => compiled(m)
        case Some(adm) => when(adm, compiled(m)).otherwise(acc)
      }
    }
  }

  /** Compiled value of one of `node`'s properties against a source row —
    * the same gate-aware assignment fold [[build]] uses — for structural
    * passthrough columns (the observation backpointer). Uses the first
    * type group that maps the property; None when nothing maps it.
    */
  def compiledProperty(node: String, prop: String, rowKey: Column): Option[Column] =
    TypeGroups.collate(xform.mappingsFor(node)).collectFirst {
      case (gi, ms) if ms.exists(_.property == prop) =>
        assignmentFold(node, gi, ms.filter(_.property == prop), rowKey)
    }

  /** Per-source-row count of the records [[build]] yields for `node`
    * (before any sub-source explode): how many type groups admit the row
    * through their required-field filter; a group with an unmapped
    * required property yields none (the same plan-time prune [[build]]
    * applies). Row-local — no join, no shuffle — which lets the
    * Harmonizer compile the reference's participant row-skip rule
    * (etl/target/c3dc_etl.py:1549-1558: a row whose participant build
    * yields != 1 record contributes nothing) into a filter pushed down
    * to the observation scans, instead of a data-sized semi-join against
    * the built participant frame.
    */
  def admittedGroupCount(node: String, rowKey: Column): Column = {
    val spec = schema.node(node)
    TypeGroups.collate(xform.mappingsFor(node)).flatMap { case (gi, ms) =>
      val byProp = ms.groupBy(_.property)
      val unmappedRequired =
        spec.requiredProps.filterNot(p => byProp.contains(p) || p == "id")
      if (unmappedRequired.nonEmpty) None
      else Some(requiredPred(spec, byProp.keySet,
        p => assignmentFold(node, gi, byProp(p), rowKey)))
    }.map(p => when(p, lit(1)).otherwise(lit(0)))
      .reduceOption(_ + _).getOrElse(lit(0))
  }

  /** Required values must be non-blank; arrays non-empty with at least one
    * non-blank element (reference etl/target/c3dc_etl.py:1358-1366).
    */
  private def requiredPred(
      spec: graft.model.NodeSpec,
      mapped: Set[String],
      resolve: String => Column = p => col("`" + p + "`")): Column =
    spec.requiredProps.filter(mapped.contains).map { p =>
      val c = resolve(p)
      spec.byName(p).typ match {
        case PropType.ArrStr =>
          c.isNotNull && exists(c, x => x.isNotNull && x =!= lit(""))
        case PropType.Str => c.isNotNull && c =!= lit("")
        case _            => c.isNotNull
      }
    }.reduceOption(_ && _).getOrElse(lit(true))
}
