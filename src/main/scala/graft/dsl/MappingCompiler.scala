package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.{C3dcSchema, PropSpec, PropType}
import graft.functions.GraftFunctions._

/** Per-row context a compiled mapping needs beyond its own spec. */
final case class CompileCtx(
    uuidSeed: String,
    nodeType: String,
    groupIndex: String,
    /** Natural key of the source row (e.g. the audit row number or subject
      * id) — the {uuid} macro derives deterministic ids from it.
      */
    rowKey: Column,
    /** Position of the mapping in the transformation — distinguishes the
      * {uuid} drawn for participant_id from the one for survival_id on the
      * same row.
      */
    mappingOrdinal: Int = 0)

/** Compiles one DSL [[Mapping]] into a single Catalyst `Column` — the
  * engine's "logical plan" for a field. Whole plan stays declarative: ordered
  * first-match-wins replacement chains become nested `when` trees, macros
  * become built-in function compositions, enum lookups become map literals.
  * Everything is codegen-friendly (no UDFs).
  *
  * Reference semantics implemented (with file:line cites):
  *  - match predicate: '*' always, '+' nonblank, literal = casefolded-trimmed
  *    equality, compound per-ordinal (etl/target/c3dc_etl.py:203-246)
  *  - first-match-wins with {find_enum_value}-miss fall-through
  *    (etl/target/c3dc_etl.py:1113-1118)
  *  - default substitution on blank source (etl/target/c3dc_etl.py:1291-1293)
  *  - allowed-value gating: exact-match against literal old_values, skipped
  *    for macro mappings; compound-source mappings gate on their DEFAULT
  *    (the reference probes `source_record.get('[a, b]')`, which always
  *    misses, so the defaulted value is what faces the allowed set — live
  *    configs pass because the default is in the output enum)
  *    (etl/target/c3dc_etl.py:1189-1219,1295-1322)
  *  - output conversion: enum canonicalization by casefold, ';'-split arrays,
  *    numeric gate + round (etl/target/c3dc_etl.py:684-764,1330-1349)
  *
  * Two deliberate deviations, both documented engine contracts:
  *  - {uuid} is content-derived (see GraftFunctions.deterministicUuid), not
  *    an RNG draw sequence (SURVEY.md §7.5-1);
  *  - enum canonicalization applies uniformly to replacement-chain results,
  *    not only to the fallback conversion path (strictly-stronger hygiene;
  *    committed configs always use canonical casing in new_value).
  * The reference's group-0 "base record" merge is dead code there (string
  * key compared to int 0 — etl/target/c3dc_etl.py:1377 — never true), so
  * groups are independent here too.
  */
final class MappingCompiler(schema: C3dcSchema) {

  /** Quote arbitrary header names (spaces, dots) for Column resolution. */
  private def src(name: String): Column =
    col("`" + name + "`").cast("string")

  def compile(m: Mapping, ctx: CompileCtx): Column = {
    val prop = schema.prop(m.outputField)
    val rawSrc: Column =
      if (m.isStringLiteralSource || m.sourceFields.length > 1) lit(null).cast("string")
      else src(m.sourceField)
    val srcWithDefault: Column = defaultedSource(m)

    val chain = m.replacements.foldRight(lit(null).cast("string")) { (r, next) =>
      if (isMacro(r.newValue, "find_enum_value")) {
        val hit = enumCodeLookup(prop, rawSrc)
        when(matchPredicate(m, r.oldValue) && hit.isNotNull, hit).otherwise(next)
      } else {
        when(matchPredicate(m, r.oldValue), candidate(m, r, prop, ctx)).otherwise(next)
      }
    }

    val valueStr = coalesce(chain, srcWithDefault)
    val gated = gate(m, srcWithDefault, valueStr)
    convert(prop, gated)
  }

  // ---------------------------------------------------------------- matching

  /** Reference is_replacement_match (etl/target/c3dc_etl.py:203-246). */
  def matchPredicate(m: Mapping, oldValue: String): Column = {
    if (m.isStringLiteralSource) return lit(true)
    val fields = m.sourceFields
    if (fields.length == 1) singleMatch(src(fields.head), oldValue)
    else {
      val olds: Seq[String] =
        if (oldValue == "*" || oldValue == "+") Seq.fill(fields.length)(oldValue)
        else oldValue.split(MultiValueDelim, -1).toSeq
      require(olds.length == fields.length,
        s"compound old_value arity ${olds.length} != source fields ${fields.length}: " +
          s"'$oldValue' vs '${m.sourceField}'")
      fields.zip(olds).map { case (f, o) => ordinalMatch(src(f), o) }.reduce(_ && _)
    }
  }

  private def singleMatch(s: Column, oldValue: String): Column = {
    val o = Option(oldValue).getOrElse("").trim.toLowerCase
    if (o == "*") lit(true)
    else if (o == "+") coalesce(cf(s), lit("")) =!= lit("")
    else if (o.isEmpty) lit(false) // equality arm requires both sides nonblank
    else cf(s) === lit(o)
  }

  /** Compound ordinal: like single but equality allows blank==blank
    * (reference `src_val == old_val` without the nonblank guard, :240-246).
    */
  private def ordinalMatch(s: Column, oldValue: String): Column = {
    val o = Option(oldValue).getOrElse("").trim.toLowerCase
    if (o == "*") lit(true)
    else if (o == "+") coalesce(cf(s), lit("")) =!= lit("")
    else coalesce(cf(s), lit("")) === lit(o)
  }

  // -------------------------------------------------------------- candidates

  private def joined(v: ReplacementValue): String = v match {
    case ReplacementValue.Scalar(s) => s
    case ReplacementValue.Arr(vs)   => vs.mkString(MultiValueDelim)
  }

  private def isMacro(v: ReplacementValue, name: String): Boolean = v match {
    case ReplacementValue.Scalar(s) =>
      val t = s.trim
      t.startsWith("{") && t.endsWith("}") &&
        t.stripPrefix("{").stripSuffix("}").trim.toLowerCase.startsWith(name)
    case _ => false
  }

  private val MacroRe = "\\{.*?\\}".r

  /** Chain candidate in the string domain (arrays are ';'-joined; the final
    * conversion re-splits). Macro expansion mirrors the reference: only
    * new_values that start with '{' AND end with '}' are macro-processed,
    * and only the first macro occurrence is substituted
    * (etl/target/c3dc_etl.py:1004-1013).
    */
  private def candidate(m: Mapping, r: Replacement, prop: PropSpec, ctx: CompileCtx): Column =
    r.newValue match {
      case ReplacementValue.Arr(vs) =>
        val parts = vs.map(v => scalarCandidate(m, v, prop, ctx))
        concat_ws(MultiValueDelim, parts: _*)
      case ReplacementValue.Scalar(s) => scalarCandidate(m, s, prop, ctx)
    }

  private def scalarCandidate(m: Mapping, s: String, prop: PropSpec, ctx: CompileCtx): Column = {
    val t = s.trim
    if (!(t.startsWith("{") && t.endsWith("}"))) return lit(s)
    val macroText = MacroRe.findFirstIn(s).getOrElse(return lit(s))
    val inner = macroText.stripPrefix("{").stripSuffix("}").trim
    val low = inner.toLowerCase
    val defaultCol = m.defaultValue.map(d => lit(joined(d))).getOrElse(lit(null).cast("string"))

    def spliced(value: Column): Column = {
      // replace every occurrence of the macro text (python str.replace)
      val parts = s.split(java.util.regex.Pattern.quote(macroText), -1)
      if (parts.length == 2 && parts(0).isEmpty && parts(1).isEmpty) value
      else concat_ws("", parts.map(lit(_): Column).zipWithIndex.flatMap {
        case (p, i) => if (i == 0) Seq(p) else Seq(value, p)
      }: _*)
    }

    if (low == "uuid")
      spliced(deterministicUuid(
        lit(ctx.uuidSeed),
        concat_ws("|", lit(ctx.nodeType), lit(ctx.groupIndex),
          lit(ctx.mappingOrdinal.toString), ctx.rowKey.cast("string"))))
    else if (low.startsWith("field:"))
      spliced(coalesce(src(inner.substring("field:".length).trim), lit("")))
    else if (low == "sum")
      nullGatedSum(m.sourceFields.map(src), defaultCol).cast("string")
    else if (low.startsWith("sum_abs_first"))
      nullGatedSum(m.sourceFields.map(src), defaultCol, absFirst = true).cast("string")
    else if (low == "race") {
      val fields = m.sourceFields
      require(fields.nonEmpty && fields.length <= 2,
        s"{race} macro needs 1-2 source fields, got '${m.sourceField}'")
      val eth = if (fields.length == 2) src(fields(1)) else lit("")
      raceMergeJoined(src(fields.head), eth, prop.canonicalByLower, defaultCol)
    } else lit(s) // unknown macro: literal passthrough (validated at plan time)
  }

  /** {find_enum_value}: raw (untrimmed, case-sensitive) code → canonical PV
    * (reference etl/target/c3dc_etl.py:1024-1033,431-437).
    */
  private def enumCodeLookup(prop: PropSpec, rawSrc: Column): Column =
    if (prop.codeToValue.isEmpty) lit(null).cast("string")
    else element_at(typedlit(prop.codeToValue), rawSrc)

  // ------------------------------------------------------------------ gating

  /** P5 allowed-value gating (etl/target/c3dc_etl.py:1189-1219,1295-1322):
    * literal old_values + enum default; all enum codes when a wildcard
    * {find_enum_value} entry exists; macro mappings and literal sources
    * exempt. Not-allowed → field skipped (NULL). '' ≈ NULL (:1216-1217).
    * Compound-source mappings are NOT exempt: the reference resolves their
    * probe value via `source_record.get('[a, b]')` — a key that never
    * exists — so the probe is the mapping DEFAULT (or null), making the
    * gate a plan-time constant that Catalyst folds away.
    * Deviation: the reference probes with EXACT equality while its rule
    * matching casefolds — an internal inconsistency that is unobservable on
    * committed configs (old_values are authored in data casing); we probe
    * casefolded-trimmed, consistent with rule matching.
    */
  private def gate(m: Mapping, srcWithDefault: Column, value: Column): Column =
    gateAdmitted(m) match {
      case None            => value
      case Some(admitted)  => when(admitted, value)
    }

  /** The defaulted source expression compile() evaluates (blank source →
    * mapping default) — also the value the warn channel reports.
    */
  def defaultedSource(m: Mapping): Column = {
    val rawSrc: Column =
      if (m.isStringLiteralSource || m.sourceFields.length > 1) lit(null).cast("string")
      else src(m.sourceField)
    m.defaultValue.map(joined) match {
      case Some(d) => when(blank(rawSrc), lit(d)).otherwise(rawSrc)
      case None    => rawSrc
    }
  }

  /** P5 admission predicate: Some(pred) when the mapping is gated (pred
    * true = value admitted), None when the gate doesn't apply. Shared by
    * compile() (reject → NULL) and the warn-channel diagnostics
    * (reject → reported row, the reference's "not allowed" warning).
    */
  def gateAdmitted(m: Mapping): Option[Column] = {
    val isMacroMapping = m.replacements.exists(r => r.newValue match {
      case ReplacementValue.Scalar(s) => s.trim.startsWith("{") && s.trim.endsWith("}")
      case _ => false
    })
    if (isMacroMapping || m.isStringLiteralSource) return None
    val prop = schema.prop(m.outputField)
    var allowed: Set[String] = m.replacements.collect {
      case Replacement(o, nv) if o != null && o != "*" && o != "+" && joined(nv).nonEmpty => o
    }.toSet
    if (prop.isEnum) allowed = allowed ++ m.defaultValue.map {
      case ReplacementValue.Scalar(s) => Set(s)
      case ReplacementValue.Arr(vs)   => vs.toSet
    }.getOrElse(Set.empty)
    if (m.replacements.exists(r =>
        (r.oldValue == "*" || r.oldValue == "+") && isMacro(r.newValue, "find_enum_value")))
      allowed = allowed ++ prop.codeToValue.keySet
    if (allowed.isEmpty) None
    else {
      val folded = allowed.map(_.trim.toLowerCase)
      val srcWithDefault = defaultedSource(m)
      // '' in the allowed set admits NULL too (reference :1216-1217)
      val probe =
        if (folded.contains("")) coalesce(cf(srcWithDefault), lit(""))
        else cf(srcWithDefault)
      Some(probe.isin(folded.toSeq.map(lit(_)): _*))
    }
  }

  // -------------------------------------------------------------- conversion

  /** Output conversion to the schema type (etl/target/c3dc_etl.py:684-764):
    * string enums canonicalized by casefold (miss → NULL); arrays split on
    * ';' (enum arrays canonicalized dropping misses, free arrays trimmed);
    * integers numeric-gated then rounded half-even like python round()
    * (etl/target/c3dc_etl.py:1345-1349 — Spark `bround`); numbers
    * numeric-gated doubles.
    */
  def convert(prop: PropSpec, value: Column): Column = prop.typ match {
    case PropType.Str =>
      if (!prop.isEnum) value
      else element_at(typedlit(prop.canonicalByLower), lower(value))
    case PropType.Int =>
      bround(value.try_cast("double")).try_cast("long")
    case PropType.Num =>
      value.try_cast("double")
    case PropType.ArrStr =>
      if (!prop.isEnum)
        when(value.isNotNull,
          transform(split(value, MultiValueDelim), x => trim(x)))
      else {
        val canon = typedlit(prop.canonicalByLower)
        when(value.isNotNull,
          filter(transform(split(value, MultiValueDelim),
            x => element_at(canon, lower(x))), x => x.isNotNull))
      }
  }
}
