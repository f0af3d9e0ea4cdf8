package graft.dsl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.model.SchemaLoader

/** Property-based parity: the compiled Column plan vs an INDEPENDENT plain
  * Scala interpreter of the reference's replacement-chain semantics
  * (etl/target/c3dc_etl.py:203-246 matching, :1291-1293 default,
  * :1189-1219/:1295-1322 allowed-value gating), over ScalaCheck-generated
  * mappings and source values. Scope: single source field, plain string
  * output, literal new_values (macros/enums/compounds have their own
  * example-based specs). Two implementations agreeing on 400 random
  * programs is the strongest guard against compile-time when-chain bugs.
  */
class MappingCompilerPropSpec extends SparkTestBase {

  private val schema = SchemaLoader.fromJson("""
  {"$defs": {"profile": {"type": "object", "properties": {
    "out": {"type": "string"}
  }}}}""")

  // ---- the independent interpreter (reference semantics, plain Scala) ----

  private def cf(s: String): String = s.trim.toLowerCase

  private def interpret(
      src: Option[String], default: Option[String],
      chain: Seq[(String, String)]): Option[String] = {
    // blank = null or exactly "" (GraftFunctions.blank)
    val defaulted: Option[String] = src match {
      case None | Some("") => default.orElse(src)
      case s => s
    }
    def matches(o: String): Boolean = {
      val ot = cf(o)
      if (ot == "*") true
      else if (ot == "+") src.exists(v => cf(v) != "")
      else if (ot.isEmpty) false
      else src.exists(v => cf(v) == ot)
    }
    val matched = chain.collectFirst { case (o, n) if matches(o) => n }
    val value = matched.orElse(defaulted)
    // P5 gate: literal old_values with nonempty new_value form the allowed
    // set; empty set = no gating; '' in the set admits null
    val allowed = chain.collect {
      case (o, n) if o != "*" && o != "+" && n.nonEmpty => cf(o)
    }.toSet
    if (allowed.isEmpty) value
    else {
      val probe =
        if (allowed.contains("")) Some(defaulted.map(cf).getOrElse(""))
        else defaulted.map(cf)
      if (probe.exists(allowed.contains)) value else None
    }
  }

  // ---- generators -------------------------------------------------------

  private val literalGen = Gen.oneOf("AUTO", "auto ", " Building", "x;y", "", "7", "Zed")
  private val srcGen = Gen.oneOf[Option[String]](
    None, Some(""), Some(" "), Some("AUTO"), Some("auto"), Some(" aUtO "),
    Some("Building"), Some("other"), Some("7"), Some("x;y"))
  private val oldGen = Gen.oneOf("*", "+", "AUTO", "auto", " Building", "", "zed")
  private val newGen = Gen.oneOf("Mapped-A", "Mapped-B", "", "7")
  private val caseGen: Gen[(Option[String], Option[String], List[(String, String)])] =
    for {
      src <- srcGen
      default <- Gen.option(Gen.oneOf("DEF", ""))
      n <- Gen.choose(0, 4)
      chain <- Gen.listOfN(n, Gen.zip(oldGen, newGen))
    } yield (src, default, chain)

  // ---- compound-field (P2) interpreter ---------------------------------

  /** Reference compound semantics (etl/target/c3dc_etl.py:226-246): per-
    * ordinal match where '*' always matches, '+' needs nonblank, and the
    * literal arm compares casefolded WITH blank==blank allowed.
    */
  private def interpretCompound(
      srcs: Seq[Option[String]], olds: Seq[String]): Boolean =
    srcs.zip(olds).forall { case (v, o) =>
      val ot = cf(o)
      if (ot == "*") true
      else if (ot == "+") v.exists(x => cf(x) != "")
      else v.map(cf).getOrElse("") == ot
    }

  test("compound match == reference interpreter on 300 random cases") {
    val s = spark
    val pairGen = for {
      v1 <- srcGen; v2 <- srcGen
      o1 <- oldGen; o2 <- oldGen
      wildcardWhole <- Gen.oneOf(true, false, false)
    } yield (Seq(v1, v2), if (wildcardWhole) "*" else s"$o1;$o2")
    val cases = Gen.listOfN(300, pairGen)
      .apply(Gen.Parameters.default, Seed(7L)).getOrElse(fail("gen exhausted"))

    val fields = cases.indices.flatMap(i =>
      Seq(StructField(s"a_$i", StringType), StructField(s"b_$i", StringType)))
    val row = Row.fromSeq(cases.flatMap { case (vs, _) => Seq(vs(0).orNull, vs(1).orNull) })
    val df = s.createDataFrame(java.util.List.of(row), StructType(fields))

    val compiler = new MappingCompiler(schema)
    val outCols = cases.zipWithIndex.map { case ((_, old), i) =>
      val m = Mapping(
        outputField = "profile.out",
        sourceField = s"[a_$i, b_$i]",
        replacements = Seq(Replacement(old, ReplacementValue.Scalar("HIT"))))
      compiler.matchPredicate(m, old).as(s"m_$i")
    }
    val got = df.select(outCols: _*).collect().head
    cases.zipWithIndex.foreach { case ((vs, old), i) =>
      val olds =
        if (old == "*" || old == "+") Seq.fill(2)(old)
        else old.split(";", -1).toSeq
      val expected = interpretCompound(vs, olds)
      assert(got.getBoolean(i) == expected,
        s"case $i: srcs=$vs old='$old' → compiled=${got.getBoolean(i)} interp=$expected")
    }
  }

  test("P6 integer conversion == python-round reference on 300 random numerics") {
    // the reference coerces int(float(v)) but ROUNDS to absorb Excel float
    // noise (etl/target/c3dc_etl.py:1345-1349); python round() is
    // half-EVEN — parity asserted against plain-Scala BigDecimal HALF_EVEN
    val s = spark
    import s.implicits._
    val intSchema = SchemaLoader.fromJson("""
    {"$defs": {"profile": {"type": "object", "properties": {
      "age": {"type": "integer"}
    }}}}""")
    val gen = Gen.oneOf(
      Gen.choose(-1000000d, 1000000d).map(v => f"$v%.6f"),
      Gen.oneOf("0.5", "1.5", "2.5", "-0.5", "-1.5", "3660.9999999", "42",
        "-7.0", "abc", "", "1e3", "  12.49 "))
    val cases = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, Seed(11L)).getOrElse(fail("gen exhausted"))

    val compiler = new MappingCompiler(intSchema)
    val m = Mapping(outputField = "profile.age", sourceField = "v")
    val df = cases.toDF("v")
    val got = df.select(compiler.compile(m,
        CompileCtx("s", "profile", "0", org.apache.spark.sql.functions.lit("rk"))).as("age"))
      .as[Option[Long]].collect().toSeq

    def pyRound(s0: String): Option[Long] = {
      val t = s0.trim
      if (t.isEmpty) None
      else try {
        val d = t.toDouble
        if (d.isNaN || d.isInfinite) None
        else Some(new java.math.BigDecimal(d)
          .setScale(0, java.math.RoundingMode.HALF_EVEN).longValue())
      } catch { case _: NumberFormatException => None }
    }
    cases.zip(got).zipWithIndex.foreach { case ((in, out), i) =>
      assert(out == pyRound(in), s"case $i: '$in' → compiled=$out python=${pyRound(in)}")
    }
  }

  test("compiled plan == reference interpreter on 400 random mapping programs") {
    val s = spark
    val cases = Gen.listOfN(400, caseGen)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))

    // one wide single-row frame: column i holds case i's source value, and
    // the compiled mapping for case i reads exactly that column — the whole
    // parity check is ONE Spark job
    val fields = cases.indices.map(i => StructField(s"src_$i", StringType))
    val row = Row.fromSeq(cases.map(_._1.orNull))
    val df = s.createDataFrame(
      java.util.List.of(row), StructType(fields))

    val compiler = new MappingCompiler(schema)
    val outCols = cases.zipWithIndex.map { case ((_, default, chain), i) =>
      val m = Mapping(
        outputField = "profile.out",
        sourceField = s"src_$i",
        defaultValue = default.map(ReplacementValue.Scalar),
        replacements = chain.map { case (o, n) =>
          Replacement(o, ReplacementValue.Scalar(n))
        })
      compiler.compile(m, CompileCtx("seed", "profile", "0",
        org.apache.spark.sql.functions.lit("rk"), i)).as(s"out_$i")
    }
    val got = df.select(outCols: _*).collect().head

    cases.zipWithIndex.foreach { case ((src, default, chain), i) =>
      val expected = interpret(src, default, chain)
      val actual = Option(got.getString(i))
      assert(actual == expected,
        s"case $i: src=$src default=$default chain=$chain → " +
          s"compiled=$actual interpreter=$expected")
    }
  }

  // ---- compound + macro chain parity (VERDICT r10 #4) -------------------
  // The reference's hairiest semantics are compound-ordinal matching
  // (etl/target/c3dc_etl.py:226-246) and {find_enum_value} miss →
  // fall-through to the NEXT rule (:1113-1118), interacting with enum
  // output canonicalization (:750-764) and the P5 gate's macro exemption
  // (:1189-1219). This interpreter replays compile() END-TO-END for those
  // programs: match → chain (with macro fall-through) → default →
  // gate → enum canonicalization.

  test("compound/macro chains == reference interpreter on 400 random programs") {
    val s = spark
    val enumSchema = SchemaLoader.fromJson("""
    {"$defs": {"profile": {"type": "object", "properties": {
      "lvl": {"type": "string", "enum": ["C1 : Alpha", "C2 : Beta", "Gray"]}
    }}}}""")
    val prop = enumSchema.prop("profile.lvl")
    val codeToValue = prop.codeToValue        // raw code → PV, no trim/fold
    val canonByLower = prop.canonicalByLower  // trimmed-lowered PV → canonical

    val srcValGen = Gen.oneOf[Option[String]](
      None, Some(""), Some(" "), Some("C1"), Some("c1"), Some("C2"),
      Some("C1 : Alpha"), Some("c2 : beta"), Some("gray"), Some("Gray "),
      Some("other"))
    val singleOldGen = Gen.oneOf("*", "+", "", "c1", "C1 : Alpha", "other", " C2 ")
    val ordGen = Gen.oneOf("*", "+", "", "c1", "other")
    val compOldGen = Gen.oneOf(
      Gen.oneOf("*", "+"),
      Gen.zip(ordGen, ordGen).map { case (a, b) => s"$a;$b" })
    val newValGen =
      Gen.oneOf("C2 : Beta", "Gray", "zzz", "", "{find_enum_value}", "C1 : Alpha")
    val progGen = for {
      nf <- Gen.oneOf(1, 2)
      vals <- Gen.listOfN(nf, srcValGen)
      default <- Gen.option(Gen.oneOf("C1 : Alpha", "bogus", "", "gray"))
      n <- Gen.choose(0, 4)
      chain <- Gen.listOfN(n,
        Gen.zip(if (nf == 1) singleOldGen else compOldGen, newValGen))
    } yield (nf, vals, default, chain)
    val cases = Gen.listOfN(400, progGen)
      .apply(Gen.Parameters.default, Seed(91L)).getOrElse(fail("gen exhausted"))

    // -- the independent interpreter ------------------------------------
    def cfs(x: String) = x.trim.toLowerCase
    def isFindEnum(n: String) = {
      val t = n.trim
      t.startsWith("{") && t.endsWith("}") &&
        t.stripPrefix("{").stripSuffix("}").trim.toLowerCase.startsWith("find_enum_value")
    }
    def interpretProg(nf: Int, vals: Seq[Option[String]],
        default: Option[String], chain: List[(String, String)]): Option[String] = {
      val rawSrc: Option[String] = if (nf > 1) None else vals.head
      val blankRaw = rawSrc.forall(_ == "") // blank = NULL or exactly ''
      val srcWithDefault: Option[String] =
        default match {
          case Some(d) => if (blankRaw) Some(d) else rawSrc
          case None    => rawSrc
        }
      def singleM(v: Option[String], o: String): Boolean = {
        val ot = cfs(o)
        if (ot == "*") true
        else if (ot == "+") v.map(cfs).getOrElse("") != ""
        else if (ot.isEmpty) false // equality arm needs both sides nonblank
        else v.exists(x => cfs(x) == ot)
      }
      def ordinalM(v: Option[String], o: String): Boolean = {
        val ot = cfs(o)
        if (ot == "*") true
        else if (ot == "+") v.map(cfs).getOrElse("") != ""
        else v.map(cfs).getOrElse("") == ot // compound allows blank==blank
      }
      def matches(o: String): Boolean =
        if (nf == 1) singleM(vals.head, o)
        else {
          val olds = if (o == "*" || o == "+") Seq.fill(nf)(o)
                     else o.split(";", -1).toSeq
          vals.zip(olds).forall { case (v, oo) => ordinalM(v, oo) }
        }
      def loop(rs: List[(String, String)]): Option[String] = rs match {
        case Nil => None
        case (o, n) :: rest =>
          if (isFindEnum(n)) {
            // hit = raw (untrimmed, case-sensitive) code lookup on the RAW
            // source; compound's raw source is NULL so it always misses
            val hit = rawSrc.flatMap(codeToValue.get)
            if (matches(o) && hit.isDefined) hit else loop(rest)
          } else if (matches(o)) Some(n)
          else loop(rest)
      }
      val value = loop(chain).orElse(srcWithDefault)
      // P5 gate: macro mappings exempt; compound sources gate on their
      // DEFAULT (the reference probes the never-present '[a, b]' record
      // key — srcWithDefault above already models that miss)
      val isMacroMapping = chain.exists { case (_, n) =>
        n.trim.startsWith("{") && n.trim.endsWith("}") }
      val gated: Option[String] =
        if (isMacroMapping) value
        else {
          var allowed = chain.collect {
            case (o, n) if o != "*" && o != "+" && n.nonEmpty => o }.toSet
          allowed = allowed ++ default // enum prop → default joins the set
          if (allowed.isEmpty) value
          else {
            val folded = allowed.map(cfs)
            val probe =
              if (folded.contains("")) Some(srcWithDefault.map(cfs).getOrElse(""))
              else srcWithDefault.map(cfs)
            if (probe.exists(folded.contains)) value else None
          }
        }
      // enum conversion canonicalizes by LOWER (no trim) and drops misses
      gated.flatMap(v => canonByLower.get(v.toLowerCase))
    }

    // -- one wide single-row frame, one Spark job ------------------------
    val fields = cases.zipWithIndex.flatMap { case ((nf, _, _, _), i) =>
      (0 until nf).map(j => StructField(s"f${j}_$i", StringType)) }
    val row = Row.fromSeq(cases.flatMap { case (_, vs, _, _) => vs.map(_.orNull) })
    val df = s.createDataFrame(java.util.List.of(row), StructType(fields))

    val compiler = new MappingCompiler(enumSchema)
    val outCols = cases.zipWithIndex.map { case ((nf, _, default, chain), i) =>
      val sf = if (nf == 1) s"f0_$i" else s"[f0_$i, f1_$i]"
      val m = Mapping(
        outputField = "profile.lvl",
        sourceField = sf,
        defaultValue = default.map(ReplacementValue.Scalar),
        replacements = chain.map { case (o, n) =>
          Replacement(o, ReplacementValue.Scalar(n)) })
      compiler.compile(m, CompileCtx("seed", "profile", "0",
        org.apache.spark.sql.functions.lit("rk"), i)).as(s"out_$i")
    }
    val got = df.select(outCols: _*).collect().head

    cases.zipWithIndex.foreach { case ((nf, vals, default, chain), i) =>
      val expected = interpretProg(nf, vals, default, chain)
      val actual = Option(got.getString(i))
      assert(actual == expected,
        s"case $i: nf=$nf vals=$vals default=$default chain=$chain → " +
          s"compiled=$actual interpreter=$expected")
    }
  }

  // ---- config-shape fuzzing (adversarial specs) -------------------------
  // The reference tolerates pathological mapping configs (empty replacement
  // lists, '*'-only groups, conflicting defaults); beyond tolerance, any
  // INVALID shape must surface as a plan-time error with a message — an
  // IllegalArgumentException from config validation or an AnalysisException
  // from column resolution — never a panic (NPE / MatchError /
  // NumberFormatException / ArrayIndexOutOfBounds) and never wrong output.

  private def cleanOrValue[A](what: String)(body: => A): Option[A] =
    try Some(body) catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage != null && e.getMessage.nonEmpty,
          s"$what: config error without a message"); None
      case e: org.apache.spark.sql.AnalysisException =>
        assert(e.getMessage.nonEmpty); None
      case e: Throwable =>
        fail(s"$what PANICKED with ${e.getClass.getName}: ${e.getMessage}")
    }

  test("config-shape fuzz: 400 pathological mappings compile cleanly or error cleanly") {
    val s = spark
    import org.apache.spark.sql.functions.lit
    val ofGen = Gen.oneOf("profile.out", "noDot", "", "profile.", ".out",
      "bogus.prop", "profile.nope", "profile.out.extra")
    val sfGen = Gen.oneOf("f1", "[string_literal]", "[f1, f2]",
      "[f1,f2,f3]", "", "[ ]", "not_a_column")
    val tgGen = Gen.oneOf("*", "0", "1", "0,1", "", ",", "x", "-1", "1,1,*")
    val oldG = Gen.oneOf("*", "+", "", "a", "a;b", "a;b;c", ";;", " A ", "*;+")
    val newG = Gen.oneOf[ReplacementValue](
      ReplacementValue.Scalar(""), ReplacementValue.Scalar("x"),
      ReplacementValue.Arr(Nil), ReplacementValue.Arr(Seq("x", "y")),
      ReplacementValue.Scalar("{uuid}"), ReplacementValue.Scalar("{field:f1}"),
      ReplacementValue.Scalar("{field:not_a_column}"),
      ReplacementValue.Scalar("{sum}"), ReplacementValue.Scalar("{bogus_macro}"))
    val mGen = for {
      of <- ofGen; sf <- sfGen; tg <- tgGen
      dflt <- Gen.option(newG)
      n <- Gen.choose(0, 3)
      chain <- Gen.listOfN(n, Gen.zip(oldG, newG))
    } yield Mapping(of, sf, tg, dflt, chain.map { case (o, v) => Replacement(o, v) })
    val cases = Gen.listOfN(400, mGen)
      .apply(Gen.Parameters.default, Seed(23L)).getOrElse(fail("gen exhausted"))

    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val df = s.createDataFrame(
      java.util.List.of(Row("v1", null, "3"), Row("", "B", null)),
      StructType(Seq("f1", "f2", "f3").map(StructField(_, StringType))))
    val compiler = new MappingCompiler(schema)
    cases.zipWithIndex.foreach { case (m, i) =>
      // compile is plan-time; a compiled column must also ANALYZE cleanly
      // (resolution of bad source fields is the plan-time gate) and then
      // execute without error — three stages, zero tolerated panics
      cleanOrValue(s"case $i compile($m)") {
        compiler.compile(m, CompileCtx("seed", "profile", "0", lit("rk"), i))
      }.foreach { c =>
        cleanOrValue(s"case $i analyze($m)")(df.select(c.as("out")))
          .foreach { sel =>
            cleanOrValue(s"case $i execute($m)")(sel.collect())
          }
      }
      // the group collator is the other config-consuming plan-time surface
      cleanOrValue(s"case $i collate($m)")(graft.exec.TypeGroups.collate(Seq(m)))
      ()
    }
  }

  test("config JSON fuzz: malformed mapping documents reject with messages, never NPE") {
    val docs = Seq(
      """{"mappings":[{}]}""",
      """{"mappings":[{"output_field":null}]}""",
      """{"mappings":[{"output_field":"noDot"}]}""",
      """{"mappings":[{"output_field":"a."}]}""",
      """{"mappings":[{"output_field":".b"}]}""",
      """{"mappings":[{"output_field":"profile.out","replacement_values":[{}]}]}""",
      """{"mappings":[{"output_field":"profile.out","replacement_values":[{"old_value":null,"new_value":null}]}]}""",
      """{"mappings":[{"output_field":"profile.out","default_value":[1,2]}]}""",
      """{"mappings":[{"output_field":"profile.out","type_group_index":null}]}""",
      """{"transformations":[{"mappings":[{"output_field":"profile.out"}]},{"mappings":[{"output_field":"bad"}]}]}""")
    docs.zipWithIndex.foreach { case (doc, i) =>
      cleanOrValue(s"doc $i parse")(TransformationSpec.fromJson(doc)).foreach { ts =>
        // parsed OK → every mapping must carry a well-formed output_field
        ts.flatMap(_.mappings).foreach { m =>
          assert(m.nodeType.nonEmpty && m.property.nonEmpty,
            s"doc $i parsed a malformed output_field '${m.outputField}'")
        }
      }
      ()
    }
  }
}
