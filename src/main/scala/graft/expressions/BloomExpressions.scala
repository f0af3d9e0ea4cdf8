package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(bloomBytes, value)` — membership probe of a
  * LONG value against a serialized `org.apache.spark.util.sketch.BloomFilter`
  * carried as a foldable BINARY literal.
  *
  * The filter bytes MUST be foldable (a `lit(...)` baked at plan time):
  * the filter is deserialized ONCE — `lazy val` on the interpreted path, a
  * codegen reference object (deserialized at plan time, shipped with the
  * task binary like any broadcast-sized literal) on the codegen path —
  * never per row. The probe itself is a branch-free hash + bitset test
  * inside whole-stage codegen.
  *
  * Scale role (see `d13_bloom_decontaminate`): a Bloom filter at ~1% fpp
  * costs ~10 bits per element, so an eval-set gram universe that is GBs
  * as exact 8-byte keys ships as a fraction of the bytes — and the probe
  * is a map-side FILTER, so the corpus stream is pruned to (true hits +
  * fpp × corpus) rows before anything shuffles. False positives are the
  * caller's problem: follow with an exact join on the survivors when the
  * answer must be exact.
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bloom filter bytes must be a foldable literal")
    else if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: first argument must be BINARY, got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: second argument must be BIGINT, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  /** Deserialized once per plan (codegen) / per instance (interpreted). */
  @transient private lazy val filter: BloomFilter =
    left.eval(null) match {
      case null => null
      case bytes: Array[Byte] =>
        BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = right.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (filter == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
      val rightGen = right.genCode(ctx)
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(code =
        code"""
          ${rightGen.code}
          boolean ${ev.isNull} = ${rightGen.isNull};
          $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
          if (!${ev.isNull}) {
            ${ev.value} = $bf.mightContainLong(${rightGen.value});
          }""")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_might_contain"
}
