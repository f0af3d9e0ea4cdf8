package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Native Catalyst expressions for the vector-similarity / MinHash hot
  * paths, mirroring the design of [[NativeTextExpression]]: one static
  * call into [[VectorKernels]] inside whole-stage codegen, bit-identical
  * to the higher-order-function specs in `graft.functions` (asserted by
  * NativeVectorExpressionsSpec and independently by the DuckDB oracle).
  *
  * The integer parameters (k / bands / rows / planes / dims) are plan-time
  * constants baked into the generated code — the SQL surface takes them as
  * literal arguments, e.g. `graft_minhash_bands(sh, 12, 4, 3)`.
  */

/** Quantize a float/double vector to integer milliunits
  * (`VectorFunctions.quantize` spec).
  */
case class QuantizeMilli(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) VectorKernels.quantizeFloat(a) else VectorKernels.quantizeDouble(a)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (isFloat) s"graft.expressions.VectorKernels.quantizeFloat($c)"
      else s"graft.expressions.VectorKernels.quantizeDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeMilli =
    copy(child = newChild)
  override def prettyName: String = "graft_quantize_milli"
}

/** Exact integer dot product of two quantized vectors
  * (`VectorFunctions.dotQ` spec). Length mismatch yields NULL, exactly
  * like the HOF spec, whose `zip_with` pads the shorter side with nulls
  * and the null addend nulls the aggregate.
  */
case class DotMilli(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got ${l.sql}, ${r.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else VectorKernels.dotMilli(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.expressions.VectorKernels.dotMilli($a, $b);
      }""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotMilli =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_milli"
}

/** MinHash(k) LSH band keys of a hashed shingle set
  * (`DedupFunctions.minhashBandKeys` spec).
  */
case class MinhashBands(child: Expression, k: Int, bands: Int, rows: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.minhashBands(input.asInstanceOf[ArrayData], k, bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorKernels.minhashBands($c, $k, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_bands"
}

/** Banded random-hyperplane LSH keys of a quantized vector
  * (`DedupFunctions.lshBandKeys` spec).
  */
case class LshBands(child: Expression, bands: Int, planesPerBand: Int, dims: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshBands(input.asInstanceOf[ArrayData], bands, planesPerBand, dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorKernels.lshBands($c, $bands, $planesPerBand, $dims)")
  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
  override def prettyName: String = "graft_lsh_bands"
}
