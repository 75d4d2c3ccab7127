package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native vector kernels for the similarity operators — replacing interpreted
 * higher-order-function formulations with single JIT-compiled passes:
 *
 *  - `quantize_i64(vec)`: array<float|double> → array<long>, element =
 *    round(x*1000) with HALF_UP semantics (bit-identical to Spark's
 *    `round(col*1000).cast("long")`, which the DuckDB oracle mirrors);
 *  - `qdot_i64(a, b)`: exact integer dot product of two quantized vectors.
 *
 * Registered by [[GraftExtensions]].
 */
final case class QuantizeI64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i64 requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_i64"

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    QuantizeI64.run(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeI64$$.MODULE$$.run($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeI64 {
  /** Exactly Spark's Round(DoubleType): BigDecimal.valueOf → HALF_UP at scale 0. */
  private def halfUp(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def run(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = halfUp(d * 1000d)
      i += 1
    }
    new GenericArrayData(out)
  }

  def create(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "quantize_i64(vec) takes exactly 1 argument")
    QuantizeI64(exprs.head)
  }
}

final case class QdotI64(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qdot_i64 requires two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot_i64"

  override def nullSafeEval(a: Any, b: Any): Any =
    QdotI64.run(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.QdotI64$$.MODULE$$.run($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object QdotI64 {
  def run(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def create(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "qdot_i64(a, b) takes exactly 2 arguments")
    QdotI64(exprs.head, exprs(1))
  }
}
