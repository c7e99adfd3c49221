package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Σ |x − center| over an ARRAY<DOUBLE> — the mean-deviation kernel of
  * CCI (TA-Lib CCI meandev; reference indicators.py:372-384). A HOF
  * `aggregate` lambda evaluates interpreted per element; this is the
  * same left-to-right fold as a tight loop inside whole-stage codegen
  * (and matches the DuckDB oracle's list_reduce order bit-for-bit).
  */
case class AbsDevSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_absdev_sum expects (ARRAY<DOUBLE>, DOUBLE), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    AbsDevSum.sum(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, c) => s"graft.functions.AbsDevSum.sum($a, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AbsDevSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_absdev_sum"
}

object AbsDevSum {
  def sum(xs: ArrayData, center: Double): Double = {
    val n = xs.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += math.abs(xs.getDouble(i) - center); i += 1 }
    s
  }
}
