package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** 1-D Kalman level filter (local-level model) as an
  * `AggregateWindowFunction` over the running frame — the same
  * in-window-operator posture as the Wilder/EMA kernels (one ticker
  * exchange + sort, no groupByKey hop).
  *
  * Recursion (per partition, row order):
  *   row 1:  x = z,  p = 1
  *   row n:  pp = p + q;  k = pp / (pp + r)
  *           x' = x + k·(z − x);  p' = (1 − k)·pp
  *
  * The exact operation ORDER is load-bearing: the DuckDB oracle's
  * recursive CTE spells the same parenthesisation, so both engines run
  * the identical IEEE sequence and the outputs are bit-equal.
  */
case class KalmanWindow(z: Expression, q: Double = 0.001, r: Double = 0.01)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(z)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val rn: AttributeReference =
    AttributeReference("rn", LongType, nullable = false)()
  private val x: AttributeReference =
    AttributeReference("x", DoubleType, nullable = true)()
  private val p: AttributeReference =
    AttributeReference("p", DoubleType, nullable = true)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(rn, x, p)

  override val initialValues: Seq[Expression] = Seq(
    Literal(0L), Literal.create(null, DoubleType),
    Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = {
    val zD = Cast(z, DoubleType)
    val rn1 = Add(rn, Literal(1L))
    val pp = Add(p, Literal(q))
    val k = Divide(pp, Add(pp, Literal(r)))
    val x1 = If(EqualTo(rn1, Literal(1L)), zD,
      Add(x, Multiply(k, Subtract(zD, x))))
    val p1 = If(EqualTo(rn1, Literal(1L)), Literal(1.0),
      Multiply(Subtract(Literal(1.0), k), pp))
    Seq(rn1, x1, p1)
  }

  override val evaluateExpression: Expression = x

  override def prettyName: String = "graft_kalman_w"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KalmanWindow =
    copy(z = newChildren(0))
}
