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

/** Holt linear-trend (double exponential) smoothing as an
  * `AggregateWindowFunction` — level + trend state, α = 0.2, β = 0.1.
  *
  * Recursion (per partition, row order):
  *   row 1:  l = z,  b = 0
  *   row n:  l' = α·z + (1−α)·(l + b)
  *           b' = β·(l' − l) + (1−β)·b
  *
  * Returns STRUCT(level, trend). The operation order is mirrored in the
  * DuckDB oracle's recursive CTE (ts_holt) so outputs are bit-equal.
  */
case class HoltWindow(z: Expression) extends AggregateWindowFunction {

  // the complements are spelled as literal doubles (0.8, 0.9), NOT
  // computed as 1.0−α at JVM compile time — DuckDB parses the literal
  // text, and 1.0−0.2 is not guaranteed to round to the same double
  private val alpha = 0.2
  private val oneMinusAlpha = 0.8
  private val beta = 0.1
  private val oneMinusBeta = 0.9

  override def children: Seq[Expression] = Seq(z)
  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType, nullable = true),
    StructField("trend", DoubleType, nullable = true)))
  override def nullable: Boolean = true

  private val rn: AttributeReference =
    AttributeReference("rn", LongType, nullable = false)()
  private val l: AttributeReference =
    AttributeReference("l", DoubleType, nullable = true)()
  private val b: AttributeReference =
    AttributeReference("b", DoubleType, nullable = true)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(rn, l, b)

  override val initialValues: Seq[Expression] = Seq(
    Literal(0L), Literal.create(null, DoubleType),
    Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = {
    val zD = Cast(z, DoubleType)
    val rn1 = Add(rn, Literal(1L))
    // l' = α·z + (1−α)·(l + b) — spelled exactly like the oracle CTE
    def lNew: Expression = Add(
      Multiply(Literal(alpha), zD),
      Multiply(Literal(oneMinusAlpha), Add(l, b)))
    val l1 = If(EqualTo(rn1, Literal(1L)), zD, lNew)
    val b1 = If(EqualTo(rn1, Literal(1L)), Literal(0.0),
      Add(Multiply(Literal(beta), Subtract(lNew, l)),
        Multiply(Literal(oneMinusBeta), b)))
    Seq(rn1, l1, b1)
  }

  override val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("level"), l, Literal("trend"), b))

  override def prettyName: String = "graft_holt_w"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltWindow =
    copy(z = newChildren(0))
}
