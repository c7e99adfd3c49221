package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** MACDFIX histogram and ADX/±DI as custom AggregateWindowFunctions —
  * completes the W-R recursive family in the SQL engine (R3/R4 alongside
  * [[WilderWindowFunction]]'s R1/R2), so the whole 18-column pipeline
  * can run inside one Window operator chain with no groupByKey hop.
  *
  * State machines mirror [[graft.ind.RecursiveIndicators.scan]] (TA-Lib
  * 0.4.32 conventions). One deliberate arithmetic difference: the fast
  * EMA seed here is (Σ₂₆ − Σ₁₄)/12 instead of re-summing rows 15..26 —
  * associativity differences land below the 1e-6 rounding both engines
  * apply. Outputs carry the reference scaling (hist /10, adx & di /100).
  */
abstract class MacdAdxBase extends AggregateWindowFunction {
  protected val nullD: Literal = Literal.create(null, DoubleType)
  protected val zeroD: Literal = Literal(0.0)
  protected def d(v: Double): Literal = Literal(v)

  protected val rn: AttributeReference =
    AttributeReference("rn", LongType, nullable = false)()
  protected def rnIs(n: Long): Expression = EqualTo(rn, Literal(n))
}

/** macd_hist/10: fixed-k (0.15/0.075) EMAs seeded at row 26, EMA9 signal
  * seeded at row 34 (TA-Lib MACDFIX; reference indicators.py:432-445). */
case class MacdHistWindow(price: Expression) extends MacdAdxBase {

  override def children: Seq[Expression] = Seq(price)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_macd_hist_w"

  private val psumAll = AttributeReference("psum_all", DoubleType, nullable = false)()
  private val psum14 = AttributeReference("psum14", DoubleType, nullable = false)()
  private val emaf = AttributeReference("emaf", DoubleType, nullable = true)()
  private val emas = AttributeReference("emas", DoubleType, nullable = true)()
  private val sigsum = AttributeReference("sigsum", DoubleType, nullable = false)()
  private val sig = AttributeReference("sig", DoubleType, nullable = true)()

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq(rn, psumAll, psum14, emaf, emas, sigsum, sig)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), zeroD, zeroD, nullD, nullD, zeroD, nullD)

  override val updateExpressions: Seq[Expression] = {
    val p = Cast(price, DoubleType)
    val rn1 = Add(rn, Literal(1L))
    val psumAll1 = Add(psumAll, p)
    val psum14n = If(LessThanOrEqual(rn1, Literal(14L)), Add(psum14, p), psum14)
    val emas1 = CaseWhen(Seq(
      (LessThan(rn1, Literal(26L)), nullD),
      (EqualTo(rn1, Literal(26L)), Divide(psumAll1, d(26.0)))),
      Add(Multiply(Subtract(p, emas), d(0.075)), emas))
    val emaf1 = CaseWhen(Seq(
      (LessThan(rn1, Literal(26L)), nullD),
      (EqualTo(rn1, Literal(26L)),
        Divide(Subtract(psumAll1, psum14n), d(12.0)))),
      Add(Multiply(Subtract(p, emaf), d(0.15)), emaf))
    val macd1 = Subtract(emaf1, emas1)
    val sigsum1 = If(
      And(GreaterThanOrEqual(rn1, Literal(26L)), LessThanOrEqual(rn1, Literal(33L))),
      Add(sigsum, macd1), sigsum)
    val sig1 = CaseWhen(Seq(
      (LessThan(rn1, Literal(34L)), nullD),
      (EqualTo(rn1, Literal(34L)), Divide(Add(sigsum, macd1), d(9.0)))),
      Add(Multiply(Subtract(macd1, sig), d(0.2)), sig))
    Seq(rn1, psumAll1, psum14n, emaf1, emas1, sigsum1, sig1)
  }

  override val evaluateExpression: Expression =
    If(GreaterThanOrEqual(rn, Literal(34L)),
      Divide(Subtract(Subtract(emaf, emas), sig), d(10.0)), nullD)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MacdHistWindow =
    copy(price = newChildren(0))
}

/** Shared ADX state (reference indicators.py:459-487), period-threaded
  * (reference default q = 14): (q-1)-row ±DM/TR prefix sums, Wilder
  * running sums from row q+1, DX mean seed at row 2q. */
abstract class AdxWindowBase extends MacdAdxBase {
  def high: Expression
  def low: Expression
  def close: Expression
  def period: Int

  protected val qL: Literal = Literal(period.toLong)
  protected val qD: Literal = Literal(period.toDouble)
  protected val qm1D: Literal = Literal((period - 1).toDouble)
  protected val q1L: Literal = Literal(period.toLong + 1L)
  protected val q2L: Literal = Literal(2L * period)

  override def children: Seq[Expression] = Seq(high, low, close)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected val prevH = AttributeReference("prev_h", DoubleType, nullable = true)()
  protected val prevL = AttributeReference("prev_l", DoubleType, nullable = true)()
  protected val prevC = AttributeReference("prev_c", DoubleType, nullable = true)()
  protected val sTR = AttributeReference("s_tr", DoubleType, nullable = false)()
  protected val sPDM = AttributeReference("s_pdm", DoubleType, nullable = false)()
  protected val sMDM = AttributeReference("s_mdm", DoubleType, nullable = false)()
  protected val dxsum = AttributeReference("dxsum", DoubleType, nullable = false)()
  protected val adxraw = AttributeReference("adxraw", DoubleType, nullable = true)()

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq(rn, prevH, prevL, prevC, sTR, sPDM, sMDM, dxsum, adxraw)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), nullD, nullD, nullD, zeroD, zeroD, zeroD, zeroD, nullD)

  protected def pdiOf(s: Expression): Expression =
    If(EqualTo(sTR, zeroD), zeroD, Divide(Multiply(d(100.0), s), sTR))

  override val updateExpressions: Seq[Expression] = {
    val h = Cast(high, DoubleType)
    val l = Cast(low, DoubleType)
    val c = Cast(close, DoubleType)
    val rn1 = Add(rn, Literal(1L))
    val dp = Subtract(h, prevH)
    val dm = Subtract(prevL, l)
    val pdm = If(And(GreaterThan(dp, dm), GreaterThan(dp, zeroD)), dp, zeroD)
    val mdm = If(And(GreaterThan(dm, dp), GreaterThan(dm, zeroD)), dm, zeroD)
    val tr = Greatest(Seq(Subtract(h, l), Abs(Subtract(h, prevC)),
      Abs(Subtract(l, prevC))))
    def roll(s: Expression, x: Expression): Expression = CaseWhen(Seq(
      (EqualTo(rn1, Literal(1L)), zeroD), // first row: no prev, no TR/DM yet
      (LessThanOrEqual(rn1, qL), Add(s, x))),
      Add(Subtract(s, Divide(s, qD)), x))
    val sTR1 = roll(sTR, tr)
    val sPDM1 = roll(sPDM, pdm)
    val sMDM1 = roll(sMDM, mdm)
    val pdi1 = If(EqualTo(sTR1, zeroD), zeroD,
      Divide(Multiply(d(100.0), sPDM1), sTR1))
    val mdi1 = If(EqualTo(sTR1, zeroD), zeroD,
      Divide(Multiply(d(100.0), sMDM1), sTR1))
    val dx1 = If(EqualTo(Add(pdi1, mdi1), zeroD), zeroD,
      Divide(Multiply(d(100.0), Abs(Subtract(pdi1, mdi1))), Add(pdi1, mdi1)))
    val dxsum1 = If(
      And(GreaterThanOrEqual(rn1, q1L), LessThanOrEqual(rn1, q2L)),
      Add(dxsum, dx1), dxsum)
    val adxraw1 = CaseWhen(Seq(
      (LessThan(rn1, q2L), nullD),
      (EqualTo(rn1, q2L), Divide(Add(dxsum, dx1), qD))),
      Divide(Add(Multiply(adxraw, qm1D), dx1), qD))
    Seq(rn1, h, l, c, sTR1, sPDM1, sMDM1, dxsum1, adxraw1)
  }
}

/** adx/100 ∈ [0,1]. */
case class AdxWindow(high: Expression, low: Expression, close: Expression,
    period: Int = 14) extends AdxWindowBase {
  override def prettyName: String = "graft_adx_w"
  override val evaluateExpression: Expression =
    If(GreaterThanOrEqual(rn, q2L), Divide(adxraw, d(100.0)), nullD)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AdxWindow =
    copy(high = newChildren(0), low = newChildren(1), close = newChildren(2))
}

/** (+DI − −DI)/100 ∈ [-1,1] (the reference's adx_hist, tuple-swapped). */
case class AdxHistWindow(high: Expression, low: Expression, close: Expression,
    period: Int = 14) extends AdxWindowBase {
  override def prettyName: String = "graft_adx_hist_w"
  override val evaluateExpression: Expression =
    If(GreaterThanOrEqual(rn, q1L),
      Divide(Subtract(pdiOf(sPDM), pdiOf(sMDM)), d(100.0)), nullD)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AdxHistWindow =
    copy(high = newChildren(0), low = newChildren(1), close = newChildren(2))
}

/** Both ADX outputs from ONE state evaluation: struct(adx, adx_hist). */
case class AdxPairWindow(high: Expression, low: Expression, close: Expression,
    period: Int = 14) extends AdxWindowBase {
  override def dataType: DataType = StructType(Seq(
    StructField("adx", DoubleType), StructField("adx_hist", DoubleType)))
  override def prettyName: String = "graft_adx_pair_w"
  override val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("adx"),
      If(GreaterThanOrEqual(rn, q2L), Divide(adxraw, d(100.0)), nullD),
      Literal("adx_hist"),
      If(GreaterThanOrEqual(rn, q1L),
        Divide(Subtract(pdiOf(sPDM), pdiOf(sMDM)), d(100.0)), nullD)))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AdxPairWindow =
    copy(high = newChildren(0), low = newChildren(1), close = newChildren(2))
}
