package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Parabolic SAR (stop-and-reverse) as an incremental
  * `AggregateWindowFunction` — the same in-WindowExec posture as the
  * Wilder/MACD/ADX kernels, so it rides the shared per-ticker exchange
  * with zero extra shuffles and no groupByKey hop.
  *
  * Recursion (the single-bar-clamp variant; every operation is mirrored
  * token-for-token in the DuckDB recursive-CTE oracle so the doubles
  * are bit-identical on both engines):
  *
  *  - bar 1: record (high, low, close), no output.
  *  - bar 2 (seed): long iff close₂ ≥ close₁; sar = low₁ (long) /
  *    high₁ (short); ep = high₂ (long) / low₂ (short); af = 0.02.
  *  - bar i ≥ 3: sarRaw = sar + af·(ep − sar); long clamps
  *    sarₙ = least(sarRaw, lowᵢ₋₁) (short: greatest(sarRaw, highᵢ₋₁));
  *    reversal iff the bar pierces sarₙ (lowᵢ < sarₙ long / highᵢ > sarₙ
  *    short) → flip direction, sar = old ep, ep = the piercing extreme,
  *    af = 0.02; otherwise sar = sarₙ and a new extreme (highᵢ > ep
  *    long / lowᵢ < ep short) advances ep and steps
  *    af = least(af + 0.02, 0.2).
  *
  * The reference's indicator surface stops at ADX/MACD recursions
  * (stockdata/indicators.py:178-272); SAR extends the same recursive
  * family (TA-Lib's public SAR description) with a two-sided state
  * machine — direction, extreme and acceleration all live in the one
  * window buffer.
  *
  * Output: struct(sar DOUBLE, dir BIGINT — +1 long / −1 short), null
  * for bar 1. Bars with any null price are transparent: the state
  * machine runs over the non-null subsequence and such rows emit the
  * carried state.
  */
case class SarWindow(high: Expression, low: Expression, close: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(high, low, close)
  override def dataType: DataType = StructType(Seq(
    StructField("sar", DoubleType), StructField("dir", LongType)))
  override def nullable: Boolean = true

  private val AfStep = Literal(0.02)
  private val AfMax = Literal(0.2)

  private val rn = AttributeReference("rn", LongType, nullable = false)()
  private val ph = AttributeReference("ph", DoubleType, nullable = true)()
  private val pl = AttributeReference("pl", DoubleType, nullable = true)()
  private val pc = AttributeReference("pc", DoubleType, nullable = true)()
  private val lng = AttributeReference("lng", BooleanType, nullable = true)()
  private val sar = AttributeReference("sar", DoubleType, nullable = true)()
  private val ep = AttributeReference("ep", DoubleType, nullable = true)()
  private val af = AttributeReference("af", DoubleType, nullable = true)()

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq(rn, ph, pl, pc, lng, sar, ep, af)

  private val nullD = Literal.create(null, DoubleType)
  private val nullB = Literal.create(null, BooleanType)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), nullD, nullD, nullD, nullB, nullD, nullD, nullD)

  override val updateExpressions: Seq[Expression] = {
    val h = Cast(high, DoubleType)
    val l = Cast(low, DoubleType)
    val c = Cast(close, DoubleType)
    val rn1 = Add(rn, Literal(1L))
    val first = EqualTo(rn1, Literal(1L))
    val second = EqualTo(rn1, Literal(2L))

    // seed at bar 2
    val long2 = GreaterThanOrEqual(c, pc)
    val sar2 = If(long2, pl, ph)
    val ep2 = If(long2, h, l)

    // step at bar ≥ 3 (state from the previous bar; ph/pl are bar i−1)
    val sarRaw = Add(sar, Multiply(af, Subtract(ep, sar)))
    val sarnL = Least(Seq(sarRaw, pl))
    val sarnS = Greatest(Seq(sarRaw, ph))
    val revL = LessThan(l, sarnL)
    val revS = GreaterThan(h, sarnS)
    val newHi = GreaterThan(h, ep)
    val newLo = LessThan(l, ep)
    val afStep = Least(Seq(Add(af, AfStep), AfMax))

    val lngN = If(lng, If(revL, Literal(false), Literal(true)),
      If(revS, Literal(true), Literal(false)))
    val sarN = If(lng, If(revL, ep, sarnL), If(revS, ep, sarnS))
    val epN = If(lng, If(revL, l, If(newHi, h, ep)),
      If(revS, h, If(newLo, l, ep)))
    val afN = If(lng, If(revL, AfStep, If(newHi, afStep, af)),
      If(revS, AfStep, If(newLo, afStep, af)))

    // Catalyst `If` treats a null predicate as false, so without the
    // explicit first-row branch the step expressions would coerce the
    // null seed state into concrete (wrong) values on bar 1.
    //
    // A bar with ANY null input is transparent: every buffer slot
    // (including the bar counter) carries, so the recursion runs over
    // the non-null subsequence and the row emits the carried state.
    // Without the guard, null prices would poison ph/pl/pc and a null
    // seed comparison would flip `lng` via null-as-false — state
    // corruption no all-non-null fixture can catch.
    val anyNull = Or(Or(IsNull(h), IsNull(l)), IsNull(c))
    def guarded(buf: Expression, next: Expression): Expression =
      If(anyNull, buf, next)
    Seq(
      guarded(rn, rn1), guarded(ph, h), guarded(pl, l), guarded(pc, c),
      guarded(lng, CaseWhen(Seq((first, nullB), (second, long2)), lngN)),
      guarded(sar, CaseWhen(Seq((first, nullD), (second, sar2)), sarN)),
      guarded(ep, CaseWhen(Seq((first, nullD), (second, ep2)), epN)),
      guarded(af, CaseWhen(Seq((first, nullD), (second, AfStep)), afN)))
  }

  override val evaluateExpression: Expression =
    If(IsNull(lng), Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("sar"), sar,
        Literal("dir"), If(lng, Literal(1L), Literal(-1L)))))

  override def prettyName: String = "graft_sar_w"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SarWindow =
    copy(high = newChildren(0), low = newChildren(1), close = newChildren(2))
}
