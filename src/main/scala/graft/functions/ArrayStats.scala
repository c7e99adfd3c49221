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

/** SimHash signature straight from a word-hash array — one per-row pass
  * instead of explode → 16 conditional sums → groupBy: per bit b, count
  * +1/−1 votes over the hashes, bit set when the majority is ≥ 0.
  * Identical result to the aggregation formulation (same vote rule),
  * with NO shuffle: the whole dedup_simhash query becomes a projection.
  */
case class SimHash(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    SimHash.sig(input.asInstanceOf[ArrayData], bits)

  // The kernel must NOT be named `eval`: the companion class inherits
  // Expression.eval(InternalRow), the name collision suppresses the
  // static forwarder, and Janino then can't resolve the generated call
  // — the whole stage silently falls back to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash.sig($c, $bits)")

  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
  override def prettyName: String = "graft_simhash"
}

object SimHash {
  def sig(wh: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = wh.numElements()
    var i = 0
    while (i < n) {
      val h = wh.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Fraction of positions where two MinHash signatures agree — the
  * Jaccard estimator. Replaces an interpreted `filter(sequence(...))`
  * HOF per candidate pair with a codegen'd loop.
  */
case class MinHashEst(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_est expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashEst.est(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // `est`, not `eval` — see the SimHash note: an `eval` kernel loses its
  // static forwarder to the inherited Expression.eval and breaks codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHashEst.est($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashEst =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_minhash_est"
}

object MinHashEst {
  def est(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      // null signature slots (empty-shingle docs) never count as a match
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    if (n == 0) 0.0 else m.toDouble / n.toDouble
  }
}
