package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) evaluate
  * their lambdas interpreted, outside whole-stage codegen — on an
  * O(n²)-pair similarity join that interpreter loop dominates the
  * runtime. This expression compiles to a tight scalar loop inside the
  * generated code (builder-prompt preference order: custom Catalyst
  * Expression over UDF).
  *
  * Summation is sequential left-to-right — the SAME operation order as
  * the `aggregate(transform(...))` fold it replaces and as the DuckDB
  * oracle's `list_reduce`, so results stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Runtime registration of graft's native functions into an existing
  * session's FunctionRegistry (the driver owns session construction, so
  * SparkSessionExtensions isn't available to us; this is the documented
  * runtime path the extensions API wraps).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.IntegerType

  private[functions] def litIntParam(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }
  private def litInt(e: Expression, fn: String): Int = litIntParam(e, fn)

  /** Fail on unexpected arity instead of silently dropping arguments —
    * a caller passing a period to a fixed-kernel function (MACDFIX/ADX
    * are fixed-constant by definition) must hear about it at analysis
    * time, not get default behavior.
    */
  private def arity(name: String, ns: Int*)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    cs => {
      require(ns.contains(cs.length),
        s"$name expects ${ns.mkString(" or ")} argument(s), got ${cs.length}")
      b(cs)
    }

  /** Wilder-family period: optional trailing literal INT, default 14. */
  private def wilderPeriod(cs: Seq[Expression], name: String): Int =
    if (cs.length > 1) litIntParam(cs(1), name) else 14

  /** The single catalog of every graft function: name, implementing
    * class, and arity-checked builder. Consumed by BOTH registration
    * paths — [[register]] (runtime, pre-existing session) and
    * [[GraftExtensions]] (SparkSessionExtensions injection) — so they
    * can never drift apart.
    */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct],
      arity("graft_dot", 2)(cs => DotProduct(cs(0), cs(1)))),
    ("graft_word_hashes", classOf[WordHashes],
      arity("graft_word_hashes", 1)(cs => WordHashes(cs(0)))),
    ("graft_shingles", classOf[ShingleHashes],
      arity("graft_shingles", 1, 2)(cs => ShingleHashes(cs(0),
        if (cs.length > 1) litInt(cs(1), "graft_shingles") else 3))),
    ("graft_minhash", classOf[MinHashSig],
      arity("graft_minhash", 2)(cs =>
        MinHashSig(cs(0), litInt(cs(1), "graft_minhash")))),
    ("graft_hplane_sig", classOf[HyperplaneSig],
      arity("graft_hplane_sig", 2)(cs =>
        HyperplaneSig(cs(0), litInt(cs(1), "graft_hplane_sig")))),
    ("graft_rsi_w", classOf[RsiWindow],
      arity("graft_rsi_w", 1, 2)(cs =>
        RsiWindow(cs(0), wilderPeriod(cs, "graft_rsi_w")))),
    ("graft_cmo_w", classOf[CmoWindow],
      arity("graft_cmo_w", 1, 2)(cs =>
        CmoWindow(cs(0), wilderPeriod(cs, "graft_cmo_w")))),
    ("graft_macd_hist_w", classOf[MacdHistWindow],
      arity("graft_macd_hist_w", 1)(cs => MacdHistWindow(cs(0)))),
    ("graft_adx_w", classOf[AdxWindow],
      arity("graft_adx_w", 3, 4)(cs => AdxWindow(cs(0), cs(1), cs(2),
        if (cs.length > 3) litInt(cs(3), "graft_adx_w") else 14))),
    ("graft_adx_hist_w", classOf[AdxHistWindow],
      arity("graft_adx_hist_w", 3, 4)(cs => AdxHistWindow(cs(0), cs(1), cs(2),
        if (cs.length > 3) litInt(cs(3), "graft_adx_hist_w") else 14))),
    ("graft_atr_w", classOf[AtrWindow],
      arity("graft_atr_w", 3, 4)(cs => AtrWindow(cs(0), cs(1), cs(2),
        if (cs.length > 3) litInt(cs(3), "graft_atr_w") else 14))),
    ("graft_wilder_w", classOf[WilderPairWindow],
      arity("graft_wilder_w", 1, 2)(cs =>
        WilderPairWindow(cs(0), wilderPeriod(cs, "graft_wilder_w")))),
    ("graft_adx_pair_w", classOf[AdxPairWindow],
      arity("graft_adx_pair_w", 3, 4)(cs => AdxPairWindow(cs(0), cs(1), cs(2),
        if (cs.length > 3) litInt(cs(3), "graft_adx_pair_w") else 14))),
    ("graft_absdev_sum", classOf[AbsDevSum],
      arity("graft_absdev_sum", 2)(cs => AbsDevSum(cs(0), cs(1)))),
    ("graft_simhash", classOf[SimHash],
      arity("graft_simhash", 2)(cs =>
        SimHash(cs(0), litInt(cs(1), "graft_simhash")))),
    ("graft_minhash_est", classOf[MinHashEst],
      arity("graft_minhash_est", 2)(cs => MinHashEst(cs(0), cs(1)))),
    ("graft_ema3_w", classOf[EmaTripleWindow],
      arity("graft_ema3_w", 2)(cs =>
        EmaTripleWindow(cs(0), litInt(cs(1), "graft_ema3_w")))),
    ("graft_sar_w", classOf[SarWindow],
      arity("graft_sar_w", 3)(cs => SarWindow(cs(0), cs(1), cs(2)))),
    ("graft_adaptive_ema_w", classOf[AdaptiveEmaWindow],
      arity("graft_adaptive_ema_w", 2)(cs => AdaptiveEmaWindow(cs(0), cs(1)))),
    ("graft_ind_w", classOf[IndicatorPackWindow],
      arity("graft_ind_w", 4, 5, 6)(cs => IndicatorPackWindow(
        cs(0), cs(1), cs(2), cs(3),
        if (cs.length > 4) litInt(cs(4), "graft_ind_w") else 14,
        if (cs.length > 5) litInt(cs(5), "graft_ind_w") else 14))),
    ("graft_kalman_w", classOf[KalmanWindow],
      arity("graft_kalman_w", 1)(cs => KalmanWindow(cs(0)))),
    ("graft_ha_w", classOf[HeikinAshiWindow],
      arity("graft_ha_w", 4)(cs =>
        HeikinAshiWindow(cs(0), cs(1), cs(2), cs(3)))),
    ("graft_st_w", classOf[SupertrendWindow],
      arity("graft_st_w", 3)(cs =>
        SupertrendWindow(cs(0), cs(1), cs(2)))),
    ("graft_garch_w", classOf[GarchWindow],
      arity("graft_garch_w", 1)(cs => GarchWindow(cs(0)))),
    ("graft_holt_w", classOf[HoltWindow],
      arity("graft_holt_w", 1)(cs => HoltWindow(cs(0)))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, clazz, b) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.registerFunction(id, new ExpressionInfo(clazz.getName, name), b)
    }
  }
}
