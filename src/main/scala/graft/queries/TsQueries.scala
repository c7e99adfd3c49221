package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions

/** Round-4 time-series additions on the reference's bar domain
  * (stockdata/indicators.py's TA-Lib family plus the series-analytics a
  * bar warehouse runs next to it): ATR (Wilder-recursive, via the
  * custom AggregateWindowFunction kernel), OBV, Williams %R, Bollinger
  * bands, per-ticker max drawdown, and rolling close↔volume
  * correlation.
  *
  * Scale notes: every query is one `hash(ticker)` exchange + one sort —
  * the same shared-window shape as the indicator pipeline; the two
  * report queries (`ts_drawdown`) collapse map-side to one row per
  * ticker. All double outputs are Rounding.r6'd and every formula is
  * mirrored token-for-token in [[TsQueries.oracles]] (sliding sums may
  * differ from DuckDB's segment-tree fold by ulps; r6 absorbs that,
  * exactly as the frame-indicator suite does).
  */
object TsQueries {

  private def w = Window.partitionBy("ticker").orderBy("t", "event_id")
  private val Over = "PARTITION BY ticker ORDER BY t, event_id"

  /** Cumulative (unbounded-preceding) frame on the ticker series. */
  private def cum = w.rowsBetween(Window.unboundedPreceding, 0)

  private val r6 = Rounding.r6 _

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Wilder ATR via the custom window kernel — recursion stays inside
    // the Window physical operator (no groupByKey hop), same exchange
    // as every other per-ticker indicator.
    "ind_atr" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir).select(col("ticker"), col("t"), col("event_id"),
        r6(expr("graft_atr_w(high, low, close)").over(w)).as("atr"))
    }),

    // On-balance volume: signed-volume running sum. The contributions
    // are integer-valued doubles (volume = 100 + event_id % 97), so the
    // cumulative sum is exact — no rounding needed for parity.
    "ind_obv" -> ((s, dir) => {
      val d = col("close") - lag(col("close"), 1).over(w)
      EventBars.bars(s, dir)
        .withColumn("c",
          when(d.isNull, col("volume"))
            .when(d > 0, col("volume"))
            .when(d < 0, -col("volume"))
            .otherwise(lit(0.0)))
        .select(col("ticker"), col("t"), col("event_id"),
          sum(col("c")).over(cum).as("obv"))
    }),

    // Williams %R over the TA-Lib 14-bar frame, reference-scaled /100:
    // -(hh - close)/(hh - ll). hh-ll ≥ 1 by the bar synthesis
    // (high-low = 0.002·value + 1, value ≥ 0), so the division is safe;
    // try_divide guards it anyway (ANSI mode).
    "ind_willr" -> ((s, dir) => {
      val rb = w.rowsBetween(-13, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("hh", max(col("high")).over(rb))
        .withColumn("ll", min(col("low")).over(rb))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 14,
            -try_divide(col("hh") - col("close"), col("hh") - col("ll"))))
            .as("willr"))
    }),

    // Bollinger bands (20, 2): SMA ± 2σ with the variance written as
    // explicit sliding sums — (Σx² − (Σx)²/n)/n — the SAME expression
    // on both engines (stddev_samp/pop would pit Spark's Welford
    // update against DuckDB's and diverge beyond r6's mask).
    "ind_bbands" -> ((s, dir) => {
      val rb = w.rowsBetween(-19, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("s1", sum(col("close")).over(rb))
        .withColumn("s2", sum(col("close") * col("close")).over(rb))
        .withColumn("mid", col("s1") / lit(20.0))
        .withColumn("sd", sqrt(greatest(
          (col("s2") - col("s1") * col("s1") / lit(20.0)) / lit(20.0),
          lit(0.0))))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 20, col("mid"))).as("bb_mid"),
          r6(when(col("rn") >= 20, col("mid") + lit(2.0) * col("sd"))).as("bb_up"),
          r6(when(col("rn") >= 20, col("mid") - lit(2.0) * col("sd"))).as("bb_dn"))
    }),

    // Per-ticker max drawdown vs the running peak — one window pass,
    // then a map-side-collapsing argmin-struct aggregate (trough picked
    // deterministically: deepest drawdown, earliest (t, event_id) tie).
    // peak > 0 guards the zero prices in the data; rows before the
    // first positive peak carry no drawdown on either engine.
    "ts_drawdown" -> ((s, dir) =>
      EventBars.bars(s, dir)
        .withColumn("peak", max(col("close")).over(cum))
        .withColumn("dd",
          when(col("peak") > 0, (col("close") - col("peak")) / col("peak")))
        .filter(col("dd").isNotNull)
        .groupBy("ticker")
        .agg(count(lit(1)).as("n_bars"),
          r6(min(col("dd"))).as("max_drawdown"),
          min(struct(col("dd"), col("t"), col("event_id")))
            .getField("t").as("trough_t"),
          r6(max(struct(col("t"), col("event_id"), col("dd")))
            .getField("dd")).as("final_drawdown"))),

    // Rolling 20-bar Pearson correlation close↔volume from explicit
    // sliding sums (n·Σxy − ΣxΣy over the √ of the clamped variance
    // product) — identical expression text on both engines; den > 0
    // guard (a clamped-to-0 variance means an undefined correlation).
    "ts_rolling_corr" -> ((s, dir) => {
      val rb = w.rowsBetween(-19, 0)
      val n = lit(20.0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("sx", sum(col("close")).over(rb))
        .withColumn("sy", sum(col("volume")).over(rb))
        .withColumn("sxx", sum(col("close") * col("close")).over(rb))
        .withColumn("syy", sum(col("volume") * col("volume")).over(rb))
        .withColumn("sxy", sum(col("close") * col("volume")).over(rb))
        .withColumn("vx", greatest(n * col("sxx") - col("sx") * col("sx"), lit(0.0)))
        .withColumn("vy", greatest(n * col("syy") - col("sy") * col("sy"), lit(0.0)))
        .withColumn("den", sqrt(col("vx")) * sqrt(col("vy")))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 20 && col("den") > 0,
            (n * col("sxy") - col("sx") * col("sy")) / col("den")))
            .as("corr_cv"))
    }))

  val oracles: Map[String, String] = Map(

    "ind_atr" ->
      s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
         |ab AS (
         |  SELECT ticker, t, event_id, close,
         |    row_number() OVER ($Over) AS rn,
         |    greatest(high, coalesce(lag(close) OVER ($Over), high))
         |      - least(low, coalesce(lag(close) OVER ($Over), low)) AS tr
         |  FROM bars),
         |atr_rec AS (
         |  SELECT ticker, t, event_id, rn, tr AS trsum,
         |    CAST(NULL AS DOUBLE) AS atr
         |  FROM ab WHERE rn = 1
         |  UNION ALL
         |  SELECT b.ticker, b.t, b.event_id, b.rn,
         |    CASE WHEN b.rn <= 14 THEN r.trsum + b.tr ELSE r.trsum END,
         |    CASE WHEN b.rn < 14 THEN CAST(NULL AS DOUBLE)
         |         WHEN b.rn = 14 THEN (r.trsum + b.tr) / 14.0
         |         ELSE (r.atr * 13.0 + b.tr) / 14.0 END
         |  FROM atr_rec r JOIN ab b
         |    ON b.ticker = r.ticker AND b.rn = r.rn + 1)
         |SELECT ticker, t, event_id, (round(atr, 6) + 0.0) AS atr
         |FROM atr_rec""".stripMargin,

    "ind_obv" ->
      s"""WITH bars AS (${EventBars.sqlBars}),
         |d AS (SELECT *, close - lag(close) OVER ($Over) AS d FROM bars),
         |c AS (SELECT *, CASE WHEN d IS NULL THEN volume
         |                     WHEN d > 0 THEN volume
         |                     WHEN d < 0 THEN -volume
         |                     ELSE 0.0 END AS c FROM d)
         |SELECT ticker, t, event_id,
         |  sum(c) OVER ($Over
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv
         |FROM c""".stripMargin,

    "ind_willr" ->
      s"""WITH bars AS (${EventBars.sqlBars}),
         |f AS (SELECT *,
         |    row_number() OVER ($Over) AS rn,
         |    max(high) OVER ($Over
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS hh,
         |    min(low) OVER ($Over
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS ll
         |  FROM bars)
         |SELECT ticker, t, event_id,
         |  (round(CASE WHEN rn >= 14
         |     THEN -((hh - close) / (hh - ll)) END, 6) + 0.0) AS willr
         |FROM f""".stripMargin,

    "ind_bbands" ->
      s"""WITH bars AS (${EventBars.sqlBars}),
         |f AS (SELECT *,
         |    row_number() OVER ($Over) AS rn,
         |    sum(close) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s1,
         |    sum(close * close) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s2
         |  FROM bars),
         |g AS (SELECT *, s1 / 20.0 AS mid,
         |    sqrt(greatest((s2 - s1 * s1 / 20.0) / 20.0, 0.0)) AS sd
         |  FROM f)
         |SELECT ticker, t, event_id,
         |  (round(CASE WHEN rn >= 20 THEN mid END, 6) + 0.0) AS bb_mid,
         |  (round(CASE WHEN rn >= 20 THEN mid + 2.0 * sd END, 6) + 0.0) AS bb_up,
         |  (round(CASE WHEN rn >= 20 THEN mid - 2.0 * sd END, 6) + 0.0) AS bb_dn
         |FROM g""".stripMargin,

    "ts_drawdown" ->
      s"""WITH bars AS (${EventBars.sqlBars}),
         |p AS (SELECT *,
         |    max(close) OVER ($Over
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM bars),
         |d AS (SELECT *, CASE WHEN peak > 0
         |    THEN (close - peak) / peak END AS dd FROM p)
         |SELECT ticker, count(*)::BIGINT AS n_bars,
         |  (round(min(dd), 6) + 0.0) AS max_drawdown,
         |  (min(struct_pack(dd := dd, t := t, event_id := event_id))).t AS trough_t,
         |  (round((max(struct_pack(t := t, event_id := event_id, dd := dd))).dd, 6)
         |    + 0.0) AS final_drawdown
         |FROM d WHERE dd IS NOT NULL
         |GROUP BY ticker""".stripMargin,

    "ts_rolling_corr" ->
      s"""WITH bars AS (${EventBars.sqlBars}),
         |f AS (SELECT *,
         |    row_number() OVER ($Over) AS rn,
         |    sum(close) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sx,
         |    sum(volume) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sy,
         |    sum(close * close) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sxx,
         |    sum(volume * volume) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS syy,
         |    sum(close * volume) OVER ($Over
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sxy
         |  FROM bars),
         |g AS (SELECT *,
         |    greatest(20.0 * sxx - sx * sx, 0.0) AS vx,
         |    greatest(20.0 * syy - sy * sy, 0.0) AS vy
         |  FROM f),
         |h AS (SELECT *, sqrt(vx) * sqrt(vy) AS den FROM g)
         |SELECT ticker, t, event_id,
         |  (round(CASE WHEN rn >= 20 AND den > 0
         |     THEN (20.0 * sxy - sx * sy) / den END, 6) + 0.0) AS corr_cv
         |FROM h""".stripMargin)
}
