package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions

/** Round-4 risk/microstructure batch: the portfolio- and execution-risk
  * reports a bar warehouse serves next to the indicator surface —
  * historical VaR/CVaR, Amihud illiquidity, Roll's implied spread,
  * weekday calendar effects, and drawdown-spell (underwater) analysis.
  * The reference stops at per-bar indicators (indicators.py); these are
  * the per-ticker rollups built from the same return series.
  *
  * Scale notes: every query is one `hash(ticker)` exchange for the
  * return window, then a per-ticker (or per-weekday) aggregate that
  * collapses map-side — outputs are O(tickers) or O(7) rows. No
  * all-pairs work, no driver collection.
  *
  * Float parity: returns are winsorized at ±1000% and micro-quantized
  * to longs BEFORE any unordered aggregate (cross-partition long sums
  * are exact; |rq| ≤ 1e7 so even double-buffered averages stay below
  * 2^53 and are order-independent). CVaR tail membership is RANK-based
  * (k smallest), not threshold-based, so no interpolated-quantile ulp
  * can flip a row across engines. Roll's covariance folds exact long
  * sums with a textually-mirrored scalar expression; sqrt is correctly
  * rounded on both engines.
  */
object TsRiskQueries {

  private def w = Window.partitionBy("ticker").orderBy("t", "event_id")
  private val Over = "PARTITION BY ticker ORDER BY t, event_id"

  private val r6 = Rounding.r6 _

  /** Per-bar winsorized micro-quantized return (`rq`, long). */
  private def rets(s: SparkSession, dir: String): DataFrame = {
    val pc = lag(col("close"), 1).over(w)
    EventBars.bars(s, dir)
      .withColumn("ret", try_divide(col("close") - pc, pc))
      .filter(col("ret").isNotNull)
      .withColumn("rq",
        round(greatest(least(col("ret"), lit(10.0)), lit(-10.0)) * lit(1e6))
          .cast("long"))
  }

  private val SqlRets =
    s"""r AS (
       |  SELECT ticker, t, event_id, close, volume,
       |    CASE WHEN lag(close, 1) OVER ($Over) <> 0
       |      THEN (close - lag(close, 1) OVER ($Over))
       |           / lag(close, 1) OVER ($Over) END AS ret
       |  FROM bars),
       |rq AS (
       |  SELECT ticker, t, event_id, close, volume, ret,
       |    CAST(round(greatest(least(ret, 10.0), -10.0) * 1e6) AS BIGINT) AS rq
       |  FROM r WHERE ret IS NOT NULL)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLING 20-bar Sharpe & Sortino (per-bar; the per-ticker
    // annualized scalar lives in Ts2Queries.ts_sharpe) over the micro-
    // quantized returns: both moments derive from EXACT long frame
    // sums (rq² ≤ 1e14, 20·s2 and s1² ≤ ~4e16 — far inside Long), so
    // the only floats are the final text-mirrored scalar expressions;
    // zero-variance and zero-downside windows gate to NULL via the
    // same CASE on both engines. One ticker exchange like the rest of
    // the family.
    "ts_roll_sharpe" -> ((s, dir) => {
      val rb = w.rowsBetween(-19, 0)
      rets(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("s1", sum(col("rq")).over(rb))
        .withColumn("s2", sum(col("rq") * col("rq")).over(rb))
        .withColumn("sn2", sum(when(col("rq") < 0L, col("rq") * col("rq"))
          .otherwise(lit(0L))).over(rb))
        .filter(col("rn") >= 20)
        .select(col("ticker"), col("t"), col("event_id"),
          r6(expr("CAST(s1 AS DOUBLE) / 20.0 / 1000000.0")).as("mean_ret"),
          r6(expr("CASE WHEN 20*s2 - s1*s1 = 0 THEN NULL ELSE " +
            "(CAST(s1 AS DOUBLE) / 20.0) / " +
            "sqrt(CAST(20*s2 - s1*s1 AS DOUBLE) / 380.0) END"))
            .as("sharpe"),
          r6(expr("CASE WHEN sn2 = 0 THEN NULL ELSE " +
            "(CAST(s1 AS DOUBLE) / 20.0) / " +
            "sqrt(CAST(sn2 AS DOUBLE) / 20.0) END")).as("sortino"))
    }),

    // Historical VaR(95)/CVaR(95) per ticker. VaR = interpolated 5th
    // percentile (shared quantile_cont-bit-equal kernel); CVaR = mean
    // of the k = floor((n-1)*0.05)+1 SMALLEST returns — rank-based, so
    // the tail set is crisp even when the quantile falls on a tie.
    "ts_var_cvar" -> ((s, dir) => {
      val r = rets(s, dir).withColumn("rqd", col("rq").cast("double"))
      val q = ExactQuantile.groupedLocal(r, "ticker", "rqd", Seq(0.05 -> "q05"))
      val wq = Window.partitionBy("ticker").orderBy("rq", "t", "event_id")
      val tail = r
        .withColumn("_rn0", row_number().over(wq).cast("long") - 1L)
        .withColumn("_n", count(lit(1)).over(Window.partitionBy("ticker")))
        .withColumn("k",
          floor((col("_n") - 1L).cast("double") * lit(0.05)).cast("long"))
        .groupBy("ticker").agg(
          count(lit(1)).as("n"),
          (max(col("k")) + 1L).as("n_tail"),
          sum(when(col("_rn0") <= col("k"), col("rq"))).as("tail_sum"))
      tail.join(broadcast(q), "ticker")
        .select(col("ticker"), col("n"), col("n_tail"),
          r6(-col("q05") / lit(1e6)).as("var95"),
          r6(-(col("tail_sum").cast("double")
            / col("n_tail").cast("double")) / lit(1e6)).as("cvar95"))
    }),

    // Amihud illiquidity: mean |return| per unit of dollar volume.
    // The per-bar ratio is winsorized at 1.0 and nano-quantized before
    // the cross-partition mean (exact long sums).
    "ts_amihud" -> ((s, dir) =>
      rets(s, dir)
        .withColumn("illiq",
          try_divide(abs(col("ret")), col("close") * col("volume")))
        .filter(col("illiq").isNotNull)
        .withColumn("qi", round(least(col("illiq"), lit(1.0)) * lit(1e9))
          .cast("long"))
        .groupBy("ticker").agg(
          count(lit(1)).as("n"),
          (sum(col("qi")).cast("double")
            / count(lit(1)).cast("double") / lit(1e9)).as("amihud_raw"))
        .select(col("ticker"), col("n"), r6(col("amihud_raw")).as("amihud"))),

    // Roll's implied effective spread: 2·sqrt(−cov(Δp_t, Δp_{t−1}))
    // when the serial covariance is negative (else 0). Δp is
    // micro-quantized; the covariance folds the exact long sums in a
    // textually-mirrored scalar expression.
    "ts_roll_spread" -> ((s, dir) => {
      val dp = col("close") - lag(col("close"), 1).over(w)
      // least/greatest SKIP nulls on both engines, so guard the first
      // bar's null Δp explicitly or it would clamp to a fake ±1000.
      val r = EventBars.bars(s, dir)
        .withColumn("d",
          when(dp.isNotNull,
            round(greatest(least(dp, lit(1000.0)), lit(-1000.0)) * lit(1e6))
              .cast("long")))
        .withColumn("dprev", lag(col("d"), 1).over(w))
        .filter(col("d").isNotNull && col("dprev").isNotNull)
      r.groupBy("ticker").agg(
          count(lit(1)).as("n"),
          sum(col("d") * col("dprev")).as("sxy"),
          sum(col("d")).as("sx"),
          sum(col("dprev")).as("sy"))
        .withColumn("cov",
          (col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double")
              / col("n").cast("double")) / col("n").cast("double"))
        .select(col("ticker"), col("n"),
          r6(col("cov") / lit(1e12)).as("serial_cov"),
          r6(when(col("cov") < 0.0,
            lit(2.0) * sqrt(-col("cov")) / lit(1e6)).otherwise(lit(0.0)))
            .as("roll_spread"))
    }),

    // Calendar effects: mean return and up-bar share by day-of-week
    // (integer weekday from the epoch-micro grid; 0 = Thursday epoch
    // anchor folded to ISO-ish 0=Mon via +3). O(7) output rows.
    "ts_calendar" -> ((s, dir) =>
      rets(s, dir)
        .withColumn("dow", expr("(t div 86400000000 + 3) % 7"))
        .groupBy("dow").agg(
          count(lit(1)).as("n"),
          (sum(col("rq")).cast("double")
            / count(lit(1)).cast("double") / lit(1e6)).as("mean_raw"),
          (count(when(col("rq") > 0L, lit(1))).cast("double")
            / count(lit(1)).cast("double")).as("win_raw"))
        .select(col("dow"), col("n"),
          r6(col("mean_raw")).as("mean_ret"),
          r6(col("win_raw")).as("win_rate"))),

    // Drawdown spells: gaps-and-islands over the underwater flag
    // (close below its running max). Per-ticker report: spell count,
    // longest spell in bars and in elapsed micros, total underwater
    // bars — all integer arithmetic.
    "ts_dd_duration" -> ((s, dir) => {
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      val flagged = EventBars.bars(s, dir)
        .withColumn("runmax", max(col("close")).over(cum))
        .withColumn("uw", col("close") < col("runmax"))
        .withColumn("grp",
          sum(when(col("uw"), lit(0)).otherwise(lit(1))).over(cum))
      flagged.filter(col("uw"))
        .groupBy("ticker", "grp").agg(
          count(lit(1)).as("len"),
          (max(col("t")) - min(col("t"))).as("dur"))
        .groupBy("ticker").agg(
          count(lit(1)).as("n_spells"),
          max(col("len")).as("max_spell_bars"),
          max(col("dur")).as("max_spell_us"),
          sum(col("len")).as("underwater_bars"))
    }),

    // 1-D Kalman level filter via the custom AggregateWindowFunction
    // kernel — runs inside the Window operator on the shared ticker
    // exchange; the oracle's recursive CTE spells the identical IEEE
    // op sequence, so outputs are bit-equal (r6 is belt-and-braces).
    "ts_kalman" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("level", expr("graft_kalman_w(close)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("level")).as("level"),
          r6(col("close") - col("level")).as("resid"))
    }),

    // Volatility regime spells: 20-bar realized variance from the
    // micro-quantized returns (exact long frame sums), split at the
    // per-ticker median (shared quantile kernel, broadcast back), then
    // gaps-and-islands over the high/low flag. Integer spell output.
    "ts_regime" -> ((s, dir) => {
      val r = rets(s, dir)
        .withColumn("sq", col("rq") * col("rq"))
        .withColumn("rn", row_number().over(w))
        .withColumn("v20",
          when(col("rn") >= 20, sum(col("sq")).over(w.rowsBetween(-19, 0))))
      val med = ExactQuantile.groupedLocal(
        r.filter(col("v20").isNotNull)
          .withColumn("v20d", col("v20").cast("double")),
        "ticker", "v20d", Seq(0.5 -> "med"))
      val flagged = r.join(broadcast(med), "ticker")
        .filter(col("v20").isNotNull)
        .withColumn("regime",
          when(col("v20").cast("double") > col("med"), lit("high"))
            .otherwise(lit("low")))
        .withColumn("chg",
          when(lag(col("regime"), 1).over(w).isNull
            || lag(col("regime"), 1).over(w) =!= col("regime"), lit(1))
            .otherwise(lit(0)))
        .withColumn("rid",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy("ticker", "rid", "regime").agg(
          count(lit(1)).as("n_bars"),
          min(col("t")).as("start_t"),
          max(col("t")).as("end_t"))
        .drop("rid")
    }))

  private def bars = EventBars.sqlBars

  val oracles: Map[String, String] = Map(

    "ts_roll_sharpe" ->
      s"""WITH bars AS ($bars),
         |$SqlRets,
         |f AS (
         |  SELECT ticker, t, event_id,
         |    row_number() OVER ($Over) AS rn,
         |    sum(rq) OVER fr AS s1,
         |    sum(rq * rq) OVER fr AS s2,
         |    sum(CASE WHEN rq < 0 THEN rq * rq ELSE 0 END) OVER fr AS sn2
         |  FROM rq
         |  WINDOW fr AS ($Over ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         |SELECT ticker, t, event_id,
         |  (round(CAST(s1 AS DOUBLE) / 20.0 / 1000000.0, 6) + 0.0)
         |    AS mean_ret,
         |  (round((CASE WHEN 20*s2 - s1*s1 = 0 THEN NULL ELSE
         |    (CAST(s1 AS DOUBLE) / 20.0) /
         |    sqrt(CAST(20*s2 - s1*s1 AS DOUBLE) / 380.0) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS sharpe,
         |  (round((CASE WHEN sn2 = 0 THEN NULL ELSE
         |    (CAST(s1 AS DOUBLE) / 20.0) /
         |    sqrt(CAST(sn2 AS DOUBLE) / 20.0) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS sortino
         |FROM f WHERE rn >= 20""".stripMargin,

    "ts_var_cvar" ->
      s"""WITH bars AS ($bars),
         |$SqlRets,
         |rk AS (
         |  SELECT ticker, rq,
         |    row_number() OVER (PARTITION BY ticker ORDER BY rq, t, event_id)
         |      - 1 AS rn0,
         |    count(*) OVER (PARTITION BY ticker) AS n
         |  FROM rq),
         |agg AS (
         |  SELECT ticker,
         |    quantile_cont(CAST(rq AS DOUBLE), 0.05) AS q05,
         |    count(*) AS n,
         |    CAST(floor(CAST(max(n) - 1 AS DOUBLE) * 0.05) AS BIGINT) + 1
         |      AS n_tail,
         |    sum(CASE WHEN rn0 <= floor(CAST(n - 1 AS DOUBLE) * 0.05)
         |      THEN rq END) AS tail_sum
         |  FROM rk GROUP BY ticker)
         |SELECT ticker, n, n_tail,
         |  (round(-q05 / 1e6, 6) + 0.0) AS var95,
         |  (round(-(CAST(tail_sum AS DOUBLE) / CAST(n_tail AS DOUBLE)) / 1e6, 6)
         |    + 0.0) AS cvar95
         |FROM agg""".stripMargin,

    "ts_amihud" ->
      s"""WITH bars AS ($bars),
         |$SqlRets,
         |il AS (
         |  SELECT ticker,
         |    CAST(round(least(
         |      CASE WHEN close * volume <> 0
         |        THEN abs(ret) / (close * volume) END, 1.0) * 1e9) AS BIGINT)
         |      AS qi
         |  FROM rq
         |  WHERE (CASE WHEN close * volume <> 0
         |    THEN abs(ret) / (close * volume) END) IS NOT NULL)
         |SELECT ticker, count(*) AS n,
         |  (round(CAST(sum(qi) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e9, 6)
         |    + 0.0) AS amihud
         |FROM il GROUP BY ticker""".stripMargin,

    "ts_roll_spread" ->
      s"""WITH bars AS ($bars),
         |d0 AS (
         |  SELECT ticker, t, event_id,
         |    CASE WHEN lag(close, 1) OVER ($Over) IS NOT NULL
         |      THEN CAST(round(greatest(least(close - lag(close, 1) OVER ($Over),
         |        1000.0), -1000.0) * 1e6) AS BIGINT) END AS d
         |  FROM bars),
         |d1 AS (
         |  SELECT ticker, d, lag(d, 1) OVER ($Over) AS dprev
         |  FROM d0),
         |agg AS (
         |  SELECT ticker, count(*) AS n,
         |    sum(d * dprev) AS sxy, sum(d) AS sx, sum(dprev) AS sy
         |  FROM d1 WHERE d IS NOT NULL AND dprev IS NOT NULL
         |  GROUP BY ticker),
         |c AS (
         |  SELECT *, (CAST(sxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         |    / CAST(n AS DOUBLE) AS cov
         |  FROM agg)
         |SELECT ticker, n,
         |  (round(cov / 1e12, 6) + 0.0) AS serial_cov,
         |  (round(CASE WHEN cov < 0.0 THEN 2.0 * sqrt(-cov) / 1e6
         |    ELSE 0.0 END, 6) + 0.0) AS roll_spread
         |FROM c""".stripMargin,

    "ts_calendar" ->
      s"""WITH bars AS ($bars),
         |$SqlRets,
         |g AS (
         |  SELECT ((t // 86400000000) + 3) % 7 AS dow, rq
         |  FROM rq)
         |SELECT dow, count(*) AS n,
         |  (round(CAST(sum(rq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6, 6)
         |    + 0.0) AS mean_ret,
         |  (round(CAST(count(CASE WHEN rq > 0 THEN 1 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 6) + 0.0) AS win_rate
         |FROM g GROUP BY dow""".stripMargin,

    "ts_dd_duration" ->
      s"""WITH bars AS ($bars),
         |f AS (
         |  SELECT ticker, t, event_id, close,
         |    max(close) OVER ($Over
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
         |  FROM bars),
         |g AS (
         |  SELECT *, close < runmax AS uw,
         |    sum(CASE WHEN close < runmax THEN 0 ELSE 1 END) OVER ($Over
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM f),
         |sp AS (
         |  SELECT ticker, grp, count(*) AS len, max(t) - min(t) AS dur
         |  FROM g WHERE uw GROUP BY ticker, grp)
         |SELECT ticker, count(*) AS n_spells, max(len) AS max_spell_bars,
         |  max(dur) AS max_spell_us, CAST(sum(len) AS BIGINT) AS underwater_bars
         |FROM sp GROUP BY ticker""".stripMargin,

    "ts_kalman" ->
      s"""WITH RECURSIVE bars AS ($bars),
         |kb AS (
         |  SELECT ticker, t, event_id, close,
         |    row_number() OVER ($Over) AS rn
         |  FROM bars),
         |kal AS (
         |  SELECT ticker, t, event_id, close, rn,
         |    close AS x, CAST(1.0 AS DOUBLE) AS p
         |  FROM kb WHERE rn = 1
         |  UNION ALL
         |  SELECT b.ticker, b.t, b.event_id, b.close, b.rn,
         |    r.x + ((r.p + 0.001) / ((r.p + 0.001) + 0.01)) * (b.close - r.x),
         |    (1.0 - ((r.p + 0.001) / ((r.p + 0.001) + 0.01))) * (r.p + 0.001)
         |  FROM kal r JOIN kb b
         |    ON b.ticker = r.ticker AND b.rn = r.rn + 1)
         |SELECT ticker, t, event_id,
         |  (round(x, 6) + 0.0) AS level,
         |  (round(close - x, 6) + 0.0) AS resid
         |FROM kal""".stripMargin,

    "ts_regime" ->
      s"""WITH bars AS ($bars),
         |$SqlRets,
         |k AS (
         |  SELECT ticker, t, event_id, rq, rq * rq AS sq,
         |    row_number() OVER ($Over) AS rn
         |  FROM rq),
         |v AS (
         |  SELECT *, CASE WHEN rn >= 20 THEN sum(sq) OVER ($Over
         |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) END AS v20
         |  FROM k),
         |med AS (
         |  SELECT ticker, quantile_cont(CAST(v20 AS DOUBLE), 0.5) AS med
         |  FROM v WHERE v20 IS NOT NULL GROUP BY ticker),
         |f AS (
         |  SELECT v.*, med FROM v JOIN med USING (ticker)
         |  WHERE v20 IS NOT NULL),
         |g AS (
         |  SELECT *, CASE WHEN CAST(v20 AS DOUBLE) > med
         |    THEN 'high' ELSE 'low' END AS regime
         |  FROM f),
         |h AS (
         |  SELECT *, CASE WHEN lag(regime) OVER ($Over) IS NULL
         |      OR lag(regime) OVER ($Over) <> regime
         |    THEN 1 ELSE 0 END AS chg
         |  FROM g),
         |i AS (
         |  SELECT *, sum(chg) OVER ($Over
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
         |  FROM h)
         |SELECT ticker, regime, count(*) AS n_bars,
         |  min(t) AS start_t, max(t) AS end_t
         |FROM i GROUP BY ticker, rid, regime""".stripMargin)
}
