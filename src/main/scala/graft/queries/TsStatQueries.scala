package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions
import Ts2Shared._

/** The `ts_*`/`drift_*` half of the former Ts2Queries batch:
  * series-statistics and monitoring — Hurst exponent, rolling beta,
  * pairs spread/z-score, banded DTW vs a broadcast reference series,
  * rolling median, fractional differencing, EWM volatility, GARCH
  * filter, volume/dollar bars, realized vol, market breadth,
  * Corwin-Schultz spread, OU half-life, Sharpe, Ulcer index, ACF,
  * hour-of-day seasonality, CUSUM changepoints, per-day TWAP, and two
  * distribution-drift tests (PSI, two-sample KS) — the
  * analytics/monitoring layer next to the reference's indicator surface
  * (stockdata/indicators.py:178-209).
  *
  * Scale notes: `ts_acf`/`ts_seasonality`/`ts_cusum`/`ts_twap` collapse
  * map-side to tiny per-ticker reports; `drift_psi` aggregates to 10
  * bins against broadcast bounds; `drift_ks` first collapses to the
  * DISTINCT value domain (bounded for quantized/price-like columns —
  * cents at 100 TB) and the [[DistRank]] range-bucketed running sums
  * give the ECDF over the domain — no unpartitioned window at any
  * scale. Every double output is r6'd; formulas are mirrored
  * token-for-token in [[TsStatQueries.oracles]]. Split from Ts2Queries
  * in round 13; the [[Ts2Queries]] facade preserves the registry. */
object TsStatQueries {
  /** FFD(d = 0.4) truncated at [[FracDiffK]] terms; the weight
    * recursion runs driver-side and the literals (shortest
    * round-trip Double strings — both engines parse them back to the
    * identical doubles) splice into one left-to-right sum shared by
    * query and oracle. */
  private val FracDiffK = 10
  private val fracDiffTerms: String = {
    val d = 0.4
    val ws = new Array[Double](FracDiffK)
    ws(0) = 1.0
    for (k <- 1 until FracDiffK) ws(k) = -ws(k - 1) * (d - k + 1) / k
    ws.zipWithIndex.map { case (wk, k) =>
      if (k == 0) s"($wk) * close" else s"($wk) * lag$k"
    }.mkString(" + ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Variance-ratio / Hurst diagnostic per ticker: Var(close_t −
    // close_{t−k}) scales as k^{2H}, so vr_k = var_k / (k·var_1) is 1
    // for a random walk, >1 trending, <1 mean-reverting, and
    // H = 0.5 + ln(vr_8)/(2·ln 8). Lag differences ride the shared
    // ticker window; the variances are three (n, Σ, Σx²) map-side
    // triplets per ticker, spelled (ss − s·s/n)/n on both engines.
    "ts_hurst" -> ((s, dir) => {
      def va(k: String) =
        (col(s"ss$k") - col(s"s$k") * col(s"s$k") / col(s"n$k").cast("double")) /
          col(s"n$k").cast("double")
      EventBars.bars(s, dir)
        .withColumn("r1", col("close") - lag(col("close"), 1).over(w))
        .withColumn("r2", col("close") - lag(col("close"), 2).over(w))
        .withColumn("r8", col("close") - lag(col("close"), 8).over(w))
        .groupBy("ticker")
        .agg(count(col("r1")).as("n1"), sum(col("r1")).as("s1"),
          sum(col("r1") * col("r1")).as("ss1"),
          count(col("r2")).as("n2"), sum(col("r2")).as("s2"),
          sum(col("r2") * col("r2")).as("ss2"),
          count(col("r8")).as("n8"), sum(col("r8")).as("s8"),
          sum(col("r8") * col("r8")).as("ss8"))
        .filter(col("n8") >= 1)
        .withColumn("var1", va("1"))
        .withColumn("vr2", expr("try_divide(" +
          "(ss2 - s2*s2/CAST(n2 AS DOUBLE))/CAST(n2 AS DOUBLE), 2.0 * var1)"))
        .withColumn("vr8", expr("try_divide(" +
          "(ss8 - s8*s8/CAST(n8 AS DOUBLE))/CAST(n8 AS DOUBLE), 8.0 * var1)"))
        .select(col("ticker"), col("n1").as("n_ret"),
          r6(col("vr2")).as("vr_2"), r6(col("vr8")).as("vr_8"),
          r6(lit(0.5) + log(col("vr8")) / (lit(2.0) * log(lit(8.0))))
            .as("hurst"))
    }),

    // Per-ticker market beta/alpha/correlation against the equal-weight
    // market daily return. Everything that crosses a shuffle is an
    // EXACT integer: daily closes collapse to cent-longs (argmax
    // structs), daily returns quantize to micro-units, the per-day
    // market mean re-quantizes, and the per-ticker comoment sums are
    // long arithmetic — only the final beta/alpha/corr divisions run in
    // (deterministic, exactly-derived) doubles. Four exchanges, each
    // over the DAILY rollup, never the raw bars.
    "ts_beta" -> ((s, dir) => {
      val wt = Window.partitionBy("ticker").orderBy("day")
      val wd = Window.partitionBy("day")
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .groupBy("ticker", "day")
        .agg(max(struct(col("t"), col("event_id"), col("c"))).as("lc"))
        .select(col("ticker"), col("day"), col("lc.c").as("c"))
        .withColumn("prev", lag(col("c"), 1).over(wt))
        // returns winsorized at ±1000% — a penny-stock prev close would
        // otherwise blow the micro-unit square past Long range (and
        // dominate the moments); robust beta clips it on both engines
        .withColumn("r", expr("greatest(least(" +
          "CAST(round(try_divide(CAST(c AS DOUBLE), " +
          "CAST(prev AS DOUBLE)) * 1000000.0 - 1000000.0) AS BIGINT), " +
          "10000000L), -10000000L)"))
        .filter(col("r").isNotNull)
        .withColumn("mkt", expr("CAST(round(CAST(sum(r) OVER " +
          "(PARTITION BY day) AS DOUBLE) / CAST(count(r) OVER " +
          "(PARTITION BY day) AS DOUBLE)) AS BIGINT)"))
        .groupBy("ticker")
        .agg(count(lit(1)).as("n_days"),
          sum(col("r")).as("sx"), sum(col("mkt")).as("sy"),
          sum(col("r") * col("mkt")).as("sxy"),
          sum(col("r") * col("r")).as("sxx"),
          sum(col("mkt") * col("mkt")).as("syy"))
        .filter(col("n_days") >= 3)
        .withColumn("beta", expr("try_divide(" +
          "CAST(n_days AS DOUBLE)*CAST(sxy AS DOUBLE)" +
          " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE), " +
          "CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)" +
          " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))"))
        .select(col("ticker"), col("n_days"), r6(col("beta")).as("beta"),
          r6(expr("(CAST(sx AS DOUBLE) - beta*CAST(sy AS DOUBLE))" +
            "/CAST(n_days AS DOUBLE)/1000000.0")).as("alpha"),
          r6(expr("try_divide(" +
            "CAST(n_days AS DOUBLE)*CAST(sxy AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE), " +
            "sqrt((CAST(n_days AS DOUBLE)*CAST(sxx AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))" +
            " * (CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)" +
            " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))))")).as("corr"))
    }),

    // Pairs-trading screen vs the reference ticker (min ticker id):
    // per-ticker hedge ratio β = OLS of daily close LEVELS on the
    // reference's (exact cent-integer comoments, one double division),
    // then the spread sₜ = Pₐ − β·P_ref rounded to integer cents and
    // its diagnostics — spread vol and the lag-1 autocorrelation ρ₁
    // (the mean-reversion screen: ρ₁ ≪ 1 = tradeable pair). Every
    // cross-partition sum is an exact long; the BIGINT variance terms
    // n·Σx² − (Σx)² are exactly ≥ 0, so zero-variance guards compare
    // integers, not doubles. Scale: one daily rollup exchange, the
    // reference series broadcast, two aligned ticker exchanges.
    "ts_pairs_spread" -> ((s, dir) => {
      val dc = EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .groupBy("ticker", "day")
        .agg(max(struct(col("t"), col("event_id"), col("c"))).as("lc"))
        .select(col("ticker"), col("day"), col("lc.c").as("c"))
        .localCheckpoint()
      val ref = dc.agg(min(col("ticker")).as("rt"))
      val dr = dc.crossJoin(broadcast(ref))
        .filter(col("ticker") === col("rt"))
        .select(col("day"), col("c").as("cr"))
      val pj = dc.crossJoin(broadcast(ref))
        .filter(col("ticker") =!= col("rt"))
        .join(broadcast(dr), Seq("day"))
        .select(col("ticker"), col("day"), col("c").as("ca"), col("cr"))
        .localCheckpoint()
      val bt = pj.groupBy("ticker")
        .agg(count(lit(1)).as("n_days"),
          sum(col("ca")).as("sx"), sum(col("cr")).as("sy"),
          sum(col("ca") * col("cr")).as("sxy"),
          sum(col("cr") * col("cr")).as("syy"))
        .filter(col("n_days") >= 3)
        .withColumn("dn",
          expr("n_days * syy - sy * sy"))
        .withColumn("beta", expr("CASE WHEN dn = 0 THEN NULL ELSE " +
          "CAST(n_days * sxy - sx * sy AS DOUBLE) / CAST(dn AS DOUBLE) END"))
        .select(col("ticker"), col("n_days"), col("beta"))
      val wt2 = Window.partitionBy("ticker").orderBy("day")
      pj.join(bt, Seq("ticker"))
        .withColumn("sm", expr("CAST(round(CAST(ca AS DOUBLE) " +
          "- beta * CAST(cr AS DOUBLE)) AS BIGINT)"))
        .withColumn("sl", lag(col("sm"), 1).over(wt2))
        .groupBy("ticker", "n_days", "beta")
        .agg(sum(col("sm")).as("vs"), sum(col("sm") * col("sm")).as("vss"),
          count(col("sl")).as("n2"),
          sum(when(col("sl").isNotNull, col("sm")).otherwise(0L)).as("ps"),
          sum(when(col("sl").isNotNull, col("sl")).otherwise(0L)).as("pl"),
          sum(col("sm") * col("sl")).as("psl"),
          sum(when(col("sl").isNotNull, col("sm") * col("sm"))
            .otherwise(0L)).as("pss"),
          sum(col("sl") * col("sl")).as("pll"))
        .withColumn("da", expr("n2 * pss - ps * ps"))
        .withColumn("db", expr("n2 * pll - pl * pl"))
        .select(col("ticker"), col("n_days"), r6(col("beta")).as("beta"),
          r6(expr("sqrt(CAST(n_days * vss - vs * vs AS DOUBLE)) " +
            "/ CAST(n_days AS DOUBLE) / 100.0")).as("spread_vol"),
          r6(expr("CASE WHEN da = 0 OR db = 0 THEN NULL ELSE " +
            "CAST(n2 * psl - ps * pl AS DOUBLE) " +
            "/ (sqrt(CAST(da AS DOUBLE)) * sqrt(CAST(db AS DOUBLE))) END"))
            .as("rho1"))
    }),

    // Dynamic-time-warping distance of every ticker's daily-close
    // series to the reference ticker's (min id) — the elastic
    // similarity screen fixed-lag correlation can't give (it matches
    // shifted/stretched shapes). Sakoe-Chiba band w = 3 bounds the DP
    // to O(L·w) useful cells; the whole DP runs as a NESTED
    // SEQUENTIAL FOLD inside one projection (outer fold over rows i,
    // accumulator = previous DP row; inner fold over columns j,
    // accumulator = the row built so far) — both engines execute the
    // identical fold order, so the doubles match bit-for-bit with no
    // quantization needed. Scale shape: one daily rollup exchange, one
    // per-ticker sorted-array fold (≤ ~31 entries), the reference
    // array a broadcast literal-sized join; the DP itself is
    // scan-local per ticker.
    "ts_dtw_ref" -> ((s, dir) => {
      val dc = EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .groupBy("ticker", "day")
        .agg(max(struct(col("t"), col("event_id"), col("c"))).as("lc"))
        .select(col("ticker"), col("day"), col("lc.c").as("c"))
        .localCheckpoint()
      val arr = dc.groupBy("ticker")
        .agg(expr("transform(array_sort(collect_list(struct(day, c))), " +
          "s -> s.c)").as("xs"))
        .localCheckpoint()
      val ref = arr.crossJoin(broadcast(
          dc.agg(min(col("ticker")).as("rt"))))
        .filter(col("ticker") === col("rt"))
        .select(col("xs").as("ys"))
      // inner fold: one DP row given prev row P (i = 1 has no P)
      def rowF(p: String, i: String): String =
        s"aggregate(sequence(1, size(ys)), CAST(array() AS ARRAY<DOUBLE>), " +
          s"(acc, j) -> concat(acc, array(" +
          s"CASE WHEN abs($i - j) > w THEN CAST('Infinity' AS DOUBLE) ELSE " +
          s"abs(CAST(element_at(xs, $i) - element_at(ys, j) AS DOUBLE)) + " +
          s"CASE WHEN $i = 1 AND j = 1 THEN 0.0D " +
          s"WHEN $i = 1 THEN element_at(acc, j - 1) " +
          s"WHEN j = 1 THEN element_at($p, j) " +
          s"ELSE least(element_at($p, j), element_at($p, j - 1), " +
          s"element_at(acc, j - 1)) END END)))"
      arr.crossJoin(broadcast(ref))
        .filter(expr("size(xs) >= 5 AND size(ys) >= 5"))
        // the band must cover the length mismatch or the DP corner is
        // unreachable (Infinity) — standard Sakoe-Chiba adaptation
        .withColumn("w", expr("greatest(3, abs(size(xs) - size(ys)) + 1)"))
        .withColumn("row1", expr(rowF("CAST(NULL AS ARRAY<DOUBLE>)", "1")))
        .withColumn("dp", expr(
          // Spark sequence(2, 1) DESCENDS instead of emptying — guard
          "IF(size(xs) >= 2, aggregate(sequence(2, size(xs)), row1, " +
            s"(P, i) -> ${rowF("P", "i")}), row1)"))
        .select(col("ticker"),
          expr("CAST(size(xs) AS BIGINT)").as("n_days"),
          r6(expr("element_at(dp, size(ys)) / 100.0")).as("dtw"))
    }),

    // Rolling exact median + IQR over a 21-bar frame. Quantiles
    // interpolate over CENT-LONGS, so every interpolated value is an
    // exact multiple of 0.25 cents — Spark's (1−f)·a + f·b and
    // DuckDB's a + (b−a)·f are bit-equal on exact inputs, which they
    // are NOT on arbitrary doubles (that 1-ulp formula gap is why the
    // frame feeds integers). One exchange; the sort amortizes across
    // all three quantiles.
    "ts_rolling_median" -> ((s, dir) => {
      val rb = w.rowsBetween(-20, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .withColumn("med", expr("percentile(c, 0.5D)").over(rb))
        .withColumn("q1", expr("percentile(c, 0.25D)").over(rb))
        .withColumn("q3", expr("percentile(c, 0.75D)").over(rb))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 21, col("med") / lit(100.0))).as("roll_med"),
          r6(when(col("rn") >= 21, (col("q3") - col("q1")) / lit(100.0)))
            .as("roll_iqr"))
    }),

    // Fractional differentiation (fixed-width FFD, d = 0.4, 10 terms):
    // the quant-ML stationarity transform that keeps long memory a
    // full integer difference destroys. Weights follow the binomial
    // recursion w_k = −w_{k−1}·(d−k+1)/k, computed ONCE driver-side
    // and embedded as double literals in an expression whose textual
    // term order is identical on both engines (left-to-right sum of
    // 10 products → bit-equal); warm-up rows (< 10 bars) drop, like
    // the reference pipelines drop indicator warm-ups. One ticker
    // exchange; the lags share the one sort.
    "ts_fracdiff" -> ((s, dir) => {
      val terms = fracDiffTerms
      val base = EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
      (1 until FracDiffK).foldLeft(base) { (d2, k) =>
        d2.withColumn(s"lag$k", lag(col("close"), k).over(w))
      }
        .filter(col("rn") >= FracDiffK)
        .select(col("ticker"), col("t"), col("event_id"),
          r6(expr(terms)).as("fracdiff"))
    }),

    // RiskMetrics-style EWMA volatility, λ = 0.9 (= the EMA(19) decay,
    // so the shared single-state kernel drives it): v_t = λ·v_{t−1} +
    // (1−λ)·r², seeded 0 at each ticker's first bar (no return yet).
    // One exchange; the recursion runs in the same
    // AggregateWindowFunction state machine as the EMA family.
    "ts_ewm_vol" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("r", col("close") - lag(col("close"), 1).over(w))
        .withColumn("x", coalesce(col("r") * col("r"), lit(0.0)))
        .withColumn("v", expr("graft_ema3_w(x, 19)").over(w).getField("e1"))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("v")).as("ewm_var"),
          r6(sqrt(col("v"))).as("ewm_vol"))
    }),

    // GARCH(1,1)-style conditional variance: squared price-diff
    // innovations through the ω + α·x + β·y recursion (see
    // [[graft.functions.GarchWindow]]) — the ω > 0 mean-reversion
    // floor ts_ewm_vol's plain EWMA lacks. Innovation and recursion
    // share the one ticker exchange.
    "ts_garch" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("r", col("close") - lag(col("close"), 1).over(w))
        .withColumn("x", coalesce(col("r") * col("r"), lit(0.0)))
        .withColumn("v", expr("graft_garch_w(x)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("v")).as("cond_var"),
          r6(sqrt(col("v"))).as("cond_vol"))
    }),

    // Event-driven VOLUME bars (the information-driven sampling
    // alternative to time bars): a bar closes every 10 000 shares.
    // Volumes are integer-valued, so the running total and the bar
    // assignment are exact integer arithmetic; OHLC per bar is the
    // argmin/argmax-struct rollup riding the same ticker exchange.
    "ts_volume_bars" -> ((s, dir) => {
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      EventBars.bars(s, dir)
        .withColumn("cv", sum(col("volume")).over(cum).cast("long"))
        .withColumn("bar",
          expr("(cv - CAST(volume AS BIGINT)) div 10000"))
        .groupBy("ticker", "bar")
        .agg(
          min(struct(col("t"), col("event_id"), col("open"))).as("o"),
          max(struct(col("t"), col("event_id"), col("close"))).as("c"),
          max(col("high")).as("mx"), min(col("low")).as("mn"),
          sum(col("volume")).cast("long").as("bar_volume"),
          count(lit(1)).as("n_events"),
          min(col("t")).as("t_open"), max(col("t")).as("t_close"))
        .select(col("ticker"), col("bar"),
          r6(col("o.open")).as("open"), r6(col("mx")).as("high"),
          r6(col("mn")).as("low"), r6(col("c.close")).as("close"),
          col("bar_volume"), col("n_events"), col("t_open"), col("t_close"))
    }),

    // Per-day realized volatility: √Σ r² over each day's intraday
    // returns. Returns quantize to micro-longs (winsorized ±1000% —
    // the ts_beta treatment), so the squared sum crossing the shuffle
    // is exact; the root runs on the |ticker·day|-row rollup.
    "ts_realized_vol" -> ((s, dir) => {
      val wd = Window.partitionBy("ticker", "day").orderBy("t", "event_id")
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .withColumn("prev", lag(col("c"), 1).over(wd))
        .withColumn("r", expr("greatest(least(" +
          "CAST(round(try_divide(CAST(c AS DOUBLE), " +
          "CAST(prev AS DOUBLE)) * 1000000.0 - 1000000.0) AS BIGINT), " +
          "10000000L), -10000000L)"))
        .filter(col("r").isNotNull)
        .groupBy("ticker", "day")
        .agg(count(lit(1)).as("n_ret"),
          sum(col("r") * col("r")).as("ss"))
        .select(col("ticker"), col("day"), col("n_ret"),
          r6(expr("sqrt(CAST(ss AS DOUBLE)) / 1000000.0")).as("rv"))
    }),

    // Cross-sectional market breadth: per timestamp, the fraction of
    // tickers trading above their own 20-bar SMA — the
    // two-orthogonal-partitionings shape (per-ticker frame window,
    // then a re-shuffle keyed by TIME for the cross-section; at 100 TB
    // these are different exchanges by construction and neither can
    // subsume the other). The above-SMA test multiplies close by the
    // constant frame size instead of dividing the sum — one fewer
    // float op on the compared values; counts after the compare are
    // exact integers.
    "ts_breadth" -> ((s, dir) => {
      val wf = w.rowsBetween(-19, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("s20", sum(col("close")).over(wf))
        .filter(col("rn") >= 20)
        .groupBy("t").agg(
          count(lit(1)).as("n_tickers"),
          sum(when(expr("close * 20.0D > s20"), 1L).otherwise(0L))
            .as("n_above"))
        .select(col("t"), col("n_tickers"), col("n_above"),
          r6(col("n_above").cast("double")
            / col("n_tickers").cast("double")).as("breadth"))
    }),

    // Corwin-Schultz bid-ask spread estimator from daily high/low
    // ranges (the classic low-frequency spread proxy). Daily extremes
    // are exact max/min picks; the two-day β/γ/α chain is per-row
    // transcendental math over those exact inputs with the guard
    // CASEs mirrored verbatim (ln of a non-positive low must be NULL
    // on both engines, not a NaN/-inf disagreement).
    "ts_spread_cs" -> ((s, dir) => {
      val wt = Window.partitionBy("ticker").orderBy("day")
      val beta = "CASE WHEN l0 > 0 AND l1 > 0 THEN " +
        "ln(h1/l1)*ln(h1/l1) + ln(h0/l0)*ln(h0/l0) END"
      val gamma = "CASE WHEN least(l0, l1) > 0 THEN " +
        "ln(greatest(h0, h1)/least(l0, l1))" +
        "*ln(greatest(h0, h1)/least(l0, l1)) END"
      val alpha = "(sqrt(2.0*beta) - sqrt(beta))/(3.0 - 2.0*sqrt(2.0))" +
        " - sqrt(gamma/(3.0 - 2.0*sqrt(2.0)))"
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .groupBy("ticker", "day")
        .agg(max(col("high")).as("h0"), min(col("low")).as("l0"))
        .withColumn("h1", lag(col("h0"), 1).over(wt))
        .withColumn("l1", lag(col("l0"), 1).over(wt))
        .withColumn("beta", expr(beta))
        .withColumn("gamma", expr(gamma))
        .withColumn("alpha", expr(alpha))
        .select(col("ticker"), col("day"),
          r6(col("beta")).as("beta"), r6(col("gamma")).as("gamma"),
          r6(expr("2.0*(exp(alpha) - 1.0)/(1.0 + exp(alpha))"))
            .as("cs_spread"))
    }),

    // Mean-reversion half-life via the AR(1) regression Δc = α + β·c₋₁:
    // β from exact cent-integer comoments (the ts_beta treatment), then
    // halflife = −ln2 / ln(1+β) for the mean-reverting branch
    // (−1 < β < 0); NULL otherwise. One ticker window + one exchange.
    "ts_ou_halflife" -> ((s, dir) => {
      EventBars.bars(s, dir)
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .withColumn("p", lag(col("c"), 1).over(w))
        .filter(col("p").isNotNull)
        .withColumn("d", col("c") - col("p"))
        .groupBy("ticker")
        .agg(count(lit(1)).as("n"),
          sum(col("p")).as("sx"), sum(col("d")).as("sy"),
          sum(col("p") * col("d")).as("sxy"),
          sum(col("p") * col("p")).as("sxx"))
        .filter(col("n") >= 3)
        .withColumn("beta", expr("try_divide(" +
          "CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)" +
          " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE), " +
          "CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"))
        .select(col("ticker"), col("n").as("n_obs"),
          r6(col("beta")).as("ar1_beta"),
          r6(expr("CASE WHEN beta > -1.0 AND beta < 0.0 " +
            "THEN -ln(2.0) / ln(1.0 + beta) END")).as("halflife"))
    }),

    // Annualized Sharpe ratio from daily closes: mean/σ of the exact
    // micro-quantized daily returns (winsorized, the ts_beta
    // treatment) × √252. Variance spelled (Σx² − (Σx)²/n)/(n−1) from
    // exact longs on both engines.
    "ts_sharpe" -> ((s, dir) => {
      val wt = Window.partitionBy("ticker").orderBy("day")
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("c", expr("CAST(round(close * 100) AS BIGINT)"))
        .groupBy("ticker", "day")
        .agg(max(struct(col("t"), col("event_id"), col("c")))
          .getField("c").as("c"))
        .withColumn("prev", lag(col("c"), 1).over(wt))
        .withColumn("r", expr("greatest(least(" +
          "CAST(round(try_divide(CAST(c AS DOUBLE), " +
          "CAST(prev AS DOUBLE)) * 1000000.0 - 1000000.0) AS BIGINT), " +
          "10000000L), -10000000L)"))
        .filter(col("r").isNotNull)
        .groupBy("ticker")
        .agg(count(lit(1)).as("n"), sum(col("r")).as("sx"),
          sum(col("r") * col("r")).as("ss"))
        .filter(col("n") >= 3)
        .withColumn("mu", expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("sd", expr("sqrt((CAST(ss AS DOUBLE)" +
          " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))" +
          "/(CAST(n AS DOUBLE) - 1.0))"))
        .select(col("ticker"), col("n").as("n_days"),
          r6(expr("mu / 1000000.0")).as("mean_ret"),
          r6(expr("sd / 1000000.0")).as("sd_ret"),
          r6(expr("try_divide(mu, sd) * sqrt(252.0)")).as("sharpe"))
    }),

    // Ulcer index per ticker: √mean(drawdown%²) against the running
    // peak. Drawdowns quantize to micro-percent BEFORE the squared
    // sum crosses the shuffle (exact longs); running max is
    // order-insensitive. One exchange.
    "ts_ulcer" -> ((s, dir) => {
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      EventBars.bars(s, dir)
        .withColumn("pk", max(col("close")).over(cum))
        .withColumn("dd", expr("CAST(round(" +
          "try_divide(close, pk) * 1000000.0 - 1000000.0)" +
          " AS BIGINT)"))
        .filter(col("dd").isNotNull)
        .groupBy("ticker")
        .agg(count(lit(1)).as("n_bars"),
          sum(col("dd") * col("dd")).as("ss"))
        .select(col("ticker"), col("n_bars"),
          r6(expr("sqrt(CAST(ss AS DOUBLE) / CAST(n_bars AS DOUBLE))" +
            " / 1000000.0")).as("ulcer"))
    }),

    // Per-ticker autocorrelation at lags 1..5: ONE window pass emits all
    // five lag columns, stack() longifies, and the Pearson corr of each
    // (x_t, x_{t−k}) pair set collapses map-side via explicit sums.
    "ts_acf" -> ((s, dir) => {
      val b = EventBars.bars(s, dir)
        .withColumn("x1", lag(col("close"), 1).over(w))
        .withColumn("x2", lag(col("close"), 2).over(w))
        .withColumn("x3", lag(col("close"), 3).over(w))
        .withColumn("x4", lag(col("close"), 4).over(w))
        .withColumn("x5", lag(col("close"), 5).over(w))
        .select(col("ticker"), col("close").as("y"),
          expr("stack(5, 1, x1, 2, x2, 3, x3, 4, x4, 5, x5) AS (lag_k, x)"))
        .filter(col("x").isNotNull)
      val n = col("n").cast("double")
      b.groupBy("ticker", "lag_k")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("vx", greatest(n * col("sxx") - col("sx") * col("sx"), lit(0.0)))
        .withColumn("vy", greatest(n * col("syy") - col("sy") * col("sy"), lit(0.0)))
        .withColumn("den", sqrt(col("vx")) * sqrt(col("vy")))
        .select(col("ticker"), col("lag_k"), col("n").as("n_pairs"),
          r6(when(col("den") > 0,
            (n * col("sxy") - col("sx") * col("sy")) / col("den"))).as("acf"))
    }),

    // Hour-of-day seasonality profile: (ticker, hour) partials collapse
    // map-side; the ticker-level mean rides a window over the 24-row
    // groups (no join back, no second exchange over the raw rows).
    // Sums run in exact integer CENTS (2-decimal prices): double sums
    // here are ulp-order-dependent across engines AND the /2^k group
    // sizes park the results exactly on 6-decimal rounding midpoints —
    // integer sums make both engines' pre-round doubles bit-identical.
    "ts_seasonality" -> ((s, dir) => {
      val wt = Window.partitionBy("ticker")
      EventBars.bars(s, dir)
        .withColumn("hod", expr("(t div 3600000000) % 24"))
        .withColumn("cents", round(col("close") * lit(100.0), 0).cast("long"))
        .groupBy("ticker", "hod")
        .agg(count(lit(1)).as("n_bars"), sum(col("cents")).as("sc"))
        .withColumn("tot_n", sum(col("n_bars")).over(wt))
        .withColumn("tot_s", sum(col("sc")).over(wt))
        .select(col("ticker"), col("hod"), col("n_bars"),
          r6(col("sc") / lit(100.0) / col("n_bars")).as("avg_close"),
          r6(col("sc") / lit(100.0) / col("n_bars")
            - col("tot_s") / lit(100.0) / col("tot_n")).as("dev"))
    }),

    // CUSUM changepoint report: running Σ(close − ticker mean), then the
    // deepest |cusum| with earliest-(t,event_id) tiebreak — one exchange,
    // map-side-collapsing argmin-struct aggregate (same determinism
    // treatment as ts_drawdown's trough).
    // Exact-integer formulation: Σᵢ(closeᵢ − mean) over the first k rows
    // = (cum_cents·n − k·tot_cents) / (100·n) — the numerator is exact
    // long arithmetic, so the cusum doubles are bit-identical across
    // engines (a float mean would put /2^k partitions on rounding
    // midpoints, as in ts_seasonality).
    "ts_cusum" -> ((s, dir) => {
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      val wt = Window.partitionBy("ticker")
      EventBars.bars(s, dir)
        .withColumn("cents", round(col("close") * lit(100.0), 0).cast("long"))
        .withColumn("totc", sum(col("cents")).over(wt))
        .withColumn("nt", count(lit(1)).over(wt))
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("cumc", sum(col("cents")).over(cum))
        .withColumn("cusum",
          (col("cumc") * col("nt") - col("k") * col("totc"))
            / (lit(100.0) * col("nt")))
        .withColumn("ca", abs(col("cusum")))
        .groupBy("ticker")
        .agg(count(lit(1)).as("n_bars"),
          r6(max(col("ca"))).as("max_cusum"),
          min(struct(negate(col("ca")), col("t"), col("event_id")))
            .getField("t").as("cp_t"))
    }),

    // Permutation entropy (Bandt & Pompe, PRL'02), order 3: each
    // consecutive close triple maps to its ordinal pattern (3 strict
    // pairwise comparisons packed into a 3-bit id — 6 of the 8 codes
    // are realizable), per-ticker pattern counts are exact longs, and
    // H = −Σ (c/n)·ln(c/n) sums NANO-quantized integer terms (≤ 6 per
    // ticker) so the shuffle order of a double sum can never bite;
    // normalized by ln(6) = the entropy of a fully random series.
    // Complexity/regime readout: ~1 random walk, ≪1 trending/templated.
    // One ticker exchange for the lags, alphabet-sized aggregates after.
    "ts_perm_entropy" -> ((s, dir) => {
      val pat = EventBars.bars(s, dir)
        .withColumn("c0", lag(col("close"), 2).over(w))
        .withColumn("c1", lag(col("close"), 1).over(w))
        .filter(col("c0").isNotNull && col("c1").isNotNull)
        .withColumn("pat",
          when(col("c0") < col("c1"), 1L).otherwise(0L)
            + when(col("c1") < col("close"), 2L).otherwise(0L)
            + when(col("c0") < col("close"), 4L).otherwise(0L))
        .groupBy("ticker", "pat").agg(count(lit(1)).as("c"))
      pat
        .withColumn("n", sum(col("c")).over(Window.partitionBy("ticker")))
        .withColumn("term_nano", expr(
          "CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))" +
            " * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))" +
            " * 1000000000.0) AS BIGINT)"))
        .groupBy("ticker")
        .agg(max(col("n")).as("n_triples"),
          count(lit(1)).as("n_patterns"),
          sum(col("term_nano")).as("hn"))
        .select(col("ticker"), col("n_triples"), col("n_patterns"),
          r6(expr("CAST(hn AS DOUBLE) / 1000000000.0")).as("perm_entropy"),
          r6(expr("CAST(hn AS DOUBLE) / 1000000000.0" +
            " / ln(CAST(6.0 AS DOUBLE))")).as("perm_entropy_norm"))
    }),

    // Binary-segmentation changepoint detection, depth 2 (the
    // top-down face of ts_cusum's single scan): the root split
    // maximizes the exact SSE-reduction gain G(k) = S_k²/k +
    // (T−S_k)²/(n−k) − T²/n over cents prefix sums, then each half is
    // split again by the SAME formula re-based onto the segment's
    // prefix-sum window — no re-partitioning, the level-2 gains read
    // the level-1 cumsum through one per-ticker join. Every G input
    // is an exact BIGINT (cents quantization), the double expression
    // is textually mirrored, and ties break (gain DESC, k) —
    // deterministic argmax on both engines. Output: up to three rows
    // per ticker (root/left/right) with split position, time, gain,
    // and the two segment means. One ticker exchange end-to-end.
    "ts_binseg" -> ((s, dir) => {
      val wt = Window.partitionBy("ticker")
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      val base = EventBars.bars(s, dir)
        .withColumn("cents", round(col("close") * lit(100.0), 0).cast("long"))
        .withColumn("nt", count(lit(1)).over(wt))
        .withColumn("tot", sum(col("cents")).over(wt))
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("cs", sum(col("cents")).over(cum))
        .select("ticker", "t", "k", "cs", "nt", "tot")
        .localCheckpoint()
      def gain(sl: String, k: String, tot: String, n: String) =
        s"(CAST($sl AS DOUBLE)*CAST($sl AS DOUBLE))/CAST($k AS DOUBLE)" +
          s" + (CAST(($tot) - ($sl) AS DOUBLE)*CAST(($tot) - ($sl) AS DOUBLE))" +
          s"/CAST(($n) - ($k) AS DOUBLE)" +
          s" - (CAST($tot AS DOUBLE)*CAST($tot AS DOUBLE))/CAST($n AS DOUBLE)"
      def mean(s0: String, k0: String) =
        s"CAST($s0 AS DOUBLE) / 100.0 / CAST($k0 AS DOUBLE)"
      val g1 = base.filter(col("k") < col("nt"))
        .withColumn("g", expr(gain("cs", "k", "tot", "nt")))
        .withColumn("r", expr(
          "row_number() OVER (PARTITION BY ticker ORDER BY g DESC, k)"))
        .filter(col("r") === 1)
        .select(col("ticker"), col("k").as("k1"), col("cs").as("s1"),
          col("t").as("t1"), col("g").as("gr"), col("nt").as("n1"),
          col("tot").as("tot1"))
        .localCheckpoint()
      val root = g1.select(col("ticker"), lit("root").as("seg"),
        col("k1").as("k"), col("t1").as("t"), r6(col("gr")).as("gain"),
        r6(expr(mean("s1", "k1"))).as("mean_l"),
        r6(expr(mean("tot1 - s1", "n1 - k1"))).as("mean_r"))
      val joined = base.join(g1, "ticker")
      val left = joined.filter(col("k") < col("k1"))
        .withColumn("g", expr(gain("cs", "k", "s1", "k1")))
        .withColumn("r", expr(
          "row_number() OVER (PARTITION BY ticker ORDER BY g DESC, k)"))
        .filter(col("r") === 1)
        .select(col("ticker"), lit("left").as("seg"), col("k"), col("t"),
          r6(col("g")).as("gain"),
          r6(expr(mean("cs", "k"))).as("mean_l"),
          r6(expr(mean("s1 - cs", "k1 - k"))).as("mean_r"))
      val right = joined.filter(col("k") > col("k1") && col("k") < col("nt"))
        .withColumn("g",
          expr(gain("cs - s1", "k - k1", "tot - s1", "nt - k1")))
        .withColumn("r", expr(
          "row_number() OVER (PARTITION BY ticker ORDER BY g DESC, k)"))
        .filter(col("r") === 1)
        .select(col("ticker"), lit("right").as("seg"), col("k"), col("t"),
          r6(col("g")).as("gain"),
          r6(expr(mean("cs - s1", "k - k1"))).as("mean_l"),
          r6(expr(mean("tot - cs", "nt - k"))).as("mean_r"))
      root.unionByName(left).unionByName(right)
    }),

    // Per-(ticker, day) time-weighted average price: each bar weighted
    // by its micros gap to the next bar in the day (the last bar of a
    // day carries no interval). Exact-integer weights; one exchange.
    "ts_twap" -> ((s, dir) => {
      val wd = Window.partitionBy("ticker", "day").orderBy("t", "event_id")
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("dt", (lead(col("t"), 1).over(wd) - col("t")).cast("double"))
        .filter(col("dt").isNotNull)
        .groupBy("ticker", "day")
        .agg(count(lit(1)).as("n_spans"),
          r6(sum(col("close") * col("dt")) / sum(col("dt"))).as("twap"))
    }),

    // Population-stability-index drift between the two deterministic
    // event halves (event_id parity), 10 equal-width bins over broadcast
    // global bounds, Laplace-smoothed shares ((c+0.5)/(n+5)) so empty
    // bins stay finite. 10-group shuffle; the 10-bin table materializes
    // once and the totals ride scalar aggregates broadcast back over
    // it — no unpartitioned window.
    "drift_psi" -> ((s, dir) => {
      val e = EventBars.events(s, dir)
      val bounds = e.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      val bins = e.crossJoin(broadcast(bounds))
        .withColumn("bin", least(lit(9L),
          floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / lit(10.0)))))
        .groupBy("bin")
        .agg(count(when(col("event_id") % 2 === 0, lit(1))).as("n_a"),
          count(when(col("event_id") % 2 =!= 0, lit(1))).as("n_b"))
        .localCheckpoint()
      val tot = bins.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
      val wc = bins.crossJoin(broadcast(tot))
        .withColumn("p", (col("n_a") + lit(0.5)) / (col("ta") + lit(5.0)))
        .withColumn("q", (col("n_b") + lit(0.5)) / (col("tb") + lit(5.0)))
        .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
      wc.crossJoin(broadcast(wc.agg(sum(col("contrib")).as("pt"))))
        .select(col("bin"), col("n_a"), col("n_b"),
          r6(col("contrib")).as("psi_bin"),
          r6(col("pt")).as("psi_total"))
    }),

    // Two-sample Kolmogorov–Smirnov over the click/view value
    // distributions. Collapses to the DISTINCT value domain first
    // (bounded for quantized columns), then the distributed exact
    // running sums give the ECDF over the domain — range-bucketed, no
    // single-partition window; counts are exact integers, so D is
    // bit-identical across engines before any rounding. Ties in D
    // break to the smallest value.
    "drift_ks" -> ((s, dir) => {
      val g = EventBars.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .groupBy("value")
        .agg(count(when(col("event_type") === "click", lit(1))).as("ca"),
          count(when(col("event_type") === "view", lit(1))).as("cb"))
        .localCheckpoint()
      val r = DistRank.rowNumber(g, "_rk", col("value"), Seq(col("value")),
        runSumCols = Seq("ca", "cb"))
      val na = r.sums("ca")
      val nb = r.sums("cb")
      r.df
        .withColumn("d",
          abs(col("run_ca") / lit(na) - col("run_cb") / lit(nb)))
        .agg(count(lit(1)).as("nz"),
          r6(max(col("d"))).as("ks_d"),
          min(struct(negate(col("d")), col("value")))
            .getField("value").as("at_value"))
        .filter(col("nz") > 0) // empty-in → empty-out
        .select(lit(na).as("n_a"), lit(nb).as("n_b"),
          col("ks_d"), col("at_value"))
    }),

    // Exact 1-D Wasserstein-1 (earth-mover) distance between the
    // click/view value distributions -- the drift number KS's sup-gap
    // understates when distributions differ in the tails: W1 =
    // integral |F_a - F_b| dx over the value domain. Values quantize
    // to integer micros up front, the domain collapses to DISTINCT
    // quantized values, [[DistRank]] supplies the exact distributed
    // running sums (range-bucketed -- no single-partition window), and
    // each inter-value segment contributes |F_a - F_b| x gap in EXACT
    // integer units (ECDF gaps as cross-multiplied counts, widened to
    // DECIMAL(38,0)/HUGEINT where 100 TB products would wrap BIGINT);
    // the single double division happens once at the end. The
    // next-value lookup is an equi-join on adjacent global ranks over
    // the distinct-value table, never a global window over the events.
    "drift_wasserstein" -> ((s, dir) => {
      val g = EventBars.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .withColumn("vq",
          expr("CAST(round(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT)"))
        .groupBy("vq")
        .agg(count(when(col("event_type") === "click", lit(1))).as("ca"),
          count(when(col("event_type") === "view", lit(1))).as("cb"))
        .localCheckpoint()
      val r = DistRank.rowNumber(g, "_rk", col("vq"), Seq(col("vq")),
        runSumCols = Seq("ca", "cb"))
      val na = r.sums("ca")
      val nb = r.sums("cb")
      val seg = r.df.select(col("_rk"), col("vq"),
        col("run_ca"), col("run_cb"))
      val nxt = seg.select((col("_rk") - 1).as("_rk"), col("vq").as("vq_next"))
      seg.join(nxt, "_rk") // the max value has no next: zero-width tail
        .withColumn("segq", expr(
          s"abs(CAST(run_ca AS DECIMAL(38,0)) * ${nb}L" +
            s" - CAST(run_cb AS DECIMAL(38,0)) * ${na}L)" +
            " * CAST(vq_next - vq AS DECIMAL(38,0))"))
        .agg(count(lit(1)).as("n_seg"), sum(col("segq")).as("wq"))
        .filter(col("n_seg") > 0) // empty/degenerate-in -> empty-out
        .select(lit(na).as("n_a"), lit(nb).as("n_b"), col("n_seg"),
          r6(expr("CAST(wq AS DOUBLE) / (CAST(" + na + "L AS DOUBLE)" +
            " * CAST(" + nb + "L AS DOUBLE) * 1000000.0)")).as("w1"))
    }))

  val oracles: Map[String, String] = Map(

      "ts_hurst" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |r AS (SELECT ticker,
           |    close - lag(close, 1) OVER ($Over) AS r1,
           |    close - lag(close, 2) OVER ($Over) AS r2,
           |    close - lag(close, 8) OVER ($Over) AS r8
           |  FROM bars),
           |g AS (SELECT ticker,
           |    count(r1)::BIGINT AS n1, sum(r1) AS s1, sum(r1*r1) AS ss1,
           |    count(r2)::BIGINT AS n2, sum(r2) AS s2, sum(r2*r2) AS ss2,
           |    count(r8)::BIGINT AS n8, sum(r8) AS s8, sum(r8*r8) AS ss8
           |  FROM r GROUP BY 1),
           |v AS (SELECT *,
           |    (ss1 - s1*s1/CAST(n1 AS DOUBLE))/CAST(n1 AS DOUBLE) AS var1
           |  FROM g WHERE n8 >= 1),
           |q AS (SELECT *,
           |    CASE WHEN 2.0 * var1 = 0 THEN NULL ELSE
           |      ((ss2 - s2*s2/CAST(n2 AS DOUBLE))/CAST(n2 AS DOUBLE))
           |        / (2.0 * var1) END AS vr2,
           |    CASE WHEN 8.0 * var1 = 0 THEN NULL ELSE
           |      ((ss8 - s8*s8/CAST(n8 AS DOUBLE))/CAST(n8 AS DOUBLE))
           |        / (8.0 * var1) END AS vr8
           |  FROM v)
           |SELECT ticker, n1 AS n_ret,
           |  (round((vr2) * 1000000.0) / 1000000.0 + 0.0) AS vr_2,
           |  (round((vr8) * 1000000.0) / 1000000.0 + 0.0) AS vr_8,
           |  (round((0.5 + ln(vr8) / (2.0 * ln(8.0))) * 1000000.0)
           |    / 1000000.0 + 0.0) AS hurst
           |FROM q""".stripMargin,

      "ts_beta" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |db AS (SELECT ticker, t // 86400000000 AS day, t, event_id,
           |    CAST(round(close * 100) AS BIGINT) AS c FROM bars),
           |dc AS (SELECT ticker, day, last(c ORDER BY t, event_id) AS c
           |  FROM db GROUP BY 1, 2),
           |rr AS (SELECT ticker, day, c,
           |    lag(c) OVER (PARTITION BY ticker ORDER BY day) AS prev
           |  FROM dc),
           |r2 AS (SELECT ticker, day,
           |    greatest(least(
           |      CAST(round((CASE WHEN prev = 0 THEN NULL
           |        ELSE CAST(c AS DOUBLE) / CAST(prev AS DOUBLE) END)
           |        * 1000000.0 - 1000000.0) AS BIGINT),
           |      10000000), -10000000) AS r
           |  FROM rr),
           |r3 AS (SELECT * FROM r2 WHERE r IS NOT NULL),
           |m AS (SELECT *,
           |    CAST(round(CAST(sum(r) OVER (PARTITION BY day) AS DOUBLE)
           |      / CAST(count(r) OVER (PARTITION BY day) AS DOUBLE))
           |      AS BIGINT) AS mkt
           |  FROM r3),
           |g AS (SELECT ticker, count(*)::BIGINT AS n_days,
           |    sum(r)::BIGINT AS sx, sum(mkt)::BIGINT AS sy,
           |    sum(r * mkt)::BIGINT AS sxy, sum(r * r)::BIGINT AS sxx,
           |    sum(mkt * mkt)::BIGINT AS syy
           |  FROM m GROUP BY 1 HAVING count(*) >= 3),
           |b AS (SELECT *,
           |    CASE WHEN CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)
           |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) = 0 THEN NULL
           |      ELSE (CAST(n_days AS DOUBLE)*CAST(sxy AS DOUBLE)
           |        - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |        / (CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)
           |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) END AS beta
           |  FROM g)
           |SELECT ticker, n_days,
           |  (round((beta) * 1000000.0) / 1000000.0 + 0.0) AS beta,
           |  (round(((CAST(sx AS DOUBLE) - beta*CAST(sy AS DOUBLE))
           |    /CAST(n_days AS DOUBLE)/1000000.0)
           |   * 1000000.0) / 1000000.0 + 0.0) AS alpha,
           |  (round((CASE WHEN sqrt((CAST(n_days AS DOUBLE)*CAST(sxx AS DOUBLE)
           |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
           |      * (CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)
           |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) = 0 THEN NULL
           |    ELSE (CAST(n_days AS DOUBLE)*CAST(sxy AS DOUBLE)
           |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |      / sqrt((CAST(n_days AS DOUBLE)*CAST(sxx AS DOUBLE)
           |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
           |      * (CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)
           |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS corr
           |FROM b""".stripMargin,

      "ts_pairs_spread" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |db AS (SELECT ticker, t // 86400000000 AS day, t, event_id,
           |    CAST(round(close * 100) AS BIGINT) AS c FROM bars),
           |dc AS (SELECT ticker, day, last(c ORDER BY t, event_id) AS c
           |  FROM db GROUP BY 1, 2),
           |rf AS (SELECT min(ticker) AS rt FROM dc),
           |dr AS (SELECT day, c AS cr FROM dc
           |  WHERE ticker = (SELECT rt FROM rf)),
           |pj AS (SELECT a.ticker, a.day, a.c AS ca, dr.cr
           |  FROM dc a JOIN dr USING (day)
           |  WHERE a.ticker <> (SELECT rt FROM rf)),
           |bt AS (SELECT ticker, count(*)::BIGINT AS n_days,
           |    sum(ca)::BIGINT AS sx, sum(cr)::BIGINT AS sy,
           |    sum(ca*cr)::BIGINT AS sxy, sum(cr*cr)::BIGINT AS syy
           |  FROM pj GROUP BY 1),
           |b2 AS (SELECT ticker, n_days,
           |    CASE WHEN n_days * syy - sy * sy = 0 THEN NULL ELSE
           |      CAST(n_days * sxy - sx * sy AS DOUBLE)
           |      / CAST(n_days * syy - sy * sy AS DOUBLE) END AS beta
           |  FROM bt WHERE n_days >= 3),
           |s1 AS (SELECT p.ticker, p.day, b2.n_days, b2.beta,
           |    CAST(round(CAST(p.ca AS DOUBLE)
           |      - b2.beta * CAST(p.cr AS DOUBLE)) AS BIGINT) AS sm
           |  FROM pj p JOIN b2 USING (ticker)),
           |s2 AS (SELECT *, lag(sm) OVER (PARTITION BY ticker ORDER BY day)
           |    AS sl FROM s1),
           |g AS (SELECT ticker, n_days, beta,
           |    sum(sm)::BIGINT AS vs, sum(sm*sm)::BIGINT AS vss,
           |    count(sl)::BIGINT AS n2,
           |    sum(CASE WHEN sl IS NOT NULL THEN sm ELSE 0 END)::BIGINT AS ps,
           |    sum(CASE WHEN sl IS NOT NULL THEN sl ELSE 0 END)::BIGINT AS pl,
           |    sum(sm*sl)::BIGINT AS psl,
           |    sum(CASE WHEN sl IS NOT NULL THEN sm*sm ELSE 0 END)::BIGINT
           |      AS pss,
           |    sum(sl*sl)::BIGINT AS pll
           |  FROM s2 GROUP BY 1, 2, 3)
           |SELECT ticker, n_days,
           |  (round(beta * 1000000.0) / 1000000.0 + 0.0) AS beta,
           |  (round((sqrt(CAST(n_days * vss - vs * vs AS DOUBLE))
           |    / CAST(n_days AS DOUBLE) / 100.0) * 1000000.0) / 1000000.0
           |    + 0.0) AS spread_vol,
           |  (round((CASE WHEN n2 * pss - ps * ps = 0
           |      OR n2 * pll - pl * pl = 0 THEN NULL ELSE
           |    CAST(n2 * psl - ps * pl AS DOUBLE)
           |    / (sqrt(CAST(n2 * pss - ps * ps AS DOUBLE))
           |       * sqrt(CAST(n2 * pll - pl * pl AS DOUBLE))) END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS rho1
           |FROM g""".stripMargin,

      "ts_dtw_ref" -> {
        // One DP row as a DuckDB fold: list_reduce's accumulator must
        // share the element type (the BPE-oracle lesson), so the row
        // (DOUBLE[]) folds over [j]-singleton DOUBLE[] elements with
        // the empty row prepended as init. `xi`/`pRow` splice the
        // outer row index and previous-row reference in.
        def rowD(xi: String, pInit: String, pStep: String): String =
          s"""list_reduce(
             |  list_prepend([]::DOUBLE[], list_transform(
             |    generate_series(1, len(ys)), j -> [j::DOUBLE])),
             |  (acc, x) -> acc || [
             |    CASE WHEN abs($xi - x[1]::INT) > w
             |      THEN 'Infinity'::DOUBLE ELSE
             |      abs((xs[$xi] - ys[x[1]::INT])::DOUBLE) +
             |      CASE WHEN x[1]::INT = 1 THEN $pInit
             |        ELSE $pStep END
             |    END])""".stripMargin
        val row1 = rowD("1", "0.0", "acc[x[1]::INT - 1]")
        val rowI = rowD("e[1]::INT", "P[1]",
          "least(P[x[1]::INT], P[x[1]::INT - 1], acc[x[1]::INT - 1])")
        s"""WITH bars AS (${EventBars.sqlBars}),
           |db AS (SELECT ticker, t // 86400000000 AS day, t, event_id,
           |    CAST(round(close * 100) AS BIGINT) AS c FROM bars),
           |dc AS (SELECT ticker, day, last(c ORDER BY t, event_id) AS c
           |  FROM db GROUP BY 1, 2),
           |ar AS (SELECT ticker, list(c ORDER BY day) AS xs
           |  FROM dc GROUP BY 1),
           |rf AS (SELECT min(ticker) AS rt FROM dc),
           |ry AS (SELECT xs AS ys FROM ar
           |  WHERE ticker = (SELECT rt FROM rf)),
           |base AS (SELECT a.ticker, a.xs, ry.ys,
           |    greatest(3, abs(len(a.xs) - len(ry.ys)) + 1) AS w
           |  FROM ar a CROSS JOIN ry
           |  WHERE len(a.xs) >= 5 AND len(ry.ys) >= 5),
           |dp AS (SELECT ticker, len(xs)::BIGINT AS n_days,
           |    list_reduce(
           |      list_prepend($row1,
           |        list_transform(generate_series(2, len(xs)),
           |          i -> [i::DOUBLE])),
           |      (P, e) -> $rowI)[len(ys)] AS d
           |  FROM base)
           |SELECT ticker, n_days,
           |  (round((d / 100.0) * 1000000.0) / 1000000.0 + 0.0) AS dtw
           |FROM dp""".stripMargin
      },

      "ts_rolling_median" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT ticker, t, event_id,
           |    row_number() OVER ($Over) AS rn,
           |    quantile_cont(CAST(round(close * 100) AS BIGINT), 0.5)
           |      OVER ($Over
           |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS med,
           |    quantile_cont(CAST(round(close * 100) AS BIGINT), 0.25)
           |      OVER ($Over
           |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS q1,
           |    quantile_cont(CAST(round(close * 100) AS BIGINT), 0.75)
           |      OVER ($Over
           |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS q3
           |  FROM bars)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN rn >= 21 THEN med / 100.0 END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS roll_med,
           |  (round((CASE WHEN rn >= 21 THEN (q3 - q1) / 100.0 END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS roll_iqr
           |FROM f""".stripMargin,

      "ts_fracdiff" -> {
        val lags = (1 until FracDiffK).map(k =>
          s"lag(close, $k) OVER ($Over) AS lag$k").mkString(",\n|    ")
        s"""WITH bars AS (${EventBars.sqlBars}),
           |l AS (SELECT ticker, t, event_id, close,
           |    row_number() OVER ($Over) AS rn,
           |    $lags
           |  FROM bars)
           |SELECT ticker, t, event_id,
           |  (round(($fracDiffTerms) * 1000000.0) / 1000000.0 + 0.0) AS fracdiff
           |FROM l WHERE rn >= $FracDiffK""".stripMargin
      },

      "ts_ewm_vol" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |nb0 AS (SELECT ticker, t, event_id,
           |    row_number() OVER ($Over) AS rn,
           |    close - lag(close) OVER ($Over) AS r
           |  FROM bars),
           |nb AS (SELECT ticker, t, event_id, rn,
           |    coalesce(r * r, 0.0) AS x FROM nb0),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, x AS v
           |  FROM nb WHERE rn = 1
           |  UNION ALL
           |  SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
           |    (2.0/20.0)*nb.x + (1.0 - 2.0/20.0)*r.v
           |  FROM rec r JOIN nb
           |    ON nb.ticker = r.ticker AND nb.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round((v) * 1000000.0) / 1000000.0 + 0.0) AS ewm_var,
           |  (round(sqrt(v) * 1000000.0) / 1000000.0 + 0.0) AS ewm_vol
           |FROM rec""".stripMargin,

      "ts_garch" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |n0 AS (SELECT *, row_number() OVER ($Over) AS rn,
           |    close - lag(close) OVER ($Over) AS r FROM bars),
           |n AS (SELECT *, coalesce(r * r, 0.0) AS x FROM n0),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, x AS y FROM n WHERE rn = 1
           |  UNION ALL
           |  SELECT b.ticker, b.t, b.event_id, b.rn,
           |    (0.05 + 0.1*b.x) + 0.85*r.y
           |  FROM rec r JOIN n b
           |    ON b.ticker = r.ticker AND b.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round(y, 6) + 0.0) AS cond_var,
           |  (round(sqrt(y), 6) + 0.0) AS cond_vol
           |FROM rec""".stripMargin,

      "ts_volume_bars" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |cv AS (SELECT *, CAST(sum(volume) OVER ($Over
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS cv FROM bars),
           |bb AS (SELECT *,
           |    (cv - CAST(volume AS BIGINT)) // 10000 AS bar FROM cv)
           |SELECT ticker, bar,
           |  (round(first(open ORDER BY t, event_id) * 1000000.0)
           |   / 1000000.0 + 0.0) AS open,
           |  (round(max(high) * 1000000.0) / 1000000.0 + 0.0) AS high,
           |  (round(min(low) * 1000000.0) / 1000000.0 + 0.0) AS low,
           |  (round(last(close ORDER BY t, event_id) * 1000000.0)
           |   / 1000000.0 + 0.0) AS close,
           |  CAST(sum(volume) AS BIGINT) AS bar_volume,
           |  count(*)::BIGINT AS n_events,
           |  min(t) AS t_open, max(t) AS t_close
           |FROM bb GROUP BY 1, 2""".stripMargin,

      "ts_realized_vol" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |db AS (SELECT ticker, t // 86400000000 AS day, t, event_id,
           |    CAST(round(close * 100) AS BIGINT) AS c FROM bars),
           |rr AS (SELECT ticker, day,
           |    lag(c) OVER (PARTITION BY ticker, day
           |      ORDER BY t, event_id) AS prev, c
           |  FROM db),
           |r2 AS (SELECT ticker, day,
           |    greatest(least(
           |      CAST(round((CASE WHEN prev = 0 THEN NULL
           |        ELSE CAST(c AS DOUBLE) / CAST(prev AS DOUBLE) END)
           |        * 1000000.0 - 1000000.0) AS BIGINT),
           |      10000000), -10000000) AS r
           |  FROM rr),
           |g AS (SELECT ticker, day, count(*)::BIGINT AS n_ret,
           |    sum(r * r)::BIGINT AS ss
           |  FROM r2 WHERE r IS NOT NULL GROUP BY 1, 2)
           |SELECT ticker, day, n_ret,
           |  (round((sqrt(CAST(ss AS DOUBLE)) / 1000000.0)
           |   * 1000000.0) / 1000000.0 + 0.0) AS rv
           |FROM g""".stripMargin,

      "ts_breadth" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT *, row_number() OVER ($Over) AS rn,
           |    sum(close) OVER ($Over
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s20
           |  FROM bars)
           |SELECT t, count(*)::BIGINT AS n_tickers,
           |  sum(CASE WHEN close * 20.0 > s20 THEN 1 ELSE 0 END)::BIGINT
           |    AS n_above,
           |  (round(sum(CASE WHEN close * 20.0 > s20 THEN 1 ELSE 0 END)::DOUBLE
           |    / count(*)::DOUBLE, 6) + 0.0) AS breadth
           |FROM f WHERE rn >= 20 GROUP BY t""".stripMargin,

      "ts_spread_cs" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |d AS (SELECT ticker, t // 86400000000 AS day,
           |    max(high) AS h0, min(low) AS l0
           |  FROM bars GROUP BY 1, 2),
           |lg AS (SELECT *,
           |    lag(h0) OVER (PARTITION BY ticker ORDER BY day) AS h1,
           |    lag(l0) OVER (PARTITION BY ticker ORDER BY day) AS l1
           |  FROM d),
           |bg AS (SELECT *,
           |    CASE WHEN l0 > 0 AND l1 > 0 THEN
           |      ln(h1/l1)*ln(h1/l1) + ln(h0/l0)*ln(h0/l0) END AS beta,
           |    CASE WHEN least(l0, l1) > 0 THEN
           |      ln(greatest(h0, h1)/least(l0, l1))
           |      *ln(greatest(h0, h1)/least(l0, l1)) END AS gamma
           |  FROM lg),
           |al AS (SELECT *,
           |    (sqrt(2.0*beta) - sqrt(beta))/(3.0 - 2.0*sqrt(2.0))
           |      - sqrt(gamma/(3.0 - 2.0*sqrt(2.0))) AS alpha
           |  FROM bg)
           |SELECT ticker, day,
           |  (round((beta) * 1000000.0) / 1000000.0 + 0.0) AS beta,
           |  (round((gamma) * 1000000.0) / 1000000.0 + 0.0) AS gamma,
           |  (round((2.0*(exp(alpha) - 1.0)/(1.0 + exp(alpha)))
           |   * 1000000.0) / 1000000.0 + 0.0) AS cs_spread
           |FROM al""".stripMargin,

      "ts_ou_halflife" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |cb AS (SELECT ticker, t, event_id,
           |    CAST(round(close * 100) AS BIGINT) AS c FROM bars),
           |lg AS (SELECT ticker, c,
           |    lag(c) OVER ($Over) AS p FROM cb),
           |dd AS (SELECT ticker, p, c - p AS d FROM lg
           |  WHERE p IS NOT NULL),
           |g AS (SELECT ticker, count(*)::BIGINT AS n,
           |    sum(p)::BIGINT AS sx, sum(d)::BIGINT AS sy,
           |    sum(p * d)::BIGINT AS sxy, sum(p * p)::BIGINT AS sxx
           |  FROM dd GROUP BY 1 HAVING count(*) >= 3),
           |b AS (SELECT *,
           |    CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
           |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) = 0 THEN NULL
           |      ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
           |        - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |        / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
           |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) END AS beta
           |  FROM g)
           |SELECT ticker, n AS n_obs,
           |  (round((beta) * 1000000.0) / 1000000.0 + 0.0) AS ar1_beta,
           |  (round((CASE WHEN beta > -1.0 AND beta < 0.0
           |    THEN -ln(2.0) / ln(1.0 + beta) END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS halflife
           |FROM b""".stripMargin,

      "ts_sharpe" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |db AS (SELECT ticker, t // 86400000000 AS day, t, event_id,
           |    CAST(round(close * 100) AS BIGINT) AS c FROM bars),
           |dc AS (SELECT ticker, day, last(c ORDER BY t, event_id) AS c
           |  FROM db GROUP BY 1, 2),
           |rr AS (SELECT ticker, c,
           |    lag(c) OVER (PARTITION BY ticker ORDER BY day) AS prev
           |  FROM dc),
           |r2 AS (SELECT ticker,
           |    greatest(least(
           |      CAST(round((CASE WHEN prev = 0 THEN NULL
           |        ELSE CAST(c AS DOUBLE) / CAST(prev AS DOUBLE) END)
           |        * 1000000.0 - 1000000.0) AS BIGINT),
           |      10000000), -10000000) AS r
           |  FROM rr),
           |g AS (SELECT ticker, count(*)::BIGINT AS n,
           |    sum(r)::BIGINT AS sx, sum(r * r)::BIGINT AS ss
           |  FROM r2 WHERE r IS NOT NULL GROUP BY 1
           |  HAVING count(*) >= 3),
           |m AS (SELECT *,
           |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
           |    sqrt((CAST(ss AS DOUBLE)
           |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
           |      /(CAST(n AS DOUBLE) - 1.0)) AS sd
           |  FROM g)
           |SELECT ticker, n AS n_days,
           |  (round((mu / 1000000.0) * 1000000.0) / 1000000.0 + 0.0)
           |    AS mean_ret,
           |  (round((sd / 1000000.0) * 1000000.0) / 1000000.0 + 0.0)
           |    AS sd_ret,
           |  (round((CASE WHEN sd = 0 THEN NULL ELSE mu / sd END
           |    * sqrt(252.0)) * 1000000.0) / 1000000.0 + 0.0) AS sharpe
           |FROM m""".stripMargin,

      "ts_ulcer" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |pk AS (SELECT ticker, close,
           |    max(close) OVER ($Over
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
           |  FROM bars),
           |dd AS (SELECT ticker,
           |    CAST(round((CASE WHEN pk = 0 THEN NULL
           |      ELSE close / pk END) * 1000000.0 - 1000000.0)
           |      AS BIGINT) AS dd
           |  FROM pk),
           |g AS (SELECT ticker, count(*)::BIGINT AS n_bars,
           |    sum(dd * dd)::BIGINT AS ss
           |  FROM dd WHERE dd IS NOT NULL GROUP BY 1)
           |SELECT ticker, n_bars,
           |  (round((sqrt(CAST(ss AS DOUBLE) / CAST(n_bars AS DOUBLE))
           |    / 1000000.0) * 1000000.0) / 1000000.0 + 0.0) AS ulcer
           |FROM g""".stripMargin,

      "ts_acf" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |lg AS (SELECT ticker, close AS y,
           |    lag(close, 1) OVER ($Over) AS x1,
           |    lag(close, 2) OVER ($Over) AS x2,
           |    lag(close, 3) OVER ($Over) AS x3,
           |    lag(close, 4) OVER ($Over) AS x4,
           |    lag(close, 5) OVER ($Over) AS x5
           |  FROM bars),
           |pairs AS (
           |  SELECT ticker, 1 AS lag_k, x1 AS x, y FROM lg WHERE x1 IS NOT NULL
           |  UNION ALL
           |  SELECT ticker, 2, x2, y FROM lg WHERE x2 IS NOT NULL
           |  UNION ALL
           |  SELECT ticker, 3, x3, y FROM lg WHERE x3 IS NOT NULL
           |  UNION ALL
           |  SELECT ticker, 4, x4, y FROM lg WHERE x4 IS NOT NULL
           |  UNION ALL
           |  SELECT ticker, 5, x5, y FROM lg WHERE x5 IS NOT NULL),
           |s AS (SELECT ticker, lag_k, count(*)::BIGINT AS n,
           |    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
           |    sum(y*y) AS syy, sum(x*y) AS sxy
           |  FROM pairs GROUP BY ticker, lag_k),
           |v AS (SELECT *,
           |    greatest(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0) AS vx,
           |    greatest(CAST(n AS DOUBLE) * syy - sy * sy, 0.0) AS vy
           |  FROM s),
           |d AS (SELECT *, sqrt(vx) * sqrt(vy) AS den FROM v)
           |SELECT ticker, lag_k, n AS n_pairs,
           |  (round((CASE WHEN den > 0 THEN
           |     (CAST(n AS DOUBLE) * sxy - sx * sy) / den END) * 1000000.0) / 1000000.0 + 0.0) AS acf
           |FROM d""".stripMargin,

      "ts_seasonality" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |c AS (SELECT *, CAST(round(close * 100.0) AS BIGINT) AS cents
           |  FROM bars),
           |g AS (SELECT ticker, (t // 3600000000) % 24 AS hod,
           |    count(*)::BIGINT AS n_bars, sum(cents) AS sc
           |  FROM c GROUP BY ticker, hod),
           |tt AS (SELECT *,
           |    sum(n_bars) OVER (PARTITION BY ticker) AS tot_n,
           |    sum(sc) OVER (PARTITION BY ticker) AS tot_s
           |  FROM g)
           |SELECT ticker, hod, n_bars,
           |  (round((sc / 100.0 / n_bars) * 1000000.0) / 1000000.0 + 0.0)
           |    AS avg_close,
           |  (round((sc / 100.0 / n_bars - tot_s / 100.0 / tot_n) * 1000000.0)
           |    / 1000000.0 + 0.0) AS dev
           |FROM tt""".stripMargin,

      "ts_cusum" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |ce AS (SELECT *, CAST(round(close * 100.0) AS BIGINT) AS cents
           |  FROM bars),
           |m AS (SELECT *,
           |    sum(cents) OVER (PARTITION BY ticker) AS totc,
           |    count(*) OVER (PARTITION BY ticker) AS nt,
           |    CAST(row_number() OVER ($Over) AS BIGINT) AS k,
           |    sum(cents) OVER ($Over
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
           |  FROM ce),
           |c AS (SELECT *,
           |    (cumc * nt - k * totc) / (100.0 * nt) AS cusum FROM m),
           |ab AS (SELECT *, abs(cusum) AS ca FROM c)
           |SELECT ticker, count(*)::BIGINT AS n_bars,
           |  (round((max(ca)) * 1000000.0) / 1000000.0 + 0.0) AS max_cusum,
           |  (min(struct_pack(nca := -ca, t := t, event_id := event_id))).t
           |    AS cp_t
           |FROM ab GROUP BY ticker""".stripMargin,

      "ts_perm_entropy" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |pl AS (SELECT ticker, close,
           |    lag(close, 2) OVER ($Over) AS c0,
           |    lag(close, 1) OVER ($Over) AS c1 FROM bars),
           |pp AS (SELECT ticker,
           |    (CASE WHEN c0 < c1 THEN 1 ELSE 0 END
           |     + CASE WHEN c1 < close THEN 2 ELSE 0 END
           |     + CASE WHEN c0 < close THEN 4 ELSE 0 END)::BIGINT AS pat
           |  FROM pl WHERE c0 IS NOT NULL AND c1 IS NOT NULL),
           |pg AS (SELECT ticker, pat, count(*)::BIGINT AS c FROM pp
           |  GROUP BY 1, 2),
           |pn AS (SELECT *, (sum(c) OVER (PARTITION BY ticker))::BIGINT AS n
           |  FROM pg),
           |pt AS (SELECT *, CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           |    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           |    * 1000000000.0) AS BIGINT) AS term_nano FROM pn)
           |SELECT ticker, max(n)::BIGINT AS n_triples,
           |  count(*)::BIGINT AS n_patterns,
           |  (round(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0
           |    * 1000000.0) / 1000000.0 + 0.0) AS perm_entropy,
           |  (round(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0
           |    / ln(CAST(6.0 AS DOUBLE))
           |    * 1000000.0) / 1000000.0 + 0.0) AS perm_entropy_norm
           |FROM pt GROUP BY ticker""".stripMargin,

      "ts_binseg" -> {
        def gain(sl: String, k: String, tot: String, n: String) =
          s"(CAST($sl AS DOUBLE)*CAST($sl AS DOUBLE))/CAST($k AS DOUBLE)" +
            s" + (CAST(($tot) - ($sl) AS DOUBLE)*CAST(($tot) - ($sl) AS DOUBLE))" +
            s"/CAST(($n) - ($k) AS DOUBLE)" +
            s" - (CAST($tot AS DOUBLE)*CAST($tot AS DOUBLE))/CAST($n AS DOUBLE)"
        def mean(s0: String, k0: String) =
          s"CAST($s0 AS DOUBLE) / 100.0 / CAST($k0 AS DOUBLE)"
        def r6d(e: String) = s"(round(($e) * 1000000.0) / 1000000.0 + 0.0)"
        s"""WITH bars AS (${EventBars.sqlBars}),
           |bc AS (SELECT *, CAST(round(close * 100.0) AS BIGINT) AS cents
           |  FROM bars),
           |bm AS (SELECT ticker, t,
           |    (count(*) OVER (PARTITION BY ticker))::BIGINT AS nt,
           |    (sum(cents) OVER (PARTITION BY ticker))::BIGINT AS tot,
           |    CAST(row_number() OVER ($Over) AS BIGINT) AS k,
           |    (sum(cents) OVER ($Over
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
           |      AS cs
           |  FROM bc),
           |bg1 AS (SELECT ticker, k AS k1, cs AS s1, t AS t1, g AS gr,
           |    nt AS n1, tot AS tot1 FROM (
           |    SELECT *, ${gain("cs", "k", "tot", "nt")} AS g,
           |      row_number() OVER (PARTITION BY ticker
           |        ORDER BY ${gain("cs", "k", "tot", "nt")} DESC, k) AS r
           |    FROM bm WHERE k < nt) WHERE r = 1),
           |broot AS (SELECT ticker, 'root' AS seg, k1 AS k, t1 AS t,
           |    ${r6d("gr")} AS gain,
           |    ${r6d(mean("s1", "k1"))} AS mean_l,
           |    ${r6d(mean("tot1 - s1", "n1 - k1"))} AS mean_r
           |  FROM bg1),
           |bj AS (SELECT m.*, j.k1, j.s1 FROM bm m
           |  JOIN bg1 j ON m.ticker = j.ticker),
           |bleft AS (SELECT ticker, 'left' AS seg, k, t,
           |    ${r6d("g")} AS gain,
           |    ${r6d(mean("cs", "k"))} AS mean_l,
           |    ${r6d(mean("s1 - cs", "k1 - k"))} AS mean_r
           |  FROM (SELECT *, ${gain("cs", "k", "s1", "k1")} AS g,
           |      row_number() OVER (PARTITION BY ticker
           |        ORDER BY ${gain("cs", "k", "s1", "k1")} DESC, k) AS r
           |    FROM bj WHERE k < k1) WHERE r = 1),
           |bright AS (SELECT ticker, 'right' AS seg, k, t,
           |    ${r6d("g")} AS gain,
           |    ${r6d(mean("cs - s1", "k - k1"))} AS mean_l,
           |    ${r6d(mean("tot - cs", "nt - k"))} AS mean_r
           |  FROM (SELECT *,
           |      ${gain("cs - s1", "k - k1", "tot - s1", "nt - k1")} AS g,
           |      row_number() OVER (PARTITION BY ticker
           |        ORDER BY ${gain("cs - s1", "k - k1", "tot - s1", "nt - k1")}
           |          DESC, k) AS r
           |    FROM bj WHERE k > k1 AND k < nt) WHERE r = 1)
           |SELECT * FROM broot UNION ALL SELECT * FROM bleft
           |UNION ALL SELECT * FROM bright""".stripMargin
      },

      "ts_twap" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |d AS (SELECT *, t // 86400000000 AS day FROM bars),
           |g AS (SELECT *, CAST(lead(t) OVER (PARTITION BY ticker, day
           |    ORDER BY t, event_id) - t AS DOUBLE) AS dt FROM d)
           |SELECT ticker, day, count(*)::BIGINT AS n_spans,
           |  (round((sum(close * dt) / sum(dt)) * 1000000.0) / 1000000.0 + 0.0) AS twap
           |FROM g WHERE dt IS NOT NULL
           |GROUP BY ticker, day""".stripMargin,

      "drift_psi" ->
        """WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
          |e AS (SELECT least(9, CAST(floor((value - mn) / ((mx - mn) / 10.0))
          |    AS BIGINT)) AS bin, event_id
          |  FROM events, b),
          |g AS (SELECT bin,
          |    count(*) FILTER (WHERE event_id % 2 = 0)::BIGINT AS n_a,
          |    count(*) FILTER (WHERE event_id % 2 <> 0)::BIGINT AS n_b
          |  FROM e GROUP BY bin),
          |t AS (SELECT *, sum(n_a) OVER () AS ta, sum(n_b) OVER () AS tb
          |  FROM g),
          |p AS (SELECT *, (n_a + 0.5) / (ta + 5.0) AS p,
          |    (n_b + 0.5) / (tb + 5.0) AS q FROM t),
          |c AS (SELECT *, (p - q) * ln(p / q) AS contrib FROM p)
          |SELECT bin, n_a, n_b,
          |  (round((contrib) * 1000000.0) / 1000000.0 + 0.0) AS psi_bin,
          |  (round((sum(contrib) OVER ()) * 1000000.0) / 1000000.0 + 0.0) AS psi_total
          |FROM c""".stripMargin,

      "drift_ks" ->
        """WITH g AS (SELECT value,
          |    count(*) FILTER (WHERE event_type = 'click')::BIGINT AS ca,
          |    count(*) FILTER (WHERE event_type = 'view')::BIGINT AS cb
          |  FROM events WHERE event_type IN ('click', 'view')
          |  GROUP BY value),
          |t AS (SELECT *, sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
          |    sum(ca) OVER (ORDER BY value
          |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
          |    sum(cb) OVER (ORDER BY value
          |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
          |  FROM g),
          |d AS (SELECT *, abs(cuma / na - cumb / nb) AS d FROM t),
          |agg AS (SELECT first(na)::BIGINT AS n_a, first(nb)::BIGINT AS n_b,
          |    (round((max(d)) * 1000000.0) / 1000000.0 + 0.0) AS ks_d,
          |    (min(struct_pack(nd := -d, value := value))).value AS at_value
          |  FROM d)
          |SELECT * FROM agg WHERE n_a IS NOT NULL""".stripMargin,

      "drift_wasserstein" ->
        """WITH g AS (SELECT round(value * 1000000.0)::BIGINT AS vq,
          |    count(*) FILTER (WHERE event_type = 'click')::BIGINT AS ca,
          |    count(*) FILTER (WHERE event_type = 'view')::BIGINT AS cb
          |  FROM events WHERE event_type IN ('click', 'view')
          |  GROUP BY 1),
          |t AS (SELECT *, sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
          |    sum(ca) OVER (ORDER BY vq) AS cuma,
          |    sum(cb) OVER (ORDER BY vq) AS cumb,
          |    lead(vq) OVER (ORDER BY vq) AS vq_next
          |  FROM g),
          |seg AS (SELECT na, nb,
          |    abs(cuma::HUGEINT * nb - cumb::HUGEINT * na)
          |      * (vq_next - vq)::HUGEINT AS segq
          |  FROM t WHERE vq_next IS NOT NULL),
          |agg AS (SELECT first(na)::BIGINT AS n_a, first(nb)::BIGINT AS n_b,
          |    count(*)::BIGINT AS n_seg, sum(segq) AS wq FROM seg)
          |SELECT n_a, n_b, n_seg,
          |  (round(wq::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE * 1000000.0),
          |    6) + 0.0) AS w1
          |FROM agg WHERE n_seg > 0""".stripMargin)
}
