package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions

/** Second round-4 time-series batch: the EMA family (EMA/DEMA/TEMA via
  * the single-state-machine [[graft.functions.EmaTripleWindow]] kernel,
  * TRIX on top of it), slow stochastic, Chaikin money flow, Donchian
  * channels, per-ticker autocorrelation, hour-of-day seasonality, CUSUM
  * changepoint report, per-day TWAP, and two distribution-drift tests
  * (PSI, two-sample KS) — the series-analytics/monitoring layer a bar
  * warehouse runs next to the reference's TA-Lib surface
  * (stockdata/indicators.py:178-209 builds MACD from the same EMA
  * primitive these queries expose directly).
  *
  * Scale notes: the indicator queries are one `hash(ticker)` exchange +
  * one sort each (the shared shape of the whole indicator suite);
  * `ts_acf`/`ts_seasonality`/`ts_cusum`/`ts_twap` collapse map-side to
  * tiny per-ticker reports; `drift_psi` aggregates to 10 bins against
  * broadcast bounds; `drift_ks` first collapses to the DISTINCT value
  * domain (bounded for quantized/price-like columns — cents at 100 TB)
  * and the [[DistRank]] range-bucketed running sums give the ECDF over
  * the domain — no unpartitioned window at any scale. Every double output is r6'd; formulas are mirrored
  * token-for-token in [[Ts2Queries.oracles]].
  */
object Ts2Queries {

  private def w = Window.partitionBy("ticker").orderBy("t", "event_id")
  private val Over = "PARTITION BY ticker ORDER BY t, event_id"

  private val r6 = Rounding.r6 _

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

    // EMA/DEMA/TEMA(12) from ONE EmaTripleWindow state machine — e2/e3
    // as stacked window calls would re-run the upstream EMA per layer.
    "ind_ema" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("e", expr("graft_ema3_w(close, 12)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("e.e1")).as("ema"),
          r6(lit(2.0) * col("e.e1") - col("e.e2")).as("dema"),
          r6(lit(3.0) * col("e.e1") - lit(3.0) * col("e.e2") + col("e.e3"))
            .as("tema"))
    }),

    // Heikin-Ashi candles: hac is a direct OHLC average; hao is the
    // α=1/2 recursion over (prev hao, prev hac) — one incremental
    // window state machine on the shared ticker exchange; ha_high/
    // ha_low are greatest/least projections over the struct outside
    // the kernel. See [[graft.functions.HeikinAshiWindow]].
    "ind_heikin" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("ha", expr("graft_ha_w(open, high, low, close)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("ha.hao")).as("ha_open"),
          r6(col("ha.hac")).as("ha_close"),
          r6(greatest(col("high"), col("ha.hao"), col("ha.hac")))
            .as("ha_high"),
          r6(least(col("low"), col("ha.hao"), col("ha.hac")))
            .as("ha_low"))
    }),

    // Supertrend(10, 3): the ATR-band stop-and-reverse recursion
    // (Wilder ATR, ratcheting final bands, direction flips on band
    // cross) as ONE incremental window state machine on the shared
    // ticker exchange — see [[graft.functions.SupertrendWindow]] for
    // the exact recursion the oracle's recursive CTE mirrors.
    "ind_supertrend" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("x", expr("graft_st_w(high, low, close)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("x.atr")).as("atr"),
          r6(col("x.st")).as("supertrend"),
          col("x.dir").as("dir"))
    }),

    // TRIX(15): 1-bar rate of change of the triple EMA. Same kernel,
    // period 15; division guarded (close ≥ 0.01 keeps e3 > 0, but
    // try_divide mirrors the oracle's CASE guard exactly).
    "ind_trix" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("e3", expr("graft_ema3_w(close, 15)").over(w).getField("e3"))
        .withColumn("p3", lag(col("e3"), 1).over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(expr("try_divide(e3 - p3, p3)")).as("trix"))
    }),

    // Parabolic SAR: the two-sided stop-and-reverse recursion
    // (direction, extreme point, acceleration factor) as ONE
    // incremental window state machine on the shared ticker exchange —
    // see [[graft.functions.SarWindow]] for the exact recursion, which
    // the oracle's recursive CTE mirrors operation-for-operation.
    "ind_sar" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("x", expr("graft_sar_w(high, low, close)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("x.sar")).as("sar"), col("x.dir").as("dir"))
    }),

    // SAR over a gappy series: deterministic mid-stream nulls in each
    // price column. Pins the kernel's null-transparency — a null bar
    // carries ALL state (including the bar counter) and emits the
    // carried state; the recursion runs over the non-null subsequence.
    // The oracle replays the same recursion over the filtered rows and
    // carries the last emitted state forward to the gap rows.
    "ind_sar_gaps" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("gh", when(col("event_id") % 31 === 0,
          lit(null).cast("double")).otherwise(col("high")))
        .withColumn("gl", when(col("event_id") % 37 === 0,
          lit(null).cast("double")).otherwise(col("low")))
        .withColumn("gc", when(col("event_id") % 23 === 0,
          lit(null).cast("double")).otherwise(col("close")))
        .withColumn("x", expr("graft_sar_w(gh, gl, gc)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("x.sar")).as("sar"), col("x.dir").as("dir"))
    }),

    // Adaptive EMA over a gappy series: nulls in BOTH the value and
    // the coefficient stream. Pins [[graft.functions.AdaptiveEmaWindow]]
    // null-transparency: y carries through any null (x OR c) instead of
    // silently re-seeding — the oracle recursion spells the identical
    // three-way CASE.
    "ind_adema_gaps" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("gx", when(col("event_id") % 17 === 0,
          lit(null).cast("double")).otherwise(col("close")))
        .withColumn("gc", when(col("event_id") % 13 === 0,
          lit(null).cast("double")).otherwise(lit(0.25)))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(expr("graft_adaptive_ema_w(gx, gc)").over(w)).as("adema"))
    }),

    // Slow stochastic: fast %K over the TA-Lib 14-bar frame, then two
    // explicit 3-bar SMA layers (written as (x + lag1 + lag2)/3 — NOT
    // avg() over a frame — so warm-up nulls gate identically on both
    // engines and the fold order is pinned).
    "ind_stoch" -> ((s, dir) => {
      val rb = w.rowsBetween(-13, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("hh", max(col("high")).over(rb))
        .withColumn("ll", min(col("low")).over(rb))
        .withColumn("fk", when(col("rn") >= 14,
          (col("close") - col("ll")) / (col("hh") - col("ll"))))
        .withColumn("sk", when(col("rn") >= 16,
          (col("fk") + lag(col("fk"), 1).over(w) + lag(col("fk"), 2).over(w))
            / lit(3.0)))
        .withColumn("sd", when(col("rn") >= 18,
          (col("sk") + lag(col("sk"), 1).over(w) + lag(col("sk"), 2).over(w))
            / lit(3.0)))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("sk")).as("slow_k"), r6(col("sd")).as("slow_d"))
    }),

    // Chaikin money flow (20): Σ(mfm·vol)/Σvol over the sliding frame.
    // high−low ≥ 1 by the bar synthesis, so mfm is division-safe.
    "ind_cmf" -> ((s, dir) => {
      val rb = w.rowsBetween(-19, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("mfv",
          ((col("close") - col("low")) - (col("high") - col("close")))
            / (col("high") - col("low")) * col("volume"))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 20,
            sum(col("mfv")).over(rb) / sum(col("volume")).over(rb)))
            .as("cmf"))
    }),

    // Donchian channel (20) + position of close inside it. up−dn ≥
    // high−low ≥ 1, so the position division is safe.
    "ind_donchian" -> ((s, dir) => {
      val rb = w.rowsBetween(-19, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("up", max(col("high")).over(rb))
        .withColumn("dn", min(col("low")).over(rb))
        .select(col("ticker"), col("t"), col("event_id"),
          when(col("rn") >= 20, col("up")).as("dc_up"),
          when(col("rn") >= 20, col("dn")).as("dc_dn"),
          r6(when(col("rn") >= 20,
            (col("close") - col("dn")) / (col("up") - col("dn"))))
            .as("dc_pos"))
    }),

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

    // Vortex indicator (14): VI± = Σ|high − lag(low)| / ΣTR over the
    // frame (uptrend/downtrend movement vs total range). Pure sliding
    // frame sums on the shared ticker exchange — the same one-exchange
    // shape as the rest of the frame suite. TR ≥ 1 by the bar
    // synthesis; try_divide still mirrors the oracle's CASE guard.
    "ind_vortex" -> ((s, dir) => {
      val rb = w.rowsBetween(-13, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("tr",
          greatest(col("high"), coalesce(lag(col("close"), 1).over(w), col("high")))
            - least(col("low"), coalesce(lag(col("close"), 1).over(w), col("low"))))
        .withColumn("vmp", abs(col("high") - lag(col("low"), 1).over(w)))
        .withColumn("vmm", abs(col("low") - lag(col("high"), 1).over(w)))
        .withColumn("str", sum(col("tr")).over(rb))
        .withColumn("svp", sum(col("vmp")).over(rb))
        .withColumn("svm", sum(col("vmm")).over(rb))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 15, try_divide(col("svp"), col("str"))))
            .as("vi_plus"),
          r6(when(col("rn") >= 15, try_divide(col("svm"), col("str"))))
            .as("vi_minus"))
    }),

    // Keltner channels, SMA variant (20-bar typical-price mid, ±2× the
    // 10-bar mean true range — the EMA/ATR flavor lives in the
    // recursive suite; this is the frame-arithmetic formulation).
    // Explicit Σ/n instead of avg() so both engines run the identical
    // sliding-sum expression.
    "ind_keltner" -> ((s, dir) => {
      val rb20 = w.rowsBetween(-19, 0)
      val rb10 = w.rowsBetween(-9, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("tp",
          (col("high") + col("low") + col("close")) / lit(3.0))
        .withColumn("tr",
          greatest(col("high"), coalesce(lag(col("close"), 1).over(w), col("high")))
            - least(col("low"), coalesce(lag(col("close"), 1).over(w), col("low"))))
        .withColumn("mid", sum(col("tp")).over(rb20) / lit(20.0))
        .withColumn("rng", sum(col("tr")).over(rb10) / lit(10.0))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 20, col("mid"))).as("kc_mid"),
          r6(when(col("rn") >= 20, col("mid") + lit(2.0) * col("rng")))
            .as("kc_up"),
          r6(when(col("rn") >= 20, col("mid") - lit(2.0) * col("rng")))
            .as("kc_dn"))
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

    // Ichimoku cloud (9/26/52): every line is frame max/min arithmetic
    // or a pure shift on the ONE ticker exchange — the leading spans
    // displace 26 bars forward (lag of the gated midpoints), the
    // lagging span 26 back (lead of close). Nulls before each line's
    // warm-up, identical on both engines.
    "ind_ichimoku" -> ((s, dir) => {
      val rb9 = w.rowsBetween(-8, 0)
      val rb26 = w.rowsBetween(-25, 0)
      val rb52 = w.rowsBetween(-51, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("tenkan", when(col("rn") >= 9,
          (max(col("high")).over(rb9) + min(col("low")).over(rb9)) / lit(2.0)))
        .withColumn("kijun", when(col("rn") >= 26,
          (max(col("high")).over(rb26) + min(col("low")).over(rb26)) / lit(2.0)))
        .withColumn("spb", when(col("rn") >= 52,
          (max(col("high")).over(rb52) + min(col("low")).over(rb52)) / lit(2.0)))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("tenkan")).as("tenkan"),
          r6(col("kijun")).as("kijun"),
          r6(lag((col("tenkan") + col("kijun")) / lit(2.0), 26).over(w))
            .as("senkou_a"),
          r6(lag(col("spb"), 26).over(w)).as("senkou_b"),
          r6(lead(col("close"), 26).over(w)).as("chikou"))
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

    // Elder Ray: bull/bear power = high/low minus EMA13 — one EMA
    // state machine plus two projections on the shared exchange.
    "ind_elder_ray" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("e1",
          expr("graft_ema3_w(close, 13)").over(w).getField("e1"))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("high") - col("e1")).as("bull_power"),
          r6(col("low") - col("e1")).as("bear_power"))
    }),

    // Fisher transform(10): range position clamped to ±0.999 → α=0.33
    // smoothing → 0.5·ln((1+x)/(1−x)) → α=0.5 smoothing — BOTH
    // recursions ride the generic AdaptiveEmaWindow (constant
    // coefficient), chained on the one ticker exchange; a flat window
    // (hh = ll) maps to the neutral 0.5 position with an explicit CASE
    // (not try_divide: DuckDB's IEEE x/0 is inf, Spark's NULL — the
    // CASE keeps both engines off that edge entirely).
    "ind_fisher" -> ((s, dir) => {
      GraftFunctions.register(s)
      val wf = w.rowsBetween(-9, 0)
      EventBars.bars(s, dir)
        .withColumn("hh", max(col("high")).over(wf))
        .withColumn("ll", min(col("low")).over(wf))
        .withColumn("xr", expr(
          "least(0.999D, greatest(-0.999D, 2.0D * (CASE WHEN hh = ll " +
            "THEN 0.5D ELSE (close - ll) / (hh - ll) END) - 1.0D))"))
        .withColumn("xs", expr("graft_adaptive_ema_w(xr, 0.33D)").over(w))
        .withColumn("v",
          expr("0.5D * ln((1.0D + xs) / (1.0D - xs))"))
        .withColumn("fish", expr("graft_adaptive_ema_w(v, 0.5D)").over(w))
        .withColumn("sig", lag(col("fish"), 1).over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("fish")).as("fisher"),
          r6(col("sig")).as("fisher_signal"))
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

    // APO(12, 26): EMA12 − EMA26 of close. Two instances of the same
    // single-state EMA machine on the one ticker exchange; the oracle
    // runs ONE recursion carrying both states.
    "ind_apo" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("e12", expr("graft_ema3_w(close, 12)").over(w).getField("e1"))
        .withColumn("e26", expr("graft_ema3_w(close, 26)").over(w).getField("e1"))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("e12") - col("e26")).as("apo"))
    }),

    // ADXR(14): (ADX + ADX₁₄ bars ago)/2 — one lag over the same
    // exchange the ADX state machine already runs on.
    "ind_adxr" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("adx", expr("graft_adx_w(high, low, close)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6((col("adx") + lag(col("adx"), 14).over(w)) / lit(2.0))
            .as("adxr"))
    }),

    // Chaikin A/D oscillator (3, 10): money-flow volume accumulates as
    // MICRO-QUANTIZED longs (a raw double running sum would pit
    // Spark's sequential fold against DuckDB's segment tree), then
    // EMA3 − EMA10 of the exact A/D line — one dual-state machine.
    "ind_adosc" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("mfv", expr("CAST(round(" +
          "((close - low) - (high - close)) / (high - low) * volume" +
          " * 1000000.0) AS BIGINT)"))
        .withColumn("ad", expr("CAST(sum(mfv) OVER (" +
          "PARTITION BY ticker ORDER BY t, event_id" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)" +
          " AS DOUBLE) / 1000000.0"))
        .withColumn("e3", expr("graft_ema3_w(ad, 3)").over(w).getField("e1"))
        .withColumn("e10", expr("graft_ema3_w(ad, 10)").over(w).getField("e1"))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("e3") - col("e10")).as("adosc"))
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

    // Classic floor-trader pivot levels from the PREVIOUS day's OHLC
    // extremes: P=(H+L+C)/3, R1=2P−L, S1=2P−H, R2=P+(H−L), S2=P−(H−L).
    // Daily rollup (argmax close, exact max/min) + one lag — the same
    // two-exchange shape as the other daily diagnostics.
    "ind_pivot_points" -> ((s, dir) => {
      val wt = Window.partitionBy("ticker").orderBy("day")
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .groupBy("ticker", "day")
        .agg(max(col("high")).as("h"), min(col("low")).as("mn"),
          max(struct(col("t"), col("event_id"), col("close")))
            .getField("close").as("c"))
        .withColumn("ph", lag(col("h"), 1).over(wt))
        .withColumn("pl", lag(col("mn"), 1).over(wt))
        .withColumn("pc", lag(col("c"), 1).over(wt))
        .withColumn("pv", expr("(ph + pl + pc) / 3.0"))
        .select(col("ticker"), col("day"),
          r6(col("pv")).as("pivot"),
          r6(expr("2.0 * pv - pl")).as("r1"),
          r6(expr("2.0 * pv - ph")).as("s1"),
          r6(expr("pv + (ph - pl)")).as("r2"),
          r6(expr("pv - (ph - pl)")).as("s2"))
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

    // Chandelier exit (22, 3): trailing long stop = 22-bar high −
    // 3 × mean true range over the same frame. Frame arithmetic on
    // the shared exchange, explicit Σ/22 instead of avg().
    "ind_chandelier" -> ((s, dir) => {
      val rb = w.rowsBetween(-21, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("tr",
          greatest(col("high"), coalesce(lag(col("close"), 1).over(w), col("high")))
            - least(col("low"), coalesce(lag(col("close"), 1).over(w), col("low"))))
        .withColumn("hh", max(col("high")).over(rb))
        .withColumn("atr", sum(col("tr")).over(rb) / lit(22.0))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 22, col("hh") - lit(3.0) * col("atr")))
            .as("chandelier_long"),
          r6(when(col("rn") >= 22,
            min(col("low")).over(rb) + lit(3.0) * col("atr")))
            .as("chandelier_short"))
    }),

    // KAMA(10, 2, 30): Kaufman adaptive moving average. The efficiency
    // ratio |close − close₋₁₀| / Σ₁₀|Δclose| and the squared smoothing
    // constant are plain frame arithmetic on the shared exchange; the
    // recursion kama ← kama + sc·(close − kama) is the one-value
    // [[graft.functions.AdaptiveEmaWindow]] state machine, seeded at
    // the first bar with a full ratio window (rn = 11). A flat window
    // (Σ|Δ| = 0) forces close = close₋₁₀, so the ratio is defined as 0
    // there (maximal smoothing) — spelled as the same CASE on both
    // engines.
    "ind_kama" -> ((s, dir) => {
      GraftFunctions.register(s)
      val rb = w.rowsBetween(-9, 0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("dif", abs(col("close") - lag(col("close"), 1).over(w)))
        .withColumn("vol", sum(col("dif")).over(rb))
        .withColumn("er", when(col("rn") >= 11,
          when(col("vol") === 0.0, lit(0.0))
            .otherwise(abs(col("close") - lag(col("close"), 10).over(w))
              / col("vol"))))
        .withColumn("sc0",
          col("er") * (lit(2.0) / lit(3.0) - lit(2.0) / lit(31.0))
            + lit(2.0) / lit(31.0))
        .withColumn("sc", col("sc0") * col("sc0"))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(expr("graft_adaptive_ema_w(close, sc)").over(w)).as("kama"))
    }),

    // Rolling OLS over the 14-bar frame — TA-Lib's regression family
    // (LINEARREG = fit at the current bar, TSF = fit one bar ahead,
    // slope, R²) from FIVE frame sums on the shared exchange. x is the
    // GLOBAL row number: slope and the fit at the current bar are
    // translation-invariant, so the result equals the local x=0..13
    // formulation while every sum stays a plain windowed aggregate
    // (fit(rn) = ȳ + slope·(rn − x̄), x̄ = rn − 6.5). The denominator
    // n·Σx² − (Σx)² is the frame constant 14·819 − 91² = 3185 in the
    // local frame; with global x both engines compute the identical
    // shifted arithmetic, so the doubles stay bit-equal before r6.
    "ind_linreg" -> ((s, dir) => {
      val rb = w.rowsBetween(-13, 0)
      val n = lit(14.0)
      EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w).cast("double"))
        .withColumn("sy", sum(col("close")).over(rb))
        .withColumn("syy", sum(col("close") * col("close")).over(rb))
        .withColumn("sxy", sum(col("rn") * col("close")).over(rb))
        .withColumn("sx", sum(col("rn")).over(rb))
        .withColumn("sxx", sum(col("rn") * col("rn")).over(rb))
        .withColumn("slope",
          (n * col("sxy") - col("sx") * col("sy"))
            / (n * col("sxx") - col("sx") * col("sx")))
        .withColumn("fit",
          col("sy") / n + col("slope") * (col("rn") - col("sx") / n))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(when(col("rn") >= 14, col("slope"))).as("lr_slope"),
          r6(when(col("rn") >= 14, col("fit"))).as("linreg"),
          r6(when(col("rn") >= 14, col("fit") + col("slope"))).as("tsf"),
          r6(when(col("rn") >= 14, expr(
            "try_divide((14.0*sxy - sx*sy) * (14.0*sxy - sx*sy)," +
              " (14.0*sxx - sx*sx) * (14.0*syy - sy*sy))"))).as("r2"))
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

    // Running intraday VWAP: cumulative typical-price·volume over
    // cumulative volume per (ticker, day), explicit ROWS frames (both
    // engines iterate running frames in order, so the double sums are
    // deterministic — unlike a shuffled groupBy sum). try_divide
    // mirrors the oracle's zero-volume CASE guard.
    "ind_vwap" -> ((s, dir) => {
      val wd = Window.partitionBy("ticker", "day").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      EventBars.bars(s, dir)
        .withColumn("day", expr("t div 86400000000"))
        .withColumn("pv",
          (col("high") + col("low") + col("close")) / lit(3.0) * col("volume"))
        .withColumn("cpv", sum(col("pv")).over(wd))
        .withColumn("cv", sum(col("volume")).over(wd))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(expr("try_divide(cpv, cv)")).as("vwap"))
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
    }))

  val oracles: Map[String, String] = {
    // α / 1−α spelled as the same literal arithmetic the kernel folds.
    def a(p: Int) = s"(2.0/${p + 1}.0)"
    def b(p: Int) = s"(1.0 - 2.0/${p + 1}.0)"
    def emaRec(p: Int): String = {
      val e1n = s"(${a(p)}*nb.close + ${b(p)}*r.e1)"
      val e2n = s"(${a(p)}*$e1n + ${b(p)}*r.e2)"
      val e3n = s"(${a(p)}*$e2n + ${b(p)}*r.e3)"
      s"""nb AS (SELECT ticker, t, event_id, close,
         |    row_number() OVER ($Over) AS rn FROM bars),
         |rec AS (
         |  SELECT ticker, t, event_id, rn,
         |    close AS e1, close AS e2, close AS e3
         |  FROM nb WHERE rn = 1
         |  UNION ALL
         |  SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
         |    $e1n, $e2n, $e3n
         |  FROM rec r JOIN nb
         |    ON nb.ticker = r.ticker AND nb.rn = r.rn + 1)""".stripMargin
    }

    // SAR recursion, spelled once and substituted textually so both
    // engines run the identical operation sequence.
    val sarRaw = "(r.sar + r.af * (r.ep - r.sar))"
    val sarnL = s"least($sarRaw, nb.pl)"
    val sarnS = s"greatest($sarRaw, nb.ph)"
    val revL = s"nb.low < $sarnL"
    val revS = s"nb.high > $sarnS"
    val sarRec =
      s"""nb AS (SELECT ticker, t, event_id, high, low, close,
         |    row_number() OVER ($Over) AS rn,
         |    lag(high) OVER ($Over) AS ph,
         |    lag(low) OVER ($Over) AS pl,
         |    lag(close) OVER ($Over) AS pc
         |  FROM bars),
         |rec AS (
         |  SELECT ticker, t, event_id, rn,
         |    (close >= pc) AS lng,
         |    CASE WHEN close >= pc THEN pl ELSE ph END AS sar,
         |    CASE WHEN close >= pc THEN high ELSE low END AS ep,
         |    0.02 AS af
         |  FROM nb WHERE rn = 2
         |  UNION ALL
         |  SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
         |    CASE WHEN r.lng THEN (CASE WHEN $revL THEN FALSE ELSE TRUE END)
         |         ELSE (CASE WHEN $revS THEN TRUE ELSE FALSE END) END,
         |    CASE WHEN r.lng THEN (CASE WHEN $revL THEN r.ep ELSE $sarnL END)
         |         ELSE (CASE WHEN $revS THEN r.ep ELSE $sarnS END) END,
         |    CASE WHEN r.lng
         |      THEN (CASE WHEN $revL THEN nb.low
         |        ELSE (CASE WHEN nb.high > r.ep THEN nb.high ELSE r.ep END) END)
         |      ELSE (CASE WHEN $revS THEN nb.high
         |        ELSE (CASE WHEN nb.low < r.ep THEN nb.low ELSE r.ep END) END)
         |      END,
         |    CASE WHEN r.lng
         |      THEN (CASE WHEN $revL THEN 0.02
         |        ELSE (CASE WHEN nb.high > r.ep
         |          THEN least(r.af + 0.02, 0.2) ELSE r.af END) END)
         |      ELSE (CASE WHEN $revS THEN 0.02
         |        ELSE (CASE WHEN nb.low < r.ep
         |          THEN least(r.af + 0.02, 0.2) ELSE r.af END) END)
         |      END
         |  FROM rec r JOIN nb
         |    ON nb.ticker = r.ticker AND nb.rn = r.rn + 1)""".stripMargin

    Map(

      "ind_sar" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |$sarRec
           |SELECT ticker, t, event_id,
           |  (round((sar) * 1000000.0) / 1000000.0 + 0.0) AS sar,
           |  (CASE WHEN lng THEN 1 ELSE -1 END)::BIGINT AS dir
           |FROM rec
           |UNION ALL
           |SELECT ticker, t, event_id, NULL::DOUBLE AS sar,
           |  NULL::BIGINT AS dir
           |FROM nb WHERE rn = 1""".stripMargin,

      // Same recursion as ind_sar but over the NON-NULL subsequence of
      // the gapped bars ("bars" below is pre-filtered); gap rows then
      // carry the last emitted state forward (bar-1's emitted state is
      // NULL, so gaps before bar 2 stay null — exactly the kernel).
      "ind_sar_gaps" ->
        s"""WITH RECURSIVE rawbars AS (${EventBars.sqlBars}),
           |gb AS (SELECT ticker, t, event_id,
           |    CASE WHEN event_id % 31 = 0 THEN NULL ELSE high END AS high,
           |    CASE WHEN event_id % 37 = 0 THEN NULL ELSE low END AS low,
           |    CASE WHEN event_id % 23 = 0 THEN NULL ELSE close END AS close
           |  FROM rawbars),
           |bars AS (SELECT * FROM gb WHERE high IS NOT NULL
           |  AND low IS NOT NULL AND close IS NOT NULL),
           |$sarRec,
           |st AS (SELECT ticker, t, event_id,
           |    struct_pack(sar := sar, lng := lng) AS o FROM rec),
           |allr AS (SELECT g.ticker, g.t, g.event_id, st.o
           |  FROM gb g LEFT JOIN st ON st.ticker = g.ticker
           |    AND st.t = g.t AND st.event_id = g.event_id),
           |cf AS (SELECT ticker, t, event_id,
           |    last_value(o IGNORE NULLS) OVER ($Over
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS co
           |  FROM allr)
           |SELECT ticker, t, event_id,
           |  (round((co.sar) * 1000000.0) / 1000000.0 + 0.0) AS sar,
           |  (CASE WHEN co.lng IS NULL THEN NULL
           |     WHEN co.lng THEN 1 ELSE -1 END)::BIGINT AS dir
           |FROM cf""".stripMargin,

      // Token-for-token mirror of AdaptiveEmaWindow.updateExpressions:
      // null x or c -> carry y; null y -> seed with x; else smooth.
      "ind_adema_gaps" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |nb AS (SELECT ticker, t, event_id,
           |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE close END AS x,
           |    CASE WHEN event_id % 13 = 0 THEN NULL
           |      ELSE CAST(0.25 AS DOUBLE) END AS c,
           |    row_number() OVER ($Over) AS rn
           |  FROM bars),
           |rec AS (
           |  SELECT ticker, t, event_id, rn,
           |    CASE WHEN c IS NULL OR x IS NULL THEN NULL ELSE x END AS y
           |  FROM nb WHERE rn = 1
           |  UNION ALL
           |  SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
           |    CASE WHEN nb.c IS NULL OR nb.x IS NULL THEN r.y
           |      WHEN r.y IS NULL THEN nb.x
           |      ELSE r.y + nb.c * (nb.x - r.y) END
           |  FROM rec r JOIN nb
           |    ON nb.ticker = r.ticker AND nb.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round((y) * 1000000.0) / 1000000.0 + 0.0) AS adema
           |FROM rec""".stripMargin,

      "ind_ema" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |${emaRec(12)}
           |SELECT ticker, t, event_id,
           |  (round((e1) * 1000000.0) / 1000000.0 + 0.0) AS ema,
           |  (round((2.0*e1 - e2) * 1000000.0) / 1000000.0 + 0.0) AS dema,
           |  (round((3.0*e1 - 3.0*e2 + e3) * 1000000.0) / 1000000.0 + 0.0) AS tema
           |FROM rec""".stripMargin,

      "ind_heikin" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |n AS (SELECT *, row_number() OVER ($Over) AS rn FROM bars),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, high, low,
           |    (open + close) / 2.0 AS hao,
           |    (open + high + low + close) / 4.0 AS hac
           |  FROM n WHERE rn = 1
           |  UNION ALL
           |  SELECT b.ticker, b.t, b.event_id, b.rn, b.high, b.low,
           |    (r.hao + r.hac) / 2.0,
           |    (b.open + b.high + b.low + b.close) / 4.0
           |  FROM rec r JOIN n b
           |    ON b.ticker = r.ticker AND b.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round(hao, 6) + 0.0) AS ha_open,
           |  (round(hac, 6) + 0.0) AS ha_close,
           |  (round(greatest(high, hao, hac), 6) + 0.0) AS ha_high,
           |  (round(least(low, hao, hac), 6) + 0.0) AS ha_low
           |FROM rec""".stripMargin,

      "ind_elder_ray" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |${emaRec(13)}
           |SELECT b.ticker, b.t, b.event_id,
           |  (round(b.high - rec.e1, 6) + 0.0) AS bull_power,
           |  (round(b.low - rec.e1, 6) + 0.0) AS bear_power
           |FROM rec JOIN bars b ON b.ticker = rec.ticker
           |  AND b.t = rec.t AND b.event_id = rec.event_id""".stripMargin,

      "ind_fisher" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |f AS (SELECT *, row_number() OVER ($Over) AS rn,
           |    max(high) OVER ($Over
           |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS hh,
           |    min(low) OVER ($Over
           |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS ll
           |  FROM bars),
           |nb AS (SELECT *, least(0.999, greatest(-0.999,
           |    2.0 * (CASE WHEN hh = ll THEN 0.5
           |      ELSE (close - ll) / (hh - ll) END) - 1.0)) AS xr FROM f),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, xr AS xs,
           |    0.5 * ln((1.0 + xr) / (1.0 - xr)) AS fish
           |  FROM nb WHERE rn = 1
           |  UNION ALL
           |  SELECT ticker, t, event_id, rn, xs,
           |    p_fish + 0.5 * ((0.5 * ln((1.0 + xs) / (1.0 - xs))) - p_fish)
           |  FROM (SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
           |      r.fish AS p_fish, r.xs + 0.33 * (nb.xr - r.xs) AS xs
           |    FROM rec r JOIN nb
           |      ON nb.ticker = r.ticker AND nb.rn = r.rn + 1) z)
           |SELECT ticker, t, event_id,
           |  (round(fish, 6) + 0.0) AS fisher,
           |  (round(lag(fish) OVER ($Over), 6) + 0.0) AS fisher_signal
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

      "ind_supertrend" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |n AS (SELECT *, row_number() OVER ($Over) AS rn FROM bars),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, close,
           |    (high - low) AS atr,
           |    (high + low)/2.0 + 3.0*(high - low) AS ub,
           |    (high + low)/2.0 - 3.0*(high - low) AS lb,
           |    CASE WHEN close > (high + low)/2.0 + 3.0*(high - low)
           |      THEN 1 ELSE -1 END AS dir
           |  FROM n WHERE rn = 1
           |  UNION ALL
           |  SELECT ticker, t, event_id, rn, close, atr,
           |    CASE WHEN ubb < p_ub OR p_close > p_ub THEN ubb ELSE p_ub END,
           |    CASE WHEN lbb > p_lb OR p_close < p_lb THEN lbb ELSE p_lb END,
           |    CASE WHEN p_dir = -1 THEN
           |      (CASE WHEN close >
           |        (CASE WHEN ubb < p_ub OR p_close > p_ub THEN ubb ELSE p_ub END)
           |       THEN 1 ELSE -1 END)
           |    ELSE
           |      (CASE WHEN close <
           |        (CASE WHEN lbb > p_lb OR p_close < p_lb THEN lbb ELSE p_lb END)
           |       THEN -1 ELSE 1 END)
           |    END
           |  FROM (
           |    SELECT *, (high + low)/2.0 + 3.0*atr AS ubb,
           |      (high + low)/2.0 - 3.0*atr AS lbb
           |    FROM (
           |      SELECT b.ticker, b.t, b.event_id, b.rn, b.close, b.high, b.low,
           |        r.close AS p_close, r.ub AS p_ub, r.lb AS p_lb,
           |        r.dir AS p_dir,
           |        (r.atr*9.0 + greatest(b.high - b.low, abs(b.high - r.close),
           |          abs(b.low - r.close)))/10.0 AS atr
           |      FROM rec r JOIN n b
           |        ON b.ticker = r.ticker AND b.rn = r.rn + 1) z0) z1)
           |SELECT ticker, t, event_id,
           |  (round(atr, 6) + 0.0) AS atr,
           |  (round(CASE WHEN dir = 1 THEN lb ELSE ub END, 6) + 0.0)
           |    AS supertrend,
           |  dir::BIGINT AS dir
           |FROM rec""".stripMargin,

      "ind_trix" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |${emaRec(15)},
           |l AS (SELECT *, lag(e3) OVER ($Over) AS p3 FROM rec)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN p3 IS NULL OR p3 = 0 THEN NULL
           |     ELSE (e3 - p3) / p3 END) * 1000000.0) / 1000000.0 + 0.0) AS trix
           |FROM l""".stripMargin,

      "ind_stoch" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT *,
           |    row_number() OVER ($Over) AS rn,
           |    max(high) OVER ($Over
           |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS hh,
           |    min(low) OVER ($Over
           |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS ll
           |  FROM bars),
           |k AS (SELECT *, CASE WHEN rn >= 14
           |    THEN (close - ll) / (hh - ll) END AS fk FROM f),
           |sk AS (SELECT *, CASE WHEN rn >= 16
           |    THEN (fk + lag(fk, 1) OVER ($Over)
           |          + lag(fk, 2) OVER ($Over)) / 3.0 END AS sk FROM k),
           |sd AS (SELECT *, CASE WHEN rn >= 18
           |    THEN (sk + lag(sk, 1) OVER ($Over)
           |          + lag(sk, 2) OVER ($Over)) / 3.0 END AS sd FROM sk)
           |SELECT ticker, t, event_id,
           |  (round((sk) * 1000000.0) / 1000000.0 + 0.0) AS slow_k,
           |  (round((sd) * 1000000.0) / 1000000.0 + 0.0) AS slow_d
           |FROM sd""".stripMargin,

      "ind_cmf" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |m AS (SELECT *,
           |    row_number() OVER ($Over) AS rn,
           |    ((close - low) - (high - close)) / (high - low) * volume AS mfv
           |  FROM bars)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN rn >= 20 THEN
           |     sum(mfv) OVER ($Over ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           |     / sum(volume) OVER ($Over ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           |   END) * 1000000.0) / 1000000.0 + 0.0) AS cmf
           |FROM m""".stripMargin,

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

      "ind_vortex" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT ticker, t, event_id,
           |    row_number() OVER ($Over) AS rn,
           |    greatest(high, coalesce(lag(close) OVER ($Over), high))
           |      - least(low, coalesce(lag(close) OVER ($Over), low)) AS tr,
           |    abs(high - lag(low) OVER ($Over)) AS vmp,
           |    abs(low - lag(high) OVER ($Over)) AS vmm
           |  FROM bars),
           |g AS (SELECT ticker, t, event_id, rn,
           |    sum(tr) OVER ($Over
           |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS str,
           |    sum(vmp) OVER ($Over
           |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS svp,
           |    sum(vmm) OVER ($Over
           |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS svm
           |  FROM f)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN rn >= 15 THEN
           |     CASE WHEN str = 0 THEN NULL ELSE svp / str END END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS vi_plus,
           |  (round((CASE WHEN rn >= 15 THEN
           |     CASE WHEN str = 0 THEN NULL ELSE svm / str END END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS vi_minus
           |FROM g""".stripMargin,

      "ind_keltner" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT ticker, t, event_id,
           |    row_number() OVER ($Over) AS rn,
           |    (high + low + close) / 3.0 AS tp,
           |    greatest(high, coalesce(lag(close) OVER ($Over), high))
           |      - least(low, coalesce(lag(close) OVER ($Over), low)) AS tr
           |  FROM bars),
           |g AS (SELECT ticker, t, event_id, rn,
           |    sum(tp) OVER ($Over
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) / 20.0 AS mid,
           |    sum(tr) OVER ($Over
           |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) / 10.0 AS rng
           |  FROM f)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN rn >= 20 THEN mid END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS kc_mid,
           |  (round((CASE WHEN rn >= 20 THEN mid + 2.0 * rng END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS kc_up,
           |  (round((CASE WHEN rn >= 20 THEN mid - 2.0 * rng END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS kc_dn
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

      "ind_ichimoku" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT ticker, t, event_id, close,
           |    row_number() OVER ($Over) AS rn,
           |    (max(high) OVER ($Over
           |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
           |     + min(low) OVER ($Over
           |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)) / 2.0 AS tk0,
           |    (max(high) OVER ($Over
           |      ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)
           |     + min(low) OVER ($Over
           |      ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)) / 2.0 AS kj0,
           |    (max(high) OVER ($Over
           |      ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
           |     + min(low) OVER ($Over
           |      ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)) / 2.0 AS sb0
           |  FROM bars),
           |g AS (SELECT ticker, t, event_id, close, rn,
           |    CASE WHEN rn >= 9 THEN tk0 END AS tenkan,
           |    CASE WHEN rn >= 26 THEN kj0 END AS kijun,
           |    CASE WHEN rn >= 52 THEN sb0 END AS spb
           |  FROM f)
           |SELECT ticker, t, event_id,
           |  (round((tenkan) * 1000000.0) / 1000000.0 + 0.0) AS tenkan,
           |  (round((kijun) * 1000000.0) / 1000000.0 + 0.0) AS kijun,
           |  (round((lag((tenkan + kijun) / 2.0, 26) OVER ($Over))
           |   * 1000000.0) / 1000000.0 + 0.0) AS senkou_a,
           |  (round((lag(spb, 26) OVER ($Over))
           |   * 1000000.0) / 1000000.0 + 0.0) AS senkou_b,
           |  (round((lead(close, 26) OVER ($Over))
           |   * 1000000.0) / 1000000.0 + 0.0) AS chikou
           |FROM g""".stripMargin,

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

      "ind_apo" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |nb AS (SELECT ticker, t, event_id, close,
           |    row_number() OVER ($Over) AS rn FROM bars),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, close AS ea, close AS eb
           |  FROM nb WHERE rn = 1
           |  UNION ALL
           |  SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
           |    (2.0/13.0)*nb.close + (1.0 - 2.0/13.0)*r.ea,
           |    (2.0/27.0)*nb.close + (1.0 - 2.0/27.0)*r.eb
           |  FROM rec r JOIN nb
           |    ON nb.ticker = r.ticker AND nb.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round((ea - eb) * 1000000.0) / 1000000.0 + 0.0) AS apo
           |FROM rec""".stripMargin,

      "ind_adxr" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |${graft.ind.RecursiveIndicators.sqlStages("bars",
              Seq("ticker"), Seq("t", "event_id"))}
           |SELECT ticker, t, event_id,
           |  (round(((adx + lag(adx, 14) OVER ($Over)) / 2.0)
           |   * 1000000.0) / 1000000.0 + 0.0) AS adxr
           |FROM ri_final""".stripMargin,

      "ind_adosc" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |ml AS (SELECT ticker, t, event_id,
           |    CAST(round(((close - low) - (high - close)) / (high - low)
           |      * volume * 1000000.0) AS BIGINT) AS mfv
           |  FROM bars),
           |ad0 AS (SELECT ticker, t, event_id,
           |    row_number() OVER ($Over) AS rn,
           |    CAST(sum(mfv) OVER ($Over
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS DOUBLE) / 1000000.0 AS ad
           |  FROM ml),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, ad AS ea, ad AS eb
           |  FROM ad0 WHERE rn = 1
           |  UNION ALL
           |  SELECT nb.ticker, nb.t, nb.event_id, nb.rn,
           |    (2.0/4.0)*nb.ad + (1.0 - 2.0/4.0)*r.ea,
           |    (2.0/11.0)*nb.ad + (1.0 - 2.0/11.0)*r.eb
           |  FROM rec r JOIN ad0 nb
           |    ON nb.ticker = r.ticker AND nb.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round((ea - eb) * 1000000.0) / 1000000.0 + 0.0) AS adosc
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

      "ind_chandelier" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT ticker, t, event_id,
           |    row_number() OVER ($Over) AS rn,
           |    greatest(high, coalesce(lag(close) OVER ($Over), high))
           |      - least(low, coalesce(lag(close) OVER ($Over), low)) AS tr,
           |    high, low
           |  FROM bars),
           |g AS (SELECT ticker, t, event_id, rn,
           |    max(high) OVER ($Over
           |      ROWS BETWEEN 21 PRECEDING AND CURRENT ROW) AS hh,
           |    min(low) OVER ($Over
           |      ROWS BETWEEN 21 PRECEDING AND CURRENT ROW) AS ll,
           |    sum(tr) OVER ($Over
           |      ROWS BETWEEN 21 PRECEDING AND CURRENT ROW) / 22.0 AS atr
           |  FROM f)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN rn >= 22 THEN hh - 3.0 * atr END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS chandelier_long,
           |  (round((CASE WHEN rn >= 22 THEN ll + 3.0 * atr END)
           |   * 1000000.0) / 1000000.0 + 0.0) AS chandelier_short
           |FROM g""".stripMargin,

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

      "ind_pivot_points" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |d AS (SELECT ticker, t // 86400000000 AS day,
           |    max(high) AS h, min(low) AS mn,
           |    last(close ORDER BY t, event_id) AS c
           |  FROM bars GROUP BY 1, 2),
           |lg AS (SELECT ticker, day,
           |    lag(h) OVER (PARTITION BY ticker ORDER BY day) AS ph,
           |    lag(mn) OVER (PARTITION BY ticker ORDER BY day) AS pl,
           |    lag(c) OVER (PARTITION BY ticker ORDER BY day) AS pc
           |  FROM d),
           |p AS (SELECT *, (ph + pl + pc) / 3.0 AS pv FROM lg)
           |SELECT ticker, day,
           |  (round((pv) * 1000000.0) / 1000000.0 + 0.0) AS pivot,
           |  (round((2.0 * pv - pl) * 1000000.0) / 1000000.0 + 0.0) AS r1,
           |  (round((2.0 * pv - ph) * 1000000.0) / 1000000.0 + 0.0) AS s1,
           |  (round((pv + (ph - pl)) * 1000000.0) / 1000000.0 + 0.0) AS r2,
           |  (round((pv - (ph - pl)) * 1000000.0) / 1000000.0 + 0.0) AS s2
           |FROM p""".stripMargin,

      "ind_kama" ->
        s"""WITH RECURSIVE bars AS (${EventBars.sqlBars}),
           |n0 AS (SELECT ticker, t, event_id, close,
           |    row_number() OVER ($Over) AS rn,
           |    abs(close - lag(close, 1) OVER ($Over)) AS dif,
           |    lag(close, 10) OVER ($Over) AS c10
           |  FROM bars),
           |nb AS (SELECT ticker, t, event_id, close, rn,
           |    CASE WHEN rn >= 11 THEN
           |      (CASE WHEN vol = 0 THEN 0.0
           |        ELSE abs(close - c10) / vol END)
           |      * (2.0/3.0 - 2.0/31.0) + 2.0/31.0
           |    END AS sc0
           |  FROM (SELECT *, sum(dif) OVER ($Over
           |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vol FROM n0)),
           |ns AS (SELECT *, sc0 * sc0 AS sc FROM nb),
           |rec AS (
           |  SELECT ticker, t, event_id, rn, close AS kama
           |  FROM ns WHERE rn = 11
           |  UNION ALL
           |  SELECT ns.ticker, ns.t, ns.event_id, ns.rn,
           |    r.kama + ns.sc * (ns.close - r.kama)
           |  FROM rec r JOIN ns
           |    ON ns.ticker = r.ticker AND ns.rn = r.rn + 1)
           |SELECT ticker, t, event_id,
           |  (round((kama) * 1000000.0) / 1000000.0 + 0.0) AS kama
           |FROM rec
           |UNION ALL
           |SELECT ticker, t, event_id, NULL::DOUBLE AS kama
           |FROM ns WHERE rn < 11""".stripMargin,

      "ind_linreg" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |nb AS (SELECT ticker, t, event_id, close,
           |    CAST(row_number() OVER ($Over) AS DOUBLE) AS rn FROM bars),
           |f AS (SELECT ticker, t, event_id, rn,
           |    sum(close) OVER fr AS sy,
           |    sum(close * close) OVER fr AS syy,
           |    sum(rn * close) OVER fr AS sxy,
           |    sum(rn) OVER fr AS sx,
           |    sum(rn * rn) OVER fr AS sxx
           |  FROM nb
           |  WINDOW fr AS ($Over ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
           |g AS (SELECT *,
           |    (14.0*sxy - sx*sy) / (14.0*sxx - sx*sx) AS slope FROM f),
           |h AS (SELECT *, sy / 14.0 + slope * (rn - sx / 14.0) AS fit FROM g)
           |SELECT ticker, t, event_id,
           |  (round((CASE WHEN rn >= 14 THEN slope END) * 1000000.0)
           |    / 1000000.0 + 0.0) AS lr_slope,
           |  (round((CASE WHEN rn >= 14 THEN fit END) * 1000000.0)
           |    / 1000000.0 + 0.0) AS linreg,
           |  (round((CASE WHEN rn >= 14 THEN fit + slope END) * 1000000.0)
           |    / 1000000.0 + 0.0) AS tsf,
           |  (round((CASE WHEN rn >= 14 THEN
           |      CASE WHEN (14.0*sxx - sx*sx) * (14.0*syy - sy*sy) = 0 THEN NULL
           |        ELSE (14.0*sxy - sx*sy) * (14.0*sxy - sx*sy)
           |          / ((14.0*sxx - sx*sx) * (14.0*syy - sy*sy)) END
           |    END) * 1000000.0) / 1000000.0 + 0.0) AS r2
           |FROM h""".stripMargin,

      "ind_donchian" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |f AS (SELECT *,
           |    row_number() OVER ($Over) AS rn,
           |    max(high) OVER ($Over
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS up,
           |    min(low) OVER ($Over
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS dn
           |  FROM bars)
           |SELECT ticker, t, event_id,
           |  CASE WHEN rn >= 20 THEN up END AS dc_up,
           |  CASE WHEN rn >= 20 THEN dn END AS dc_dn,
           |  (round((CASE WHEN rn >= 20
           |     THEN (close - dn) / (up - dn) END) * 1000000.0) / 1000000.0 + 0.0) AS dc_pos
           |FROM f""".stripMargin,

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

      "ts_twap" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |d AS (SELECT *, t // 86400000000 AS day FROM bars),
           |g AS (SELECT *, CAST(lead(t) OVER (PARTITION BY ticker, day
           |    ORDER BY t, event_id) - t AS DOUBLE) AS dt FROM d)
           |SELECT ticker, day, count(*)::BIGINT AS n_spans,
           |  (round((sum(close * dt) / sum(dt)) * 1000000.0) / 1000000.0 + 0.0) AS twap
           |FROM g WHERE dt IS NOT NULL
           |GROUP BY ticker, day""".stripMargin,

      "ind_vwap" ->
        s"""WITH bars AS (${EventBars.sqlBars}),
           |d AS (SELECT *, t // 86400000000 AS day FROM bars),
           |g AS (SELECT *,
           |    sum((high + low + close) / 3.0 * volume) OVER (
           |      PARTITION BY ticker, day ORDER BY t, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpv,
           |    sum(volume) OVER (
           |      PARTITION BY ticker, day ORDER BY t, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
           |  FROM d)
           |SELECT ticker, t, event_id,
           |  (round(CASE WHEN cv = 0 THEN NULL ELSE cpv / cv END, 6) + 0.0)
           |    AS vwap
           |FROM g""".stripMargin,

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
          |SELECT * FROM agg WHERE n_a IS NOT NULL""".stripMargin)
  }
}
