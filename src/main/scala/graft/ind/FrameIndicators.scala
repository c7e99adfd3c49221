package graft.ind

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

import graft.model.IndicatorConfig

/** Group W-F frame-based indicators (SURVEY.md §2): ROCP, MOM, MFI,
  * ULTOSC, AROONOSC, STOCHF, PPO — all expressible as built-in Spark
  * window functions over one shared
  * `Window.partitionBy(keys).orderBy(time)` spec, so Catalyst collapses
  * them into a handful of Window physical nodes over a single exchange.
  *
  * Semantics re-derive TA-Lib 0.4.32's published kernels (the reference
  * calls them at stockdata/indicators.py:314-457) including warm-up NaN
  * regions (here: nulls) and the reference's /100 scaling
  * (indicators.py:134, applied at each `_get_*`).
  *
  * All formulas are mirrored textually in [[FrameIndicators.sqlStages]]
  * so a DuckDB oracle reproduces them bit-for-bit.
  */
object FrameIndicators {

  /** Adds frame-indicator columns to a bars DataFrame.
    *
    * Input columns required: `part` key cols, `order` time cols, and
    * `high, low, close, volume` plus `price` (the adj-close series used
    * by ROCP/PPO — reference config indicators.py:106-114).
    *
    * Added output columns (null in warm-up region, TA-Lib lookbacks):
    * `rn, rocp_1..rocp_{n-1}, mom, mfi, ultosc, aroonosc, ppo, sok, sok_hist`.
    */
  def addAll(
      df0: DataFrame,
      part: Seq[String],
      order: Seq[String],
      price: String = "close",
      cfg: IndicatorConfig = IndicatorConfig()): DataFrame = {

    val w = Window.partitionBy(part.map(col): _*).orderBy(order.map(col): _*)
    def rb(a: Long, b: Long): WindowSpec = w.rowsBetween(a, b)
    val p = col(price)
    // Source columns come from the config (a renamed-column input works
    // end-to-end), not hardcoded names.
    val cl = col(cfg.closeUnadjColumn)
    val hi = col(cfg.highColumn)
    val lo = col(cfg.lowColumn)
    val vol = col(cfg.volumeColumn)

    // Stage 1: row number, lag-derived primitives.
    val df1 = df0
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_c", lag(cl, 1).over(w))
      .withColumn("tp", (hi + lo + cl) / lit(3.0))

    // Stage 2: per-row derived series (money flow, true range, buying pressure).
    val df2 = df1
      .withColumn("dtp", col("tp") - lag(col("tp"), 1).over(w))
      .withColumn("mf", col("tp") * vol)
      .withColumn("bp",
        when(col("prev_c").isNotNull, cl - least(lo, col("prev_c"))))
      .withColumn("tr_",
        when(col("prev_c").isNotNull,
          greatest(hi, col("prev_c")) - least(lo, col("prev_c"))))
      .withColumn("pos_mf",
        when(col("dtp") > 0, col("mf")).when(col("dtp") <= 0, lit(0.0)))
      .withColumn("neg_mf",
        when(col("dtp") < 0, col("mf")).when(col("dtp") >= 0, lit(0.0)))

    // Stage 3: rolling-frame aggregates. One Window node per distinct frame.
    val mfiP = cfg.mfiPeriod
    val (u1, u2, u3) = (cfg.ultoscPeriod1, cfg.ultoscPeriod2, cfg.ultoscPeriod3)
    val ar = cfg.aroonoscPeriod
    val k5 = cfg.stochFastK
    val df3 = df2
      .withColumn("pos_sum", sum("pos_mf").over(rb(-(mfiP - 1), 0)))
      .withColumn("neg_sum", sum("neg_mf").over(rb(-(mfiP - 1), 0)))
      .withColumn("bp1", sum("bp").over(rb(-(u1 - 1), 0)))
      .withColumn("tr1", sum("tr_").over(rb(-(u1 - 1), 0)))
      .withColumn("bp2", sum("bp").over(rb(-(u2 - 1), 0)))
      .withColumn("tr2", sum("tr_").over(rb(-(u2 - 1), 0)))
      .withColumn("bp3", sum("bp").over(rb(-(u3 - 1), 0)))
      .withColumn("tr3", sum("tr_").over(rb(-(u3 - 1), 0)))
      // AROONOSC: index of the extreme in the trailing period+1 bars;
      // TA-Lib ties keep the MOST RECENT extreme (>=/<= update rule), which
      // struct ordering reproduces: ties on value fall through to max rn.
      .withColumn("hi_rn",
        max(struct(hi.as("v"), col("rn").as("rn"))).over(rb(-ar, 0)).getField("rn"))
      .withColumn("lo_rn",
        max(struct((-lo).as("v"), col("rn").as("rn"))).over(rb(-ar, 0)).getField("rn"))
      .withColumn("hh", max(hi).over(rb(-(k5 - 1), 0)))
      .withColumn("ll", min(lo).over(rb(-(k5 - 1), 0)))
      .withColumn("sma_fast", avg(p).over(rb(-(cfg.ppoFast - 1), 0)))
      .withColumn("sma_slow", avg(p).over(rb(-(cfg.ppoSlow - 1), 0)))

    // Stage 4: raw fastK (needed as input to the fastD rolling average).
    // try_divide everywhere a divisor is data-dependent: Spark 4 ANSI
    // mode errors on /0, while the reference (numpy/TA-Lib IEEE) and
    // the DuckDB oracle (NULL on double /0) never do — try_divide's
    // NULL matches the oracle exactly.
    val df4 = df3.withColumn("sok_raw",
      when(col("rn") >= k5,
        try_divide(cl - col("ll"), col("hh") - col("ll"))))

    // Stage 5: fastD + final guarded outputs. Guards reproduce TA-Lib
    // lookbacks: MFI=period, ULTOSC=period3, AROONOSC=period,
    // STOCHF=fastK-1+fastD-1, PPO=slow-1 (first valid 0-based index).
    val sokFrom = k5 + cfg.stochFastD - 1
    val df5 = df4
      .withColumn("sod", avg("sok_raw").over(rb(-(cfg.stochFastD - 1), 0)))

    val rocps = (1 until cfg.numPrevRocp).map { k =>
      try_divide(p - lag(p, k).over(w), lag(p, k).over(w)).as(s"rocp_$k")
    }

    df5.select(col("*") +: (rocps ++ Seq[Column](
      (p - lag(p, 10).over(w)).as("mom"),
      when(col("rn") >= mfiP + 1,
        try_divide(col("pos_sum"), col("pos_sum") + col("neg_sum"))).as("mfi"),
      when(col("rn") >= u3 + 1,
        (lit(4.0) * try_divide(col("bp1"), col("tr1"))
          + lit(2.0) * try_divide(col("bp2"), col("tr2"))
          + try_divide(col("bp3"), col("tr3"))) / lit(7.0)).as("ultosc"),
      when(col("rn") >= ar + 1,
        (col("hi_rn") - col("lo_rn")) / lit(ar.toDouble)).as("aroonosc"),
      when(col("rn") >= cfg.ppoSlow,
        try_divide(col("sma_fast") - col("sma_slow"), col("sma_slow"))).as("ppo"),
      when(col("rn") >= sokFrom, col("sok_raw")).as("sok"),
      when(col("rn") >= sokFrom, col("sok_raw") - col("sod")).as("sok_hist"))): _*)
  }

  /** DuckDB CTE chain mirroring [[addAll]] formula-for-formula.
    *
    * @param from  name of the CTE/table providing the bars
    * @param partBy comma-joined partition columns
    * @param orderBy comma-joined ordering columns
    * @return CTE list (to splice after a leading WITH) exposing `fi_final`
    *         with the same columns addAll adds.
    */
  def sqlStages(
      from: String,
      partBy: String,
      orderBy: String,
      price: String = "close",
      cfg: IndicatorConfig = IndicatorConfig()): String = {
    val over = s"PARTITION BY $partBy ORDER BY $orderBy"
    def rb(k: Int) = s"OVER ($over ROWS BETWEEN ${k - 1} PRECEDING AND CURRENT ROW)"
    val cl = cfg.closeUnadjColumn
    val hiC = cfg.highColumn
    val loC = cfg.lowColumn
    val volC = cfg.volumeColumn
    val mfiP = cfg.mfiPeriod
    val (u1, u2, u3) = (cfg.ultoscPeriod1, cfg.ultoscPeriod2, cfg.ultoscPeriod3)
    val ar = cfg.aroonoscPeriod
    val k5 = cfg.stochFastK
    val sokFrom = k5 + cfg.stochFastD - 1
    val rocpCols = (1 until cfg.numPrevRocp).map { k =>
      s"($price - lag($price, $k) OVER ($over)) / lag($price, $k) OVER ($over) AS rocp_$k"
    }.mkString(",\n    ")

    s"""fi_s1 AS (
       |  SELECT *,
       |    row_number() OVER ($over) AS rn,
       |    lag($cl, 1) OVER ($over) AS prev_c,
       |    ($hiC + $loC + $cl) / 3.0 AS tp
       |  FROM $from),
       |fi_s2 AS (
       |  SELECT *,
       |    tp - lag(tp, 1) OVER ($over) AS dtp,
       |    tp * $volC AS mf,
       |    CASE WHEN prev_c IS NOT NULL THEN $cl - least($loC, prev_c) END AS bp,
       |    CASE WHEN prev_c IS NOT NULL
       |      THEN greatest($hiC, prev_c) - least($loC, prev_c) END AS tr_
       |  FROM fi_s1),
       |fi_s2b AS (
       |  SELECT *,
       |    CASE WHEN dtp > 0 THEN mf WHEN dtp <= 0 THEN 0.0 END AS pos_mf,
       |    CASE WHEN dtp < 0 THEN mf WHEN dtp >= 0 THEN 0.0 END AS neg_mf
       |  FROM fi_s2),
       |fi_s3 AS (
       |  SELECT *,
       |    sum(pos_mf) ${rb(mfiP)} AS pos_sum,
       |    sum(neg_mf) ${rb(mfiP)} AS neg_sum,
       |    sum(bp) ${rb(u1)} AS bp1, sum(tr_) ${rb(u1)} AS tr1,
       |    sum(bp) ${rb(u2)} AS bp2, sum(tr_) ${rb(u2)} AS tr2,
       |    sum(bp) ${rb(u3)} AS bp3, sum(tr_) ${rb(u3)} AS tr3,
       |    (max(struct_pack(v := $hiC, rn := rn)) ${rb(ar + 1)}).rn AS hi_rn,
       |    (max(struct_pack(v := -$loC, rn := rn)) ${rb(ar + 1)}).rn AS lo_rn,
       |    max($hiC) ${rb(k5)} AS hh, min($loC) ${rb(k5)} AS ll,
       |    avg($price) ${rb(cfg.ppoFast)} AS sma_fast,
       |    avg($price) ${rb(cfg.ppoSlow)} AS sma_slow
       |  FROM fi_s2b),
       |fi_s4 AS (
       |  SELECT *, CASE WHEN rn >= $k5 THEN ($cl - ll) / (hh - ll) END AS sok_raw
       |  FROM fi_s3),
       |fi_final AS (
       |  SELECT *,
       |    $rocpCols,
       |    $price - lag($price, 10) OVER ($over) AS mom,
       |    CASE WHEN rn >= ${mfiP + 1} THEN pos_sum / (pos_sum + neg_sum) END AS mfi,
       |    CASE WHEN rn >= ${u3 + 1} THEN (4.0 * (bp1 / tr1) + 2.0 * (bp2 / tr2)
       |      + (bp3 / tr3)) / 7.0 END AS ultosc,
       |    CASE WHEN rn >= ${ar + 1}
       |      THEN (hi_rn - lo_rn) / ${ar.toDouble} END AS aroonosc,
       |    CASE WHEN rn >= ${cfg.ppoSlow}
       |      THEN (sma_fast - sma_slow) / sma_slow END AS ppo,
       |    CASE WHEN rn >= $sokFrom THEN sok_raw END AS sok,
       |    CASE WHEN rn >= $sokFrom THEN sok_raw
       |      - avg(sok_raw) ${rb(cfg.stochFastD)} END AS sok_hist
       |  FROM fi_s4)""".stripMargin
  }
}
