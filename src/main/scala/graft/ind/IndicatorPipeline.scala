package graft.ind

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Densify, Interpolate, MarketCalendar, Sessionize}
import graft.model.{IndicatorConfig, Schemas}

/** The reference's flagship E2 pipeline as ONE declarative DataFrame
  * transform (SURVEY.md §3 "Spark shape of the whole of E2"):
  *
  *   raw bars → ticker/market-hours filters → sessionize (islands) →
  *   60s grid densify → linear interpolate → frame + recursive
  *   indicators → 18-column project → warm-up dropna.
  *
  * Replaces the reference's per-ticker Python loop
  * (data_indicators.py:48-62) with Window/groupByKey partitioning: one
  * hash exchange on `ticker` feeds sessionization; (ticker, island)
  * feeds everything after.
  *
  * Scale notes (100 TB): filters fold to literals and push into the
  * parquet scan; every window shares the (ticker[, island]) exchange;
  * the recursive scan streams per group (a ticker-day is ≤ ~420 rows,
  * SURVEY.md §7.4). Nothing collects to the driver.
  */
object IndicatorPipeline {

  /** Run the full pipeline for one trading date over raw bars
    * (schema [[Schemas.rawBars]], `window_start` in epoch ns).
    */
  def run(raw: DataFrame, date: LocalDate,
      cfg: IndicatorConfig = IndicatorConfig()): DataFrame = {
    val (mst, met) = MarketCalendar.marketOpenCloseNanos(date)
    val gapsNs = cfg.allowedGapsSec.map(_ * 1000000000L)
    val stepNs = cfg.gridStepSec * 1000000000L

    val filtered = raw
      .filter(col(cfg.timeColumn).isNotNull)          // P5 analog for time
      .filter(col("ticker").isNotNull)                 // P5 (data_indicators.py:49-50)
      .filter(col(cfg.timeColumn) >= lit(mst) && col(cfg.timeColumn) < lit(met)) // P2
      .withColumn(cfg.volumeColumn, col(cfg.volumeColumn).cast("double")) // P6

    val sessioned = Sessionize(filtered, "ticker", cfg.timeColumn, gapsNs) // F1
    val densified = Densify(sessioned,
      Seq("ticker", "island", "sub_ticker"), cfg.timeColumn, stepNs)       // F2
    val filled = Interpolate(densified, Seq("ticker", "island"),
      cfg.timeColumn,
      Seq(cfg.volumeColumn, "open", cfg.closeUnadjColumn, cfg.highColumn,
        cfg.lowColumn, cfg.closeColumn))                                   // F3

    // (ticker, island) ≡ sub_ticker: reuses Interpolate's exchange
    val framed = FrameIndicators.addAll(filled,
      Seq("ticker", "island"), Seq(cfg.timeColumn), price = cfg.closeColumn, cfg = cfg)

    // R1-R4 recursive family. Default path: the fused graft_ind_w
    // AggregateWindowFunction over the SAME (ticker, island) window the
    // frame indicators ride — the whole pipeline is ONE hash exchange.
    // Both the Wilder and ADX periods thread through the kernel; the
    // flatMapGroups scan (cross-checked per round by ind_recursive vs
    // ind_recursive_window) remains the fallback for the one config the
    // shared-state kernel can't express (split rsi/cmo Wilder periods —
    // which the scan path itself also rejects today).
    val all =
      if (cfg.rsiPeriod == cfg.cmoPeriod) {
        graft.functions.GraftFunctions.register(raw.sparkSession)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ticker", "island").orderBy(cfg.timeColumn)
        framed
          .withColumn("_x", expr(s"graft_ind_w(${cfg.closeColumn}, " +
            s"${cfg.highColumn}, ${cfg.lowColumn}, ${cfg.closeUnadjColumn}, " +
            s"${cfg.rsiPeriod}, ${cfg.adxPeriod})").over(w))
          .withColumn("rsi", col("_x.rsi"))
          .withColumn("cmo", col("_x.cmo"))
          .withColumn("macd_hist", col("_x.macd_hist"))
          .withColumn("adx", col("_x.adx"))
          .withColumn("adx_hist", col("_x.adx_hist"))
          .drop("_x")
      } else RecursiveIndicators.addAll(framed,
        Seq("sub_ticker"), Seq(cfg.timeColumn), price = cfg.closeColumn,
        high = cfg.highColumn, low = cfg.lowColumn,
        close = cfg.closeUnadjColumn, cfg = cfg)

    val projected = all.select(
      col(cfg.timeColumn).as("window_start"),
      col(cfg.closeColumn).as("close_price"),
      col("rocp_1"), col("rocp_2"), col("rocp_3"), col("rocp_4"), col("rocp_5"),
      col("rsi"), col("mfi"), col("ultosc"), col("cmo"), col("aroonosc"),
      col("macd_hist"), col("ppo"), col("sok"), col("sok_hist"),
      col("adx"), col("adx_hist"),
      col("sub_ticker").as("ticker"))                                     // P7

    require(projected.columns.toSeq == Schemas.indicatorColumns)
    if (cfg.skipNa) projected.na.drop() else projected                    // P4
  }

  /** Multi-day variant — the 100 TB shape: N trading days in ONE job.
    *
    * Replaces the reference's one-process-per-day Airflow fan-out
    * (airflow_dag.py:26, max_active_runs=8) with a single plan: per-day
    * market bounds are broadcast-joined (no per-day driver loop), series
    * identity is (ticker, ds), and the recursive indicators run as the
    * custom window aggregates so the whole range is ONE exchange on
    * hash(ticker, ds). Output carries `ds` for a date-partitioned sink
    * (partition pruning on read — BarsIO layout).
    */
  def runRange(raw: DataFrame, dates: Seq[LocalDate],
      cfg: IndicatorConfig = IndicatorConfig()): DataFrame = {
    val spark = raw.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val gapsNs = cfg.allowedGapsSec.map(_ * 1000000000L)
    val stepNs = cfg.gridStepSec * 1000000000L
    val ts = cfg.timeColumn

    val bounds = spark.createDataFrame(
      java.util.Arrays.asList(dates.map { d =>
        val (o, c) = MarketCalendar.marketOpenCloseNanos(d)
        org.apache.spark.sql.Row(d.toString, o, c)
      }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ds",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_mst",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_met",
          org.apache.spark.sql.types.LongType))))

    val filtered = raw
      .filter(col(ts).isNotNull && col("ticker").isNotNull)
      .withColumn("ds", date_format(from_utc_timestamp(
        timestamp_seconds(col(ts) / lit(1000000000d)),
        MarketCalendar.Eastern.getId), "yyyy-MM-dd"))
      .join(broadcast(bounds), Seq("ds"))              // prunes unrequested days
      .filter(col(ts) >= col("_mst") && col(ts) < col("_met"))
      .drop("_mst", "_met")
      .withColumn(cfg.volumeColumn, col(cfg.volumeColumn).cast("double"))

    val keys = Seq("ticker", "ds")
    val sessioned = Sessionize(filtered, keys, "ticker", ts, gapsNs)
    val densified = Densify(sessioned,
      keys ++ Seq("island", "sub_ticker"), ts, stepNs)
    val filled = Interpolate(densified, keys :+ "island", ts,
      Seq(cfg.volumeColumn, "open", cfg.closeUnadjColumn, cfg.highColumn,
        cfg.lowColumn, cfg.closeColumn))
    val framed = FrameIndicators.addAll(filled,
      keys :+ "island", Seq(ts), price = cfg.closeColumn, cfg = cfg)

    // The fused kernel threads both the Wilder and ADX periods
    // (MACDFIX stays fixed-constant by definition). The one config it
    // can't express — split rsi/cmo Wilder periods, which share one
    // state — is rejected loudly, exactly as the scan path rejects it.
    require(cfg.rsiPeriod == cfg.cmoPeriod,
      "runRange's shared Wilder kernel needs rsiPeriod == cmoPeriod")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ticker", "ds", "island").orderBy(ts)
    val p = col(cfg.closeColumn)
    val projected = framed
      .withColumn("_x", expr(s"graft_ind_w(${cfg.closeColumn}, " +
        s"${cfg.highColumn}, ${cfg.lowColumn}, ${cfg.closeUnadjColumn}, " +
        s"${cfg.rsiPeriod}, ${cfg.adxPeriod})").over(w))
      .select(
        col(ts).as("window_start"), p.as("close_price"),
        col("rocp_1"), col("rocp_2"), col("rocp_3"), col("rocp_4"), col("rocp_5"),
        col("_x.rsi").as("rsi"),
        col("mfi"), col("ultosc"),
        col("_x.cmo").as("cmo"),
        col("aroonosc"),
        col("_x.macd_hist").as("macd_hist"),
        col("ppo"), col("sok"), col("sok_hist"),
        col("_x.adx").as("adx"),
        col("_x.adx_hist").as("adx_hist"),
        col("sub_ticker").as("ticker"), col("ds"))
    if (cfg.skipNa) projected.na.drop() else projected
  }
}
