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
    val all = RecursiveIndicators.addAll(framed,
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
}
