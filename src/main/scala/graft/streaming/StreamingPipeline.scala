package graft.streaming

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.MarketCalendar
import graft.ind.IndicatorPipeline
import graft.model.{IndicatorConfig, Schemas}

/** One raw bar as a streaming event (same fields as Schemas.rawBars). */
final case class RawBarEvent(
    ticker: String,
    volume: Double,
    open: Double,
    close: Double,
    high: Double,
    low: Double,
    adj_close: Double,
    window_start: Long)

/** A completed (ticker, trading-day) group of bars. */
final case class DayBars(ticker: String, ds: String, bars: Array[RawBarEvent])

/** Structured Streaming variant of the daily pipeline (SURVEY.md §7.5).
  *
  * The reference's "stream" is an Airflow daily cron; the streaming-
  * native equivalent is: file/socket source of raw bars → event-time
  * watermark → stateful assembly of complete (ticker, day) groups via
  * `flatMapGroupsWithState` (exact gap/island semantics need buffering —
  * `session_window` cannot express the 60/120/180 membership rule) →
  * per-micro-batch hand-off to the BATCH [[IndicatorPipeline]] inside
  * `foreachBatch`, so streaming output is bit-identical to batch with
  * zero logic duplication.
  *
  * Scale notes: state per key is one ticker-day (≤ ~420 bars, bounded);
  * watermark + EventTimeTimeout bound state lifetime; late rows beyond
  * the watermark are dropped exactly like the reference (it downloads
  * only completed days). Shuffle key (ticker, ds) matches the batch
  * pipeline's partitioning.
  */
object StreamingPipeline {

  /** Eastern-date string for an epoch-ns bar timestamp. */
  def dsOf(windowStartNs: Long): String =
    LocalDate.ofInstant(Instant.ofEpochSecond(windowStartNs / 1000000000L),
      MarketCalendar.Eastern).toString

  /** Assemble complete (ticker, day) bar groups. Emits each group once,
    * when the watermark passes the day's market close + `slackMinutes`.
    */
  def assembleDays(
      bars: Dataset[RawBarEvent],
      watermarkDelay: String = "30 minutes",
      slackMinutes: Long = 35): Dataset[DayBars] = {
    val spark = bars.sparkSession
    import spark.implicits._

    val withTime = bars
      .withColumn("_ts", timestamp_seconds(col("window_start") / 1000000000d))
      .withWatermark("_ts", watermarkDelay)
      .as[(String, Double, Double, Double, Double, Double, Double, Long, java.sql.Timestamp)]

    withTime
      .groupByKey { case (t, _, _, _, _, _, _, ws, _) => (t, dsOf(ws)) }
      .flatMapGroupsWithState[List[RawBarEvent], DayBars](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((ticker, ds), rows, state: GroupState[List[RawBarEvent]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil)
            state.remove()
            if (out.isEmpty) Iterator.empty
            else Iterator.single(DayBars(ticker, ds,
              out.sortBy(_.window_start).toArray))
          } else {
            val incoming = rows.map { case (t, v, o, c, h, l, ac, ws, _) =>
              RawBarEvent(t, v, o, c, h, l, ac, ws)
            }.toList
            state.update(incoming ::: state.getOption.getOrElse(Nil))
            // fire once the watermark passes market close + slack
            val (_, closeNs) =
              MarketCalendar.marketOpenCloseNanos(LocalDate.parse(ds))
            state.setTimeoutTimestamp(closeNs / 1000000L + slackMinutes * 60000L)
            Iterator.empty
          }
      }
  }

  /** Full streaming query: assembled days → batch IndicatorPipeline per
    * day inside foreachBatch → `sink(ds, indicatorRows)`. Returns the
    * started query (memory/file sinks are the caller's choice via sink).
    */
  def run(
      bars: Dataset[RawBarEvent],
      cfg: IndicatorConfig = IndicatorConfig())(
      sink: (String, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = bars.sparkSession
    import spark.implicits._
    assembleDays(bars).writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[DayBars], _: Long) =>
        val days = batch.collect() // bounded: completed ticker-days this batch
        days.groupBy(_.ds).foreach { case (ds, groups) =>
          val raw = spark.createDataFrame(
            java.util.Arrays.asList(groups.flatMap(_.bars).map(b =>
              org.apache.spark.sql.Row(b.ticker, b.volume, b.open, b.close,
                b.high, b.low, b.adj_close, b.window_start)): _*),
            Schemas.rawBars)
          sink(ds, IndicatorPipeline.run(raw, LocalDate.parse(ds), cfg))
        }
      }
      .start()
  }
}
