package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maps the driver's `events` table onto the reference's bar domain
  * (TESTDATA.md: user_id→ticker, ts→window_start, value→close).
  *
  * Every derivation here is mirrored 1:1 in [[sqlBars]] so the DuckDB
  * oracle computes bit-identical inputs. High/low/volume are synthesized
  * deterministically because `events` carries a single value series while
  * the reference indicators need OHLCV (data_download_yahoo.py:42-51).
  */
object EventBars {

  /** `events` with ts normalized to epoch-micros LongType `t`.
    *
    * The parquet stores TIMESTAMP(NANOS), which vanilla Spark rejects
    * (PARQUET_TYPE_ILLEGAL); `nanosAsLong` reads it as raw ns — the same
    * representation the reference keeps end-to-end (epoch ns,
    * utils.py:11) — and we floor-divide to micros, matching DuckDB's
    * ns→us read-time truncation.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = s.read.parquet(s"$dir/events.parquet")
    val t = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    e.withColumn("t", t)
  }

  /** Bars: ticker, t (epoch micros), event_id, open/high/low/close/volume. */
  def bars(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("user_id").cast("string").as("ticker"),
      col("t"),
      col("event_id"),
      col("value").as("close"),
      (col("value") * lit(1.001) + lit(0.5)).as("high"),
      (col("value") * lit(0.999) - lit(0.5)).as("low"),
      col("value").as("open"),
      (lit(100.0) + (col("event_id") % 97).cast("double")).as("volume"))

  /** DuckDB CTE body equivalent of [[bars]]. */
  val sqlBars: String =
    """SELECT CAST(user_id AS VARCHAR) AS ticker, epoch_us(ts) AS t, event_id,
      |  value AS close, value*1.001 + 0.5 AS high, value*0.999 - 0.5 AS low,
      |  value AS open, 100.0 + CAST(event_id % 97 AS DOUBLE) AS volume
      |FROM events""".stripMargin

  /** Base of the synthetic minute grid (2024-01-01 00:00:00 UTC, micros). */
  val GridBaseMicros: Long = 1704067200000000L
  val StepMicros: Long = 60L * 1000000L

  /** Minute-grid bars: deterministic 60s-spaced `window_start` per ticker
    * with planted gaps, driving the F1/F2/F3 restructuring operators
    * (SURVEY.md §2): extra=1 → 120s gap, extra=2 → 180s gap (densified),
    * extra=5 → 360s gap (island break, indicators.py:184).
    * Output: ticker, event_id, ws (epoch micros), open/high/low/close/volume.
    */
  def minuteBars(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy("t", "event_id")
    bars(s, dir)
      .withColumn("extra",
        when(col("event_id") % 29 === 0, lit(5L))
          .when(col("event_id") % 11 === 0, lit(2L))
          .when(col("event_id") % 5 === 0, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("slot",
        sum(col("extra") + lit(1L)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("ws", lit(GridBaseMicros) + col("slot") * lit(StepMicros))
      .select("ticker", "event_id", "ws", "open", "high", "low", "close", "volume")
  }

  /** DuckDB CTE chain equivalent of [[minuteBars]]; exposes `minute_bars`. */
  val sqlMinuteBars: String =
    s"""bars AS ($sqlBars),
       |slotted AS (
       |  SELECT *,
       |    CASE WHEN event_id % 29 = 0 THEN 5 WHEN event_id % 11 = 0 THEN 2
       |         WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS extra
       |  FROM bars),
       |minute_bars AS (
       |  SELECT ticker, event_id,
       |    $GridBaseMicros + CAST(sum(extra + 1) OVER (PARTITION BY ticker ORDER BY t, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * $StepMicros AS ws,
       |    open, high, low, close, volume
       |  FROM slotted)""".stripMargin
}
