package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions

/** Candlestick pattern flags, TA-Lib price transforms, and Holt
  * linear-trend smoothing — the bar-shape layer of the indicator
  * surface (TA-Lib's CDL* / *PRICE / TRANGE families; the reference's
  * indicators.py stops at oscillators, these complete the classic set).
  *
  * Scale notes: everything here is ONE `hash(ticker)` exchange — the
  * candle geometry is per-row arithmetic over lag(close), the pattern
  * flags are pure comparisons, and Holt runs as an incremental
  * AggregateWindowFunction state machine inside the Window operator.
  *
  * Float parity: pattern flags are integer outputs of double
  * comparisons whose operand expressions are textually mirrored in the
  * oracle — both engines compute identical IEEE doubles, so comparisons
  * can't disagree. Threshold fractions are re-arranged into
  * multiplication-only forms (e.g. body ≤ 0.1·range ⟺ 10·body ≤ range)
  * so no division enters a comparison. Price transforms and Holt output
  * r6-rounded doubles from identically-spelled expressions.
  */
object CandleQueries {

  private def w = Window.partitionBy("ticker").orderBy("t", "event_id")
  private val Over = "PARTITION BY ticker ORDER BY t, event_id"

  private val r6 = Rounding.r6 _

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Candlestick pattern flags. Bars synthesize open := lag(close)
    // (the events table carries one value series) and the stock bar
    // high/low are symmetric around the body — a geometry in which
    // long-lower-shadow shapes (hammer) can never occur. The candle
    // query therefore derives its own asymmetric shadows from exact
    // integer jitter (coprime event_id residues, mod 13 and mod 11), identically on
    // both engines, so every pattern class actually fires.
    "ind_candles" -> ((s, dir) => {
      val b = EventBars.bars(s, dir)
        .withColumn("o", lag(col("close"), 1).over(w))
        .filter(col("o").isNotNull)
        .withColumn("hi", greatest(col("o"), col("close"))
          + (col("event_id") % 13).cast("double") * lit(10.0))
        .withColumn("lo", least(col("o"), col("close"))
          - ((col("event_id") + 5L) % 11).cast("double") * lit(12.0))
      val body = abs(col("close") - col("o"))
      val rng = col("hi") - col("lo")
      val upsh = col("hi") - greatest(col("o"), col("close"))
      val dnsh = least(col("o"), col("close")) - col("lo")
      val up = col("close") > col("o")
      val down = col("close") < col("o")
      val po = lag(col("o"), 1).over(w)
      val pc = lag(col("close"), 1).over(w)
      val flag = (c: org.apache.spark.sql.Column) =>
        when(c, 1L).otherwise(0L)
      b.select(col("ticker"), col("t"), col("event_id"),
          flag(body * lit(10.0) <= rng).as("doji"),
          flag(dnsh >= body * lit(2.0) && upsh * lit(4.0) <= body
            && body * lit(10.0) > rng).as("hammer"),
          flag(upsh >= body * lit(2.0) && dnsh * lit(4.0) <= body
            && body * lit(10.0) > rng).as("shooting_star"),
          flag(body * lit(20.0) >= rng * lit(19.0) && body > lit(0.0))
            .as("marubozu"),
          flag(up && po.isNotNull && po > pc
            && col("close") >= po && col("o") <= pc).as("bull_engulf"),
          flag(down && po.isNotNull && pc > po
            && col("o") >= pc && col("close") <= po).as("bear_engulf"),
          flag(up
            && lag(col("close"), 1).over(w) > lag(col("o"), 1).over(w)
            && lag(col("close"), 2).over(w) > lag(col("o"), 2).over(w)
            && col("close") > lag(col("close"), 1).over(w)
            && lag(col("close"), 1).over(w) > lag(col("close"), 2).over(w))
            .as("three_white"),
          flag(down
            && lag(col("close"), 1).over(w) < lag(col("o"), 1).over(w)
            && lag(col("close"), 2).over(w) < lag(col("o"), 2).over(w)
            && col("close") < lag(col("close"), 1).over(w)
            && lag(col("close"), 1).over(w) < lag(col("close"), 2).over(w))
            .as("three_black"))
    }),

    // Second candle batch — the body-relationship patterns the
    // synthesized geometry CAN express (open := lag(close) means every
    // bar opens at the prior close, so gap patterns — piercing, dark
    // cloud — AND strict outside bars, whose shared endpoint can't be
    // exceeded on both sides, are structurally impossible and are
    // deliberately absent). All flags are division-free double
    // comparisons over lagged bodies, mirrored textually in the
    // oracle; one ticker exchange.
    "ind_candles2" -> ((s, dir) => {
      val b = EventBars.bars(s, dir)
        .withColumn("o", lag(col("close"), 1).over(w))
        .filter(col("o").isNotNull)
      val body = abs(col("close") - col("o"))
      val top = greatest(col("o"), col("close"))
      val bot = least(col("o"), col("close"))
      val po = lag(col("o"), 1).over(w)
      val pc = lag(col("close"), 1).over(w)
      val pTop = greatest(po, pc)
      val pBot = least(po, pc)
      val o2 = lag(col("o"), 2).over(w)
      val c2 = lag(col("close"), 2).over(w)
      val b1 = abs(pc - po)
      val b2 = abs(c2 - o2)
      val up = col("close") > col("o")
      val down = col("close") < col("o")
      val inside = top <= pTop && bot >= pBot && body > lit(0.0)
      val flag = (c: org.apache.spark.sql.Column) =>
        when(c, 1L).otherwise(0L)
      b.select(col("ticker"), col("t"), col("event_id"),
        flag(po.isNotNull && inside).as("inside_bar"),
        flag(po.isNotNull && inside && pc < po && up).as("bull_harami"),
        flag(po.isNotNull && inside && pc > po && down).as("bear_harami"),
        flag(o2.isNotNull && c2 < o2 && b1 * lit(3.0) <= b2 && up
          && col("close") * lit(2.0) > o2 + c2).as("morning_star"),
        flag(o2.isNotNull && c2 > o2 && b1 * lit(3.0) <= b2 && down
          && col("close") * lit(2.0) < o2 + c2).as("evening_star"))
    }),

    // TA-Lib price transforms: TRANGE, AVGPRICE, MEDPRICE, TYPPRICE,
    // WCLPRICE — per-row arithmetic on the same candle geometry.
    "ind_pricex" -> ((s, dir) => {
      val b = EventBars.bars(s, dir)
        .withColumn("o", lag(col("close"), 1).over(w))
        .withColumn("pc", lag(col("close"), 1).over(w))
      b.select(col("ticker"), col("t"), col("event_id"),
        r6(when(col("pc").isNull, col("high") - col("low"))
          .otherwise(greatest(col("high") - col("low"),
            abs(col("high") - col("pc")), abs(col("low") - col("pc")))))
          .as("trange"),
        r6(when(col("o").isNotNull,
          (col("o") + col("high") + col("low") + col("close")) / lit(4.0)))
          .as("avgprice"),
        r6((col("high") + col("low")) / lit(2.0)).as("medprice"),
        r6((col("high") + col("low") + col("close")) / lit(3.0))
          .as("typprice"),
        r6((col("high") + col("low") + col("close") + col("close"))
          / lit(4.0)).as("wclprice"))
    }),

    // Holt linear-trend smoothing (α=0.2, β=0.1) via the incremental
    // window kernel; forecast = level + trend (one step ahead).
    "ts_holt" -> ((s, dir) => {
      GraftFunctions.register(s)
      EventBars.bars(s, dir)
        .withColumn("hb", expr("graft_holt_w(close)").over(w))
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("hb.level")).as("level"),
          r6(col("hb.trend")).as("trend"),
          r6(col("hb.level") + col("hb.trend")).as("forecast"))
    }))

  private def bars = EventBars.sqlBars

  val oracles: Map[String, String] = Map(

    "ind_candles" ->
      s"""WITH bars AS ($bars),
         |b0 AS (
         |  SELECT ticker, t, event_id, close,
         |    lag(close, 1) OVER ($Over) AS o
         |  FROM bars),
         |b AS (
         |  SELECT *,
         |    greatest(o, close)
         |      + CAST(event_id % 13 AS DOUBLE) * 10.0 AS hi,
         |    least(o, close)
         |      - CAST((event_id + 5) % 11 AS DOUBLE) * 12.0 AS lo
         |  FROM b0 WHERE o IS NOT NULL),
         |g AS (
         |  SELECT *, abs(close - o) AS body, hi - lo AS rng,
         |    hi - greatest(o, close) AS upsh,
         |    least(o, close) - lo AS dnsh,
         |    lag(o, 1) OVER ($Over) AS po,
         |    lag(close, 1) OVER ($Over) AS pc,
         |    lag(close, 1) OVER ($Over) AS c1,
         |    lag(close, 2) OVER ($Over) AS c2,
         |    lag(o, 1) OVER ($Over) AS o1,
         |    lag(o, 2) OVER ($Over) AS o2
         |  FROM b WHERE o IS NOT NULL)
         |SELECT ticker, t, event_id,
         |  CASE WHEN body * 10.0 <= rng THEN 1 ELSE 0 END AS doji,
         |  CASE WHEN dnsh >= body * 2.0 AND upsh * 4.0 <= body
         |    AND body * 10.0 > rng THEN 1 ELSE 0 END AS hammer,
         |  CASE WHEN upsh >= body * 2.0 AND dnsh * 4.0 <= body
         |    AND body * 10.0 > rng THEN 1 ELSE 0 END AS shooting_star,
         |  CASE WHEN body * 20.0 >= rng * 19.0 AND body > 0.0
         |    THEN 1 ELSE 0 END AS marubozu,
         |  CASE WHEN close > o AND po IS NOT NULL AND po > pc
         |    AND close >= po AND o <= pc THEN 1 ELSE 0 END AS bull_engulf,
         |  CASE WHEN close < o AND po IS NOT NULL AND pc > po
         |    AND o >= pc AND close <= po THEN 1 ELSE 0 END AS bear_engulf,
         |  CASE WHEN close > o AND c1 > o1 AND c2 > o2
         |    AND close > c1 AND c1 > c2 THEN 1 ELSE 0 END AS three_white,
         |  CASE WHEN close < o AND c1 < o1 AND c2 < o2
         |    AND close < c1 AND c1 < c2 THEN 1 ELSE 0 END AS three_black
         |FROM g""".stripMargin,

    "ind_candles2" ->
      s"""WITH bars AS ($bars),
         |b0 AS (
         |  SELECT ticker, t, event_id, close,
         |    lag(close, 1) OVER ($Over) AS o
         |  FROM bars),
         |g AS (
         |  SELECT *, abs(close - o) AS body,
         |    greatest(o, close) AS top, least(o, close) AS bot,
         |    lag(o, 1) OVER ($Over) AS po,
         |    lag(close, 1) OVER ($Over) AS pc,
         |    lag(o, 2) OVER ($Over) AS o2,
         |    lag(close, 2) OVER ($Over) AS c2
         |  FROM b0 WHERE o IS NOT NULL),
         |h AS (
         |  SELECT *, greatest(po, pc) AS ptop, least(po, pc) AS pbot,
         |    abs(pc - po) AS b1, abs(c2 - o2) AS b2,
         |    (top <= greatest(po, pc) AND bot >= least(po, pc)
         |      AND body > 0.0) AS ins
         |  FROM g)
         |SELECT ticker, t, event_id,
         |  CASE WHEN po IS NOT NULL AND ins THEN 1 ELSE 0 END AS inside_bar,
         |  CASE WHEN po IS NOT NULL AND ins AND pc < po AND close > o
         |    THEN 1 ELSE 0 END AS bull_harami,
         |  CASE WHEN po IS NOT NULL AND ins AND pc > po AND close < o
         |    THEN 1 ELSE 0 END AS bear_harami,
         |  CASE WHEN o2 IS NOT NULL AND c2 < o2 AND b1 * 3.0 <= b2
         |    AND close > o AND close * 2.0 > o2 + c2
         |    THEN 1 ELSE 0 END AS morning_star,
         |  CASE WHEN o2 IS NOT NULL AND c2 > o2 AND b1 * 3.0 <= b2
         |    AND close < o AND close * 2.0 < o2 + c2
         |    THEN 1 ELSE 0 END AS evening_star
         |FROM h""".stripMargin,

    "ind_pricex" ->
      s"""WITH bars AS ($bars),
         |b AS (
         |  SELECT ticker, t, event_id, high, low, close,
         |    lag(close, 1) OVER ($Over) AS o,
         |    lag(close, 1) OVER ($Over) AS pc
         |  FROM bars)
         |SELECT ticker, t, event_id,
         |  (round((CASE WHEN pc IS NULL THEN high - low
         |    ELSE greatest(high - low, abs(high - pc), abs(low - pc))
         |    END) * 1000000.0) / 1000000.0 + 0.0) AS trange,
         |  (round((CASE WHEN o IS NOT NULL
         |    THEN (o + high + low + close) / 4.0 END) * 1000000.0)
         |    / 1000000.0 + 0.0) AS avgprice,
         |  (round(((high + low) / 2.0) * 1000000.0) / 1000000.0 + 0.0)
         |    AS medprice,
         |  (round(((high + low + close) / 3.0) * 1000000.0)
         |    / 1000000.0 + 0.0) AS typprice,
         |  (round(((high + low + close + close) / 4.0) * 1000000.0)
         |    / 1000000.0 + 0.0) AS wclprice
         |FROM b""".stripMargin,

    "ts_holt" ->
      s"""WITH RECURSIVE bars AS ($bars),
         |kb AS (
         |  SELECT ticker, t, event_id, close,
         |    row_number() OVER ($Over) AS rn
         |  FROM bars),
         |h AS (
         |  SELECT ticker, t, event_id, close, rn,
         |    close AS l, CAST(0.0 AS DOUBLE) AS b
         |  FROM kb WHERE rn = 1
         |  UNION ALL
         |  SELECT n.ticker, n.t, n.event_id, n.close, n.rn,
         |    0.2 * n.close + 0.8 * (p.l + p.b),
         |    0.1 * ((0.2 * n.close + 0.8 * (p.l + p.b)) - p.l) + 0.9 * p.b
         |  FROM h p JOIN kb n
         |    ON n.ticker = p.ticker AND n.rn = p.rn + 1)
         |SELECT ticker, t, event_id,
         |  (round(l * 1000000.0) / 1000000.0 + 0.0) AS level,
         |  (round(b * 1000000.0) / 1000000.0 + 0.0) AS trend,
         |  (round((l + b) * 1000000.0) / 1000000.0 + 0.0) AS forecast
         |FROM h""".stripMargin)
}
