package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ind.FrameIndicators

/** Frame-based indicator queries (SURVEY.md §2 group W-F) over the
  * `events` stand-in series, each paired with a formula-identical DuckDB
  * oracle. Outputs are rounded to 6 decimals on BOTH engines so
  * window-aggregation summation order (Spark per-frame fold vs DuckDB
  * segment tree) cannot flip the last ulp.
  */
object IndicatorQueries {

  private val Part = Seq("ticker")
  private val Order = Seq("t", "event_id")

  /** events → bars → all W-F indicator columns. */
  private def fi(s: SparkSession, dir: String): DataFrame =
    FrameIndicators.addAll(EventBars.bars(s, dir), Part, Order)

  private def sql(select: String): String =
    s"""WITH bars AS (${EventBars.sqlBars}),
       |${FrameIndicators.sqlStages("bars", "ticker", "t, event_id")}
       |SELECT $select FROM fi_final""".stripMargin

  private def r6(c: String) = round(col(c), 6).as(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ind_rocp" -> ((s, dir) =>
      fi(s, dir).select(col("ticker") +: col("t") +:
        (1 to 5).map(k => r6(s"rocp_$k")): _*)),
    "ind_mom" -> ((s, dir) =>
      fi(s, dir).select(col("ticker"), col("t"), r6("mom"))),
    "ind_mfi" -> ((s, dir) =>
      fi(s, dir).select(col("ticker"), col("t"), r6("mfi"))),
    "ind_ultosc" -> ((s, dir) =>
      fi(s, dir).select(col("ticker"), col("t"), r6("ultosc"))),
    "ind_aroonosc" -> ((s, dir) =>
      fi(s, dir).select(col("ticker"), col("t"), r6("aroonosc"))),
    "ind_ppo" -> ((s, dir) =>
      fi(s, dir).select(col("ticker"), col("t"), r6("ppo"))),
    "ind_stochf" -> ((s, dir) =>
      fi(s, dir).select(col("ticker"), col("t"), r6("sok"), r6("sok_hist"))))

  val oracles: Map[String, String] = Map(
    "ind_rocp" -> sql("ticker, t, " +
      (1 to 5).map(k => s"round(rocp_$k, 6) AS rocp_$k").mkString(", ")),
    "ind_mom" -> sql("ticker, t, round(mom, 6) AS mom"),
    "ind_mfi" -> sql("ticker, t, round(mfi, 6) AS mfi"),
    "ind_ultosc" -> sql("ticker, t, round(ultosc, 6) AS ultosc"),
    "ind_aroonosc" -> sql("ticker, t, round(aroonosc, 6) AS aroonosc"),
    "ind_ppo" -> sql("ticker, t, round(ppo, 6) AS ppo"),
    "ind_stochf" -> sql(
      "ticker, t, round(sok, 6) AS sok, round(sok_hist, 6) AS sok_hist"))
}
