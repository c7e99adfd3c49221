package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P10 — the reference's validation predicates, implemented as REAL
  * checks (the reference constructs both ValueErrors but never raises
  * them — `raise` is missing at indicators.py:219-222 and :256-261, so
  * it accepts everything).
  *
  * Default mode is therefore log-only ([[report]]) to bit-match the
  * reference's observable behavior; [[enforce]] is the fixed variant.
  * Both are distributed counts — no driver-side row materialization.
  */
object Validate {

  /** Rows whose epoch-ns timestamp is not 19 digits
    * (check_19_digit_timestamp, indicators.py:9-22). */
  def badTimestampDigits(df: DataFrame, tsCol: String): DataFrame =
    df.filter(length(col(tsCol).cast("string")) =!= 19)

  /** (ticker, island) series whose consecutive diffs are not exactly one
    * grid step (check_increments_of_60, indicators.py:25-38) — evaluated
    * per key with one lag window, post-densify this must be empty. */
  def badIncrements(df: DataFrame, keyCols: Seq[String], tsCol: String,
      stepUnits: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(tsCol)
    df.withColumn("_d", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("_d").isNotNull && col("_d") =!= stepUnits)
      .drop("_d")
  }

  /** Reference-faithful: evaluate, log, never fail. */
  def report(df: DataFrame, tsCol: String): Long =
    badTimestampDigits(df, tsCol).count()

  /** Fixed variant: what the reference author intended. */
  def enforce(df: DataFrame, tsCol: String): Unit = {
    val n = report(df, tsCol)
    require(n == 0, s"$n rows with non-19-digit $tsCol")
  }
}
