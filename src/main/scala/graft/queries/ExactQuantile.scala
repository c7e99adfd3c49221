package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group EXACT interpolated quantiles — the one copy of the
  * bit-equality-critical arithmetic both `agg_quantiles` and
  * `anomaly_mad` gate on: Spark `Percentile.getPercentile` reproduced
  * exactly (pos = (n-1)·p; v_lo·(1-frac) + v_hi·frac), which is
  * bit-equal to DuckDB's `quantile_cont`.
  *
  * Shape: one sort window per group plus a codegen'd hash aggregate
  * that reuses the window's partitioning — no second exchange. Group
  * keys are expected low-cardinality; at true scale the per-group sort
  * is the cost (swap in a sketch quantile when exact boundaries stop
  * mattering).
  */
object ExactQuantile {

  /** One row per `key`: the raw (unrounded — callers round) quantiles
    * of `value` at each requested (p, output-column) pair. */
  def grouped(df: DataFrame, key: String, value: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(value)
    val wp = Window.partitionBy(key)
    val v = col(value)
    val ranked = df.select(col(key), v)
      .withColumn("_rn0", row_number().over(w).cast("long") - 1L)
      .withColumn("_n", count(lit(1)).over(wp))
    def quant(p: Double): Column = {
      val pos = (col("_n") - 1L).cast("double") * lit(p)
      val lo = floor(pos).cast("long")
      val vl = max(when(col("_rn0") === lo, v))
      val vh = max(when(col("_rn0") === lo + 1L, v))
      val frac = pos - floor(pos)
      when(first(frac) === 0.0, vl)
        .otherwise(vl * (lit(1.0) - first(frac)) + vh * first(frac))
    }
    val aggs = ps.map { case (p, out) => quant(p).as(out) }
    ranked.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }
}
