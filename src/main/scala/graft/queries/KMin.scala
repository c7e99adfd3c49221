package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-th-smallest-per-group — the bounded replacement for
  * `row_number() OVER (PARTITION BY group ORDER BY v) ... WHERE rn = k`
  * when the group key is low-cardinality: that window sorts EVERY row
  * of a group in one task just to read row k.
  *
  * Two-phase shape:
  *  1. per (group, input-partition) keep the k smallest rows — a window
  *    over (group, partition-id), so the largest sort is one
  *    partition's slice of one group;
  *  2. the survivors (≤ k·P rows per group, a few KB) feed a tiny
  *    per-group window that reads rank k.
  *
  * The union of per-partition k-minima provably contains the global
  * k smallest values of each group (any dropped row has ≥ k kept rows
  * with values ≤ it in its own partition), so phase 2 returns exactly
  * the value a whole-group sort would. `spark_partition_id()` is
  * evaluation-dependent, but every assignment yields a superset of the
  * true k-minima, so the result is deterministic.
  */
object KMin {

  /** The k smallest rows of each group (all input columns), with the
    * 1-based within-group rank as `rankCol` (IntegerType). The order
    * defined by `value` must be duplicate-free within a group (the
    * sketch-hash contract) so the rank — and therefore the selected
    * set — is deterministic; callers whose primary order value can
    * collide pass trailing tie-break columns via [[smallestBy]]. */
  def smallest(df: DataFrame, groupCols: Seq[String], value: String,
      k: Int, rankCol: String): DataFrame =
    smallestBy(df, groupCols, Seq(value), k, rankCol)

  /** [[smallest]] under a composite (totally-ordering) sort key:
    * ascending on each of `orderCols` in sequence. The tuple must be
    * duplicate-free within a group (trivially true when any one column
    * is row-unique, e.g. a trailing id). */
  def smallestBy(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], k: Int, rankCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val os = orderCols.map(col)
    val wLocal = Window.partitionBy(gs :+ col("_km_p"): _*).orderBy(os: _*)
    val cand = df
      .withColumn("_km_p", spark_partition_id())
      .withColumn("_km_rn", row_number().over(wLocal))
      .filter(col("_km_rn") <= k)
      .drop("_km_p", "_km_rn")
    val wG = Window.partitionBy(gs: _*).orderBy(os: _*)
    cand.withColumn(rankCol, row_number().over(wG))
      .filter(col(rankCol) <= k)
  }

  /** One row per group having ≥ k rows: group cols + the k-th smallest
    * `value` as `out`. Groups with fewer than k rows emit nothing
    * (callers left-join and fall back, matching `rn = k` semantics). */
  def kth(df: DataFrame, groupCols: Seq[String], value: String, k: Int,
      out: String): DataFrame =
    smallest(df, groupCols, value, k, "_km_gr")
      .filter(col("_km_gr") === k)
      .select(groupCols.map(col) :+ col(value).as(out): _*)
}
