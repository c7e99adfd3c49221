package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group EXACT interpolated quantiles — the one copy of the
  * bit-equality-critical arithmetic `agg_quantiles`, `feat_winsorize`,
  * `anomaly_mad` and `behav_interevent` gate on: Spark
  * `Percentile.getPercentile` reproduced exactly (pos = (n-1)·p;
  * v_lo·(1-frac) + v_hi·frac), which is bit-equal to DuckDB's
  * `quantile_cont`.
  *
  * Shape — the grouped form of [[DistRank]]'s range-bucketed exact
  * rank, so NO task ever sorts a whole group (the callers' group keys
  * are low-cardinality; a `Window.partitionBy(group)` would funnel
  * n/|groups| rows through single tasks — a straight spill-then-die at
  * 100 TB):
  *
  *  1. one `approxQuantile` pass fixes ~P value-range bounds of the
  *     VALUE column as driver literals → bucket assignment is a pure
  *     deterministic per-row projection, identical across the jobs
  *     that re-evaluate the lineage;
  *  2. one bounded job collects the per-(group, bucket) row counts —
  *     ≤ |groups|·P cells ever reach the driver (guarded) — from which
  *     per-group totals and per-cell prefix-sum rank offsets come
  *     back as a broadcast hash join;
  *  3. the final plan is ONE hash exchange on (group, bucket), a
  *     partitioned local window whose largest task is ~n/P rows (cells
  *     nest inside the GLOBAL value buckets, so even a group holding
  *     90% of all rows splits across ~0.9·P cells), and a codegen'd
  *     hash aggregate picking the bracketing values per quantile.
  *
  * Results are bit-identical to the single `Window.partitionBy(group)
  * .orderBy(value)` rank: offsets come from actual counts, so bound
  * quality shifts balance only, never correctness. Ties share a bucket
  * (assignment is `#bounds strictly below value`), and equal values
  * are interchangeable at any rank, so row_number's tie order is
  * immaterial. NULL values bucket to 0 explicitly, matching the
  * ascending sort's nulls-first — rank arithmetic stays aligned with
  * the old whole-group window even on null-bearing columns
  * (`feat_winsorize`). NULL group keys get a sentinel string for the
  * driver-side maps and group normally.
  *
  * The slim (group, value) projection is localCheckpoint'd so the
  * three passes share one upstream evaluation — at scale that is a
  * 2-column ~16 B/row spill, the standard trade for an exact quantile
  * that must read every value anyway.
  */
object ExactQuantile {

  /** Driver-side guard: per-(group, bucket) cells collected. The
    * utility is for LOW-cardinality group keys (high-cardinality keys
    * parallelize fine under a plain per-group window and don't need
    * range bucketing). */
  private val MaxCells = 1 << 20

  /** Sentinel for a NULL group key in the driver-side offset maps
    * (collides only with a real group literally equal to it). */
  private val NullKey = 0.toChar + "<null>"

  /** The per-group-window form for HIGH-cardinality group keys (e.g.
    * `ticker`): each group is small and there are many of them, so a
    * plain `Window.partitionBy(key)` already parallelizes — and skips
    * [[grouped]]'s extra bound/offset jobs and its |groups|·P
    * driver-side cell collect (which is exactly what does NOT scale
    * when groups number in the millions). Same interpolation
    * arithmetic, same results. */
  def groupedLocal(df: DataFrame, key: String, value: String,
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

  /** One row per `key`: the raw (unrounded — callers round) quantiles
    * of `value` at each requested (p, output-column) pair.
    *
    * This is the LOW-cardinality-key form (range-bucketed cells); for
    * high-cardinality keys use [[groupedLocal]].
    *
    * `checkpoint` — the three passes (bounds, cell counts, final rank)
    * re-evaluate the input lineage; leave true when it contains real
    * work (joins, windows), set false when it's a bare scan projection
    * (re-scanning two pruned parquet columns is cheaper than
    * materializing them). */
  def grouped(df: DataFrame, key: String, value: String,
      ps: Seq[(Double, String)], checkpoint: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val v = col(value)
    val slim0 = df.select(col(key), v)
      .withColumn("_eq_v", v.cast("double"))
    val slim = if (checkpoint) slim0.localCheckpoint() else slim0

    // Value-range bucket bounds as driver literals (balance only —
    // rank offsets below come from actual counts).
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val rawBounds =
      if (probs.isEmpty) Array.empty[Double]
      else slim.stat.approxQuantile("_eq_v", probs, 0.001)
    val bounds = rawBounds.distinct.sorted

    // Deterministic per-row bucket: #bounds strictly below the value;
    // NULLs to bucket 0 (ascending nulls-first). Codegen'd literal
    // array scan.
    val bucket =
      if (bounds.isEmpty) lit(0)
      else when(col("_eq_v").isNull, lit(0)).otherwise(
        size(filter(array(bounds.map(lit(_)): _*), b => b < col("_eq_v"))))
    val bucketed = slim.withColumn("_eq_b", bucket)
    val gstr = coalesce(col(key).cast("string"), lit(NullKey))

    // Per-(group, bucket) counts → driver (bounded), → per-group n and
    // per-cell prefix-sum rank offsets, shipped back as a BROADCAST
    // hash join (a codegen'd O(1) lookup per row — a string-keyed map
    // literal would linear-scan its entries for every row).
    val cells = bucketed
      .groupBy(gstr.as("_g"), col("_eq_b").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .limit(MaxCells + 1)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    require(cells.length <= MaxCells,
      s"ExactQuantile.grouped: > $MaxCells (group, bucket) cells — " +
        "the group key is not low-cardinality; use a per-group window")
    val byGroup = cells.groupBy(_._1)
    val offRows = byGroup.iterator.flatMap { case (g, rs) =>
      val gn = rs.map(_._3).sum
      var acc = 0L
      rs.sortBy(_._2).map { case (_, b, c) =>
        val o = acc; acc += c; (g, b, o, gn)
      }.toSeq
    }.toSeq
    import spark.implicits._
    val offDf = offRows.toDF("_g", "_b", "_off", "_gn")

    // Global-within-group rank = local rank in the (group, bucket)
    // window + the cell's broadcast offset.
    val w = Window.partitionBy(col(key), col("_eq_b")).orderBy(value)
    val ranked = bucketed
      .join(broadcast(offDf),
        gstr === col("_g") && col("_eq_b") === col("_b"))
      .withColumn("_rn0",
        row_number().over(w).cast("long") - 1L + col("_off"))
      .withColumn("_n", col("_gn"))
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
