package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking — the shared replacement for every
  * single-partition `Window.orderBy(...)` (`row_number`, `ntile`,
  * running-total ECDFs) in the suite.
  *
  * Shape: one pass computes approximate range-bucket bounds of the
  * leading sort key (driver literals — so bucket assignment is a pure
  * deterministic per-row projection, consistent across the jobs that
  * re-evaluate the lineage); a second tiny job collects the per-bucket
  * row counts (≤ `spark.sql.shuffle.partitions` rows on the driver,
  * the same bounded driver-solve posture as the graph components); the
  * final plan is one hash exchange on the bucket id, a PARTITIONED
  * local window, and literal prefix-sum offsets. Results are
  * bit-identical to `row_number()`/`ntile(k)`/running `sum()` over an
  * unpartitioned window, but no stage ever sees more than ~1/P of the
  * rows — the shape survives a 1000-executor 100 TB run, where the
  * single-partition window is a straight OOM.
  *
  * Caveats: bucket bounds come from `approxQuantile` on the FIRST sort
  * key, so heavy duplicate leading keys degrade balance (never
  * correctness — offsets are computed from the actual bucket counts;
  * the ScaleProbe skew section measures a 90%-duplicate key). The
  * leading key must be numeric and NON-NULL — enforced by the offsets
  * job (a null key would silently land in bucket 0, which matches
  * Spark's ascending nulls-FIRST by coincidence but inverts a
  * descending order's nulls-LAST; rather than carry that trap, a null
  * bucket key fails fast). For a descending order pass
  * `bucketKey = negate(key)` so bucket order aligns with the sort
  * order — and pre-filter or coalesce nulls to a sentinel consistent
  * with the sort's null placement.
  */
object DistRank {

  /** `df` + rank column, plus the collected totals: `n` = row count,
    * `sums(c)` = exact global sum of each requested long column (free
    * by-products of the offsets job, handy as driver literals). */
  final case class Ranked(df: DataFrame, n: Long, sums: Map[String, Long])

  /** Global 1-based `row_number()` over the total order `sort`,
    * as a LongType `rankCol`. For each name in `runSumCols` (LongType
    * columns) also adds `"run_" + name`: the exact running sum over
    * the same order, inclusive of the current row. `totalCols` get
    * their exact global sum into `sums` without the running column
    * (a free by-product of the offsets job).
    */
  def rowNumber(
      df: DataFrame,
      rankCol: String,
      bucketKey: Column,
      sort: Seq[Column],
      runSumCols: Seq[String] = Nil,
      totalCols: Seq[String] = Nil): Ranked = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sumCols = (runSumCols ++ totalCols).distinct

    val keyed = df.withColumn("_dr_k", bucketKey.cast("double"))

    // Bucket bounds as driver literals: approximate (p/parts)-quantiles
    // of the leading key. Approximation skews balance only; the rank
    // arithmetic below is exact for ANY bounds.
    // Bounds shift bucket BALANCE only, never rank correctness
    // (offsets come from the actual counts), so the error budget is a
    // free knob; measured at 6M rows the summaries pass costs the same
    // at 0.001 as at 0.02, so keep the tighter balance.
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val rawBounds =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("_dr_k", probs, 0.001)
    val bounds = rawBounds.distinct.sorted

    // Deterministic per-row bucket id: #bounds strictly below the key.
    // Codegen'd array scan over ≤ parts literals.
    val bucket =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*), b => b < col("_dr_k")))
    val bucketed = keyed.withColumn("_dr_b", bucket)

    // Per-bucket counts (and optional sums) → prefix-sum offsets.
    // ≤ parts rows ever reach the driver. The null-key count rides the
    // same job for free and enforces the non-null precondition.
    val aggs = count(lit(1L)).as("_c") +:
      count(when(col("_dr_k").isNull, lit(1))).as("_nulls") +:
      sumCols.map(c => sum(col(c)).as("_s_" + c))
    val rows = bucketed.groupBy("_dr_b").agg(aggs.head, aggs.tail: _*)
      .collect()
    val nullKeys = rows.map(_.getLong(2)).sum
    require(nullKeys == 0L,
      s"DistRank: $nullKeys rows have a NULL bucket key — ranks would " +
        "silently misplace them; filter or coalesce to a sentinel " +
        "consistent with the sort's null ordering first")
    val per = rows
      .map { r =>
        val b = r.getInt(0)
        val c = r.getLong(1)
        val ss = sumCols.zipWithIndex
          .map { case (name, i) => name -> r.getLong(3 + i) }.toMap
        (b, c, ss)
      }
      .sortBy(_._1)

    val n = per.map(_._2).sum
    val totals = sumCols.map { c =>
      c -> per.map(_._3(c)).sum
    }.toMap

    // offset(b) = rows (and sums) in all buckets strictly before b.
    var accC = 0L
    val accS = scala.collection.mutable.Map(runSumCols.map(_ -> 0L): _*)
    val offC = scala.collection.mutable.Map.empty[Int, Long]
    val offS = scala.collection.mutable.Map.empty[(String, Int), Long]
    per.foreach { case (b, c, ss) =>
      offC(b) = accC; accC += c
      runSumCols.foreach { col0 =>
        offS((col0, b)) = accS(col0); accS(col0) += ss(col0)
      }
    }

    def mapLit(m: Map[Int, Long]): Column =
      element_at(typedLit(if (m.isEmpty) Map(0 -> 0L) else m), col("_dr_b"))

    val w = Window.partitionBy("_dr_b").orderBy(sort: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked0 = bucketed.withColumn(rankCol,
      row_number().over(w).cast("long") + mapLit(offC.toMap))
    val ranked = runSumCols.foldLeft(ranked0) { (d, c) =>
      d.withColumn("run_" + c,
        sum(col(c)).over(wRun) +
          mapLit(offS.collect { case ((`c`, b), v) => b -> v }.toMap))
    }
    Ranked(ranked.drop("_dr_k", "_dr_b"), n, totals)
  }

  /** `ntile(k)` bucket (IntegerType, 1-based) from a global 1-based
    * rank and the driver-known row count — the closed form of the SQL
    * standard (first `n % k` buckets take the extra row), bit-equal to
    * `NTile` over the same total order. */
  def ntileOf(rank: Column, n: Long, k: Int): Column = {
    val bs = n / k
    val rem = n % k
    val cut = (bs + 1L) * rem
    // Quotients are ≤ k, so double division + floor is exact for any
    // realistic n (the fraction's deficit from an integer is ≥ 1/bs,
    // orders of magnitude above the ulp at q ≤ k).
    val lo = floor((rank - 1L) / lit((bs + 1L).toDouble)).cast("long")
    val hi = floor((rank - lit(cut) - 1L) / lit(math.max(bs, 1L).toDouble))
      .cast("long") + lit(rem) // bs == 0 branch unreached (cut == n)
    (when(rank <= lit(cut), lo).otherwise(hi) + lit(1L)).cast("int")
  }
}
