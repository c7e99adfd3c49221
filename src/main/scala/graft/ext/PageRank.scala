package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected graph — the importance
  * score a corpus pipeline runs over its similarity/citation graph to
  * pick canonical representatives or weight sampling.
  *
  * A FIXED iteration count (not convergence detection) keeps the result
  * deterministic and oracle-comparable: every engine that runs k rounds
  * of r' = (1-d)/N + d·Σ_in r/deg computes the same doubles. Dangling
  * mass is NOT redistributed (nodes with no edges hold (1-d)/N) — the
  * simplest published variant, stated here so the oracle matches.
  *
  * Scale: the symmetrized, degree-annotated edge list materializes
  * ONCE (`localCheckpoint` — the edge source is typically the tail of
  * an expensive LSH pipeline); each round is one equi-join (edges ⋈
  * ranks on the source id) plus one groupBy-sum, both hash-partitioned
  * on the node id so the exchanges align round to round, exactly like
  * [[ConnectedComponents]]. Ranks checkpoint per round to keep the
  * plan from doubling. Only nodes WITH edges iterate; the (at 100 TB,
  * overwhelming) singleton majority joins back once at the end with
  * the constant dangling rank.
  */
object PageRank {

  /** @param nodes one column `id` (LONG), one row per vertex
    * @param edges columns `src`, `dst` (LONG); undirected — pass each
    *              edge once in either orientation, symmetrized here
    * @param iters fixed number of power-iteration rounds
    * @param d     damping factor
    * @return one row per vertex: `id`, `rank` (unrounded double)
    */
  def apply(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
      d: Double = 0.85,
      driverMaxEdges: Long = ConnectedComponents.DriverSolveMaxEdges): DataFrame = {
    val n = nodes.count().toDouble
    val base = (1.0 - d) / n
    // Materialize the raw edge list BEFORE symmetrizing: the union and
    // the degree self-join each re-evaluate their input, so an
    // un-checkpointed edge lineage (typically the whole LSH candidate
    // pipeline) would run 4x.
    val once = edges.select(col("src"), col("dst")).localCheckpoint()
    // Adaptive execution, same posture as [[ConnectedComponents]]: a
    // tiny similarity graph pays a fixed driver planning fee per
    // round, so under the broadcast-sized edge threshold the power
    // iteration runs driver-side; big graphs take the distributed loop.
    if (once.count() <= driverMaxEdges)
      return driverSolve(nodes, once, iters, d, n, base)
    val sym = once
      .union(once.select(col("dst").as("src"), col("src").as("dst")))
    val symDeg = sym
      .join(sym.groupBy("src").agg(count(lit(1)).cast("double").as("deg")), "src")
      .localCheckpoint()
    val active = symDeg.select(col("src").as("id")).distinct().localCheckpoint()
    var rank = active.withColumn("r", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib = symDeg
        .join(rank, symDeg("src") === rank("id"))
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_r"))
      rank = active
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(d) * coalesce(col("in_r"), lit(0.0))).as("r"))
      // Checkpoint every third round, not every round: the lineage
      // between checkpoints is a shallow linear chain (join + groupBy
      // per round), and each checkpoint is an eager materialization
      // barrier — per-round barriers cost more than they save.
      if (i % 3 == 0 && i < iters) rank = rank.localCheckpoint()
    }
    nodes.select(col("id"))
      .join(rank.withColumnRenamed("r", "_er"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_er"), lit(base)).as("rank"))
  }

  /** Driver-side power iteration over a collected edge list — the same
    * update rule with a deterministic (src-sorted) contribution order.
    * Output rounding (the query layer's r6) absorbs the ulp-level
    * difference any summation-order choice carries, exactly as it does
    * between the distributed plan and the DuckDB oracle.
    */
  /** Personalized PageRank — the teleport lands on a SEED set instead
    * of uniformly: r' = (1−d)·s + d·Σ_in r/deg with s = 1/|S| on seeds
    * and 0 elsewhere, r₀ = s. TrustRank/seed-expansion for data
    * selection: score every document by its random-walk proximity to a
    * curated set. Same conventions as [[apply]] (fixed rounds, no
    * dangling redistribution — an isolated seed holds (1−d)/|S|, a
    * node unreachable from the seeds holds exactly 0), same scale
    * shape (edges once, exchange-aligned join + groupBy-sum per round,
    * only edge-endpoints ∪ seeds iterate), same adaptive driver
    * cutover.
    *
    * @param seeds one column `id` (LONG); an empty seed set returns an
    *              empty frame (empty-in → empty-out)
    */
  def personalized(nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, d: Double = 0.85,
      driverMaxEdges: Long = ConnectedComponents.DriverSolveMaxEdges)
      : DataFrame = {
    val nSeed = seeds.count()
    if (nSeed == 0L)
      return nodes.select(col("id"), lit(0.0).as("rank")).filter(lit(false))
    val sb = 1.0 / nSeed.toDouble
    val once = edges.select(col("src"), col("dst")).localCheckpoint()
    if (once.count() <= driverMaxEdges)
      return driverPpr(nodes, once, seeds, iters, d, sb)
    val sym = once
      .union(once.select(col("dst").as("src"), col("src").as("dst")))
    val symDeg = sym
      .join(sym.groupBy("src").agg(count(lit(1)).cast("double").as("deg")), "src")
      .localCheckpoint()
    val active = symDeg.select(col("src").as("id")).distinct()
      .join(seeds.select(col("id"), lit(sb).as("sb")), Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("sb"), lit(0.0)).as("sb"))
      .localCheckpoint()
    var rank = active.withColumn("r", col("sb"))
    for (i <- 1 to iters) {
      val contrib = symDeg
        .join(rank, symDeg("src") === rank("id"))
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_r"))
      rank = active
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("sb"),
          (lit(1.0 - d) * col("sb")
            + lit(d) * coalesce(col("in_r"), lit(0.0))).as("r"))
      if (i % 3 == 0 && i < iters) rank = rank.localCheckpoint()
    }
    nodes.select(col("id"))
      .join(rank.select(col("id"), col("r").as("_er")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_er"), lit(0.0)).as("rank"))
  }

  /** Driver-side personalized power iteration (mirrors [[driverSolve]]
    * with the seeded teleport and zero base for non-seeds). */
  private def driverPpr(nodes: DataFrame, once: DataFrame,
      seeds: DataFrame, iters: Int, d: Double, sb: Double): DataFrame = {
    val raw = once.collect().map(r => (r.getLong(0), r.getLong(1)))
    val seedIds = seeds.collect().map(_.getLong(0)).toSet
    val sym = (raw ++ raw.map(_.swap)).sortBy(identity)
    val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.length.toDouble }
    val sOf = (k: Long) => if (seedIds.contains(k)) sb else 0.0
    val act = (deg.keySet ++ seedIds).toSeq.sorted
    var rank = act.map(k => k -> sOf(k)).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.HashMap.empty[Long, Double]
      sym.foreach { case (s, t) =>
        in(t) = in.getOrElse(t, 0.0) + rank(s) / deg(s)
      }
      rank = act.map(k =>
        k -> ((1.0 - d) * sOf(k) + d * in.getOrElse(k, 0.0))).toMap
    }
    val ss = nodes.sparkSession
    import ss.implicits._
    val labels = rank.toSeq.toDF("id", "_er")
    nodes.select(col("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("_er"), lit(0.0)).as("rank"))
  }

  private def driverSolve(nodes: DataFrame, once: DataFrame, iters: Int,
      d: Double, n: Double, base: Double): DataFrame = {
    val raw = once.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (raw ++ raw.map(_.swap)).sortBy(identity)
    val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.length.toDouble }
    var rank = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.HashMap.empty[Long, Double]
      sym.foreach { case (s, t) =>
        in(t) = in.getOrElse(t, 0.0) + rank(s) / deg(s)
      }
      rank = rank.keys.map(k => k -> (base + d * in.getOrElse(k, 0.0))).toMap
    }
    val ss = nodes.sparkSession
    import ss.implicits._
    val labels = rank.toSeq.toDF("id", "_er")
    nodes.select(col("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("_er"), lit(base)).as("rank"))
  }
}
