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
      d: Double = 0.85): DataFrame = {
    val n = nodes.count().toDouble
    val base = (1.0 - d) / n
    // Materialize the raw edge list BEFORE symmetrizing: the union and
    // the degree self-join each re-evaluate their input, so an
    // un-checkpointed edge lineage (typically the whole LSH candidate
    // pipeline) would run 4x.
    val once = edges.select(col("src"), col("dst")).localCheckpoint()
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
}
