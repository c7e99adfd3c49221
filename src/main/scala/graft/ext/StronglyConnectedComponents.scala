package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the mutual-
  * reachability refinement of [[ConnectedComponents]]: A→B→A cycles
  * collapse to one label, one-way containment chains do not.
  *
  * Distributed path — min-label forward/backward peeling: every member
  * of one SCC reaches exactly the same closure (and is reached by the
  * same ancestor set), so the minimum id reachable FROM v (`mf`) and
  * the minimum id REACHING v (`mb`) are constant per SCC; and
  * mf(v) = mb(v) = r proves v↔r mutual reachability, hence v ∈ SCC(r).
  * Each outer round assigns every SCC whose member minima coincide —
  * always at least the SCC of the remaining global-minimum id — then
  * peels those nodes and re-runs on the residual subgraph. Inner
  * fixpoints are the CC-style min-propagation join (rounds = residual
  * diameter, label-sum convergence probe, localCheckpoint-bounded
  * lineage); outer rounds are bounded by the SCC count in the worst
  * case (an id-ascending chain) but by 2–3 on near-dup containment
  * graphs, whose cycles are short and dense.
  *
  * Driver path (≤ [[ConnectedComponents.DriverSolveMaxEdges]] edges):
  * iterative Tarjan over the collected edge list, labels = min member
  * id — identical output to the distributed fixpoint, same cutover
  * posture as CC (collecting a ≤100k-edge candidate graph is the
  * broadcast-build-side memory shape; the distributed loop is forced
  * in tests via driverMaxEdges = 0).
  */
object StronglyConnectedComponents {

  /** @param nodes one column `id` (LONG)
    * @param edges columns `src`, `dst` (LONG), directed
    * @return one row per vertex: `id`, `scc_id` = min id in its SCC */
  def apply(nodes: DataFrame, edges: DataFrame,
      maxOuter: Int = 64, maxInner: Int = 50,
      driverMaxEdges: Long = ConnectedComponents.DriverSolveMaxEdges)
      : DataFrame = {
    val once = edges.select(col("src"), col("dst")).localCheckpoint()
    if (once.count() <= driverMaxEdges)
      return driverSolve(nodes, once)

    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // Only edge-touched nodes iterate; singletons re-attach at the end.
    var remaining = once.select(col("src").as("id"))
      .union(once.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    var e = once
    var assigned = nodes.sparkSession.range(0)
      .selectExpr("id", "id AS scc_id").localCheckpoint()
    var outer = 0
    var nRemaining = remaining.count()
    while (nRemaining > 0 && outer < maxOuter) {
      val mf = minReach(remaining, e, maxInner)
        .withColumnRenamed("lbl", "mf")
      val mb = minReach(remaining,
        e.select(col("dst").as("src"), col("src").as("dst")), maxInner)
        .withColumnRenamed("lbl", "mb")
      val done = mf.join(mb, Seq("id"))
        .filter(col("mf") === col("mb"))
        .select(col("id"), col("mf").as("scc_id"))
      assigned = assigned.union(done).localCheckpoint()
      remaining = remaining.join(done, Seq("id"), "left_anti").localCheckpoint()
      e = e.join(remaining.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(remaining.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint()
      nRemaining = remaining.count()
      outer += 1
    }
    require(nRemaining == 0,
      s"StronglyConnectedComponents: maxOuter=$maxOuter exhausted with " +
        s"$nRemaining nodes unassigned (pathological SCC chain — raise maxOuter)")
    if (outer > 8) log.warn(s"SCC peel took $outer rounds")
    nodes.select(col("id"))
      .join(assigned.withColumnRenamed("scc_id", "_s"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), col("id")).as("scc_id"))
  }

  /** Min-label propagation along directed edges to the fixpoint:
    * lbl(v) = min({v} ∪ {lbl(w) : (v, w) ∈ e}) iterated — the minimum
    * id reachable from v. Same label-sum convergence probe and
    * checkpoint cadence as the CC loop. */
  private def minReach(nodes: DataFrame, e: DataFrame, maxInner: Int)
      : DataFrame = {
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var lab = nodes.withColumn("lbl", col("id")).localCheckpoint()
    var prev = lblSum(lab)
    var converged = prev == null
    var it = 0
    while (!converged && it < maxInner) {
      val viaEdge = e.join(lab, e("dst") === lab("id"))
        .select(e("src").as("id"), col("lbl"))
      val next = lab.union(viaEdge)
        .groupBy("id").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val s = lblSum(next)
      converged = s == prev
      prev = s
      lab = next
      it += 1
    }
    require(converged,
      s"SCC minReach: maxInner=$maxInner exhausted before the fixpoint")
    lab
  }

  /** Iterative Tarjan over the collected edges; labels normalize to
    * the minimum member id so the output is engine-independent. */
  private def driverSolve(nodes: DataFrame, once: DataFrame): DataFrame = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    val touched = mutable.LinkedHashSet.empty[Long]
    once.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      touched += a; touched += b
    }
    val index = mutable.HashMap.empty[Long, Int]
    val low = mutable.HashMap.empty[Long, Int]
    val onStack = mutable.HashSet.empty[Long]
    val stack = mutable.ArrayBuffer.empty[Long]
    val label = mutable.HashMap.empty[Long, Long]
    var counter = 0
    val empty = mutable.ArrayBuffer.empty[Long]
    touched.foreach { v0 =>
      if (!index.contains(v0)) {
        val work = mutable.ArrayBuffer[(Long, Int)]((v0, 0))
        index(v0) = counter; low(v0) = counter; counter += 1
        stack += v0; onStack += v0
        while (work.nonEmpty) {
          val (v, ci) = work.last
          val cs = adj.getOrElse(v, empty)
          if (ci < cs.length) {
            work(work.length - 1) = (v, ci + 1)
            val w = cs(ci)
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack += w
              work += ((w, 0))
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          } else {
            work.remove(work.length - 1)
            if (work.nonEmpty) {
              val p = work.last._1
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) {
              val comp = mutable.ArrayBuffer.empty[Long]
              var w = -1L
              while (w != v) {
                w = stack.remove(stack.length - 1); onStack -= w; comp += w
              }
              val m = comp.min
              comp.foreach(c => label(c) = m)
            }
          }
        }
      }
    }
    val ss = nodes.sparkSession
    import ss.implicits._
    val labels = touched.toSeq.map(v => (v, label(v))).toDF("id", "_s")
    nodes.select(col("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), col("id")).as("scc_id"))
  }
}
