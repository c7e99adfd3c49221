package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the mutual-
  * reachability refinement of [[ConnectedComponents]]: A→B→A cycles
  * collapse to one label, one-way containment chains do not.
  *
  * Distributed path — min-label peeling with BLOCK-RESTRICTED root
  * flooding (the MultiStep/FB-Trim family, cf. Slota et al.): the
  * minimum id reachable FROM v (`mf`) is constant per SCC (any node on
  * a v↔u cycle reaches exactly what v reaches), so the same-`mf`
  * blocks partition the residual graph, each block S_r containing its
  * root r (mf(r) = r, i.e. r reaches nothing smaller). Then
  * SCC(r) = {v ∈ S_r : r →* v}, and any r→v path inside the SCC stays
  * inside S_r — so flooding a flag forward from every root through
  * same-block edges assigns EVERY ready SCC of the round at once, not
  * just the global minimum's. The mirror pass runs on reversed edges
  * (min id REACHING v), catching shapes whose forward labels flood
  * slowly: an id-ascending chain is all-roots forward (one round, one
  * inner iteration), an id-descending chain is all-roots backward.
  * Each side only contributes when BOTH its label fixpoint and its
  * flood converged within the adaptive iteration cap; if neither side
  * converged the cap doubles (diameter ≤ |V| guarantees termination)
  * — deep-but-valid graphs converge instead of aborting. Assigned
  * nodes peel; the loop re-runs on the residual subgraph. Inner
  * fixpoints are CC-style min-propagation joins (label-sum /
  * flag-count convergence probes, localCheckpoint-bounded lineage).
  *
  * Driver path (≤ [[ConnectedComponents.DriverSolveMaxEdges]] edges):
  * iterative Tarjan over the collected edge list, labels = min member
  * id — identical output to the distributed fixpoint, same cutover
  * posture as CC (collecting a ≤100k-edge candidate graph is the
  * broadcast-build-side memory shape; the distributed loop is forced
  * in tests via driverMaxEdges = 0).
  */
object StronglyConnectedComponents {

  /** Outer peel rounds the last DISTRIBUTED run took — probe
    * instrumentation only (GraphParityProbe receipt). */
  private[graft] val LastRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** @param nodes one column `id` (LONG)
    * @param edges columns `src`, `dst` (LONG), directed
    * @param maxInner INITIAL inner-fixpoint iteration cap — adaptive:
    *   doubles (bounded by residual node count) whenever no side
    *   converges, so it tunes cost, never correctness
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
    var cap = math.max(4, maxInner)
    var nRemaining = remaining.count()
    while (nRemaining > 0 && outer < maxOuter) {
      val rev = e.select(col("dst").as("src"), col("src").as("dst"))
      val fwd = minReachCapped(remaining, e, cap) match {
        case (mf, true) => blockAssign(mf, e, cap)
        case _ => None
      }
      val bwd = minReachCapped(remaining, rev, cap) match {
        case (mb, true) => blockAssign(mb, rev, cap)
        case _ => None
      }
      // Both sides label an assigned node with the same scc_id — the
      // SCC's minimum member id — so the union dedupes cleanly.
      val done = (fwd, bwd) match {
        case (Some(a), Some(b)) => Some(a.union(b).distinct())
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case (None, None) => None
      }
      done match {
        case None =>
          // Neither side reached its fixpoint: double the cap (the
          // residual diameter is < nRemaining, so this terminates).
          val hi = math.min(nRemaining, (Int.MaxValue - 1).toLong).toInt + 1
          require(cap < hi,
            "SCC inner fixpoint failed to converge at cap ≥ |V| — " +
              "convergence probe broken")
          cap = math.min(math.max(cap * 2, cap + 1), hi)
          log.info(s"SCC inner cap doubled to $cap")
        case Some(d0) =>
          val d = d0.select(col("id"), col("lbl").as("scc_id"))
            .localCheckpoint()
          assigned = assigned.union(d).localCheckpoint()
          remaining = remaining.join(d, Seq("id"), "left_anti")
            .localCheckpoint()
          e = e.join(remaining.select(col("id").as("src")),
              Seq("src"), "left_semi")
            .join(remaining.select(col("id").as("dst")),
              Seq("dst"), "left_semi")
            .localCheckpoint()
          nRemaining = remaining.count()
          outer += 1
      }
    }
    LastRounds.set(outer)
    require(nRemaining == 0,
      s"StronglyConnectedComponents: maxOuter=$maxOuter exhausted with " +
        s"$nRemaining nodes unassigned (pathological SCC chain — raise maxOuter)")
    if (outer > 8) log.warn(s"SCC peel took $outer rounds")
    nodes.select(col("id"))
      .join(assigned.withColumnRenamed("scc_id", "_s"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), col("id")).as("scc_id"))
  }

  /** Min-label propagation along directed edges, capped:
    * lbl(v) = min({v} ∪ {lbl(w) : (v, w) ∈ e}) iterated — the minimum
    * id reachable from v. Returns the label table and whether the
    * fixpoint was reached within `cap` iterations (label-sum
    * convergence probe, same cadence as the CC loop). */
  private def minReachCapped(nodes: DataFrame, e: DataFrame, cap: Int)
      : (DataFrame, Boolean) = {
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var lab = nodes.withColumn("lbl", col("id")).localCheckpoint()
    var prev = lblSum(lab)
    var converged = prev == null
    var it = 0
    while (!converged && it < cap) {
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
    (lab, converged)
  }

  /** Flood the root flag forward through same-label blocks: seed every
    * block root (lbl(r) = r), then flag(v) |= ∃ (u, v) ∈ e with
    * lbl(u) = lbl(v) ∧ flag(u), to the fixpoint. The flagged set is
    * exactly ⋃_r SCC(r) for this round's ready roots (see object doc);
    * rows are (id, lbl = scc_id). None if the flood did not reach its
    * fixpoint within `cap` (monotone flag-count probe). */
  private def blockAssign(lab: DataFrame, e: DataFrame, cap: Int)
      : Option[DataFrame] = {
    val be = e
      .join(lab.select(col("id").as("src"), col("lbl").as("sl")), "src")
      .join(lab.select(col("id").as("dst"), col("lbl").as("dl")), "dst")
      .filter(col("sl") === col("dl"))
      .select(col("src"), col("dst"), col("sl").as("lbl"))
      .localCheckpoint()
    var flagged = lab.filter(col("id") === col("lbl"))
      .select(col("id"), col("lbl")).localCheckpoint()
    var n = flagged.count()
    var converged = false
    var it = 0
    while (!converged && it < cap) {
      val grown = be.join(
          flagged.select(col("id").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("id"), col("lbl"))
      val next = flagged.union(grown).distinct().localCheckpoint()
      val m = next.count()
      converged = m == n
      n = m
      flagged = next
      it += 1
    }
    if (converged) Some(flagged) else None
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
