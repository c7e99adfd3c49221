package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * cluster step of near-duplicate deduplication: LSH emits candidate
  * PAIRS, but a pipeline must drop whole duplicate GROUPS (doc A≈B,
  * B≈C ⇒ {A,B,C} is one cluster even when A≈C was never emitted as a
  * pair). Each round every node takes the minimum label among itself
  * and its neighbours; at the fixpoint every node carries the minimum
  * node id of its component, which serves as the cluster id.
  *
  * Scale: each round is one equi-join (edges ⋈ labels on the source
  * node) plus one groupBy-min — both hash-partition on the node id, so
  * the exchanges align round to round. Rounds needed = graph diameter;
  * near-dup clusters are quasi-cliques (LSH emits most intra-cluster
  * pairs), so 2–3 rounds in practice. `localCheckpoint` truncates the
  * lineage each round — without it the plan doubles every iteration
  * and the driver, not the data, becomes the bottleneck. For graphs
  * with long chains the alternating large-star/small-star scheme
  * (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * converges in O(log²) rounds; diameter-bounded dedup graphs don't
  * need it.
  */
object ConnectedComponents {

  /** Edge-count threshold under which the component labels are solved
    * driver-side by union-find instead of the distributed loop. A
    * candidate graph this small converges label-propagation in O(log
    * diameter) ROUNDS, but each round still costs a fixed driver
    * planning/scheduling fee — a 13-round loop over a few hundred
    * edges is pure overhead. Collecting ≤100k edge pairs (~1.6 MB) is
    * the same driver-memory posture as a broadcast-join build side;
    * above the threshold the fully distributed loop runs (ScaleProbe
    * exercises it at 1M nodes / 159k edges).
    */
  val DriverSolveMaxEdges = 100000L

  /** Rounds the last DISTRIBUTED fixpoint ran — probe instrumentation
    * only (read by the GraphParityProbe receipt), never consulted by
    * query logic. */
  private[graft] val LastRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** @param nodes  one column `id` (LONG), one row per vertex
    * @param edges  columns `src`, `dst` (LONG); undirected — pass each
    *               edge once in either orientation, symmetrized here
    * @param maxIter safety bound on propagation rounds
    * @param driverMaxEdges adaptive cutover (tests pass 0 to force the
    *               distributed loop on small fixtures)
    * @return one row per vertex: `id`, `lbl` = min id in its component
    */
  def apply(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25,
      driverMaxEdges: Long = DriverSolveMaxEdges): DataFrame = {
    // Materialize the edge list ONCE before symmetrizing and iterating:
    // edges is typically the tail of an expensive pipeline (shingle →
    // minhash → band join); a lazy `sym` would re-execute all of it on
    // every propagation round, and even a checkpointed union would run
    // the lineage twice (once per union branch).
    val once = edges.select(col("src"), col("dst")).localCheckpoint()
    val nEdges = once.count()
    if (nEdges <= driverMaxEdges)
      return driverSolve(nodes, once)
    val sym = once
      .union(once.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    // Iterate ONLY over nodes that have at least one edge. In a dedup
    // corpus the candidate subgraph is a sliver of the node set (most
    // docs are singletons); a singleton's label never changes, so
    // shuffling the full corpus through every round would be pure
    // waste. Singletons re-attach with lbl = id at the end.
    // Convergence probe: labels only ever decrease, so the label SUM
    // strictly decreases until the fixpoint — comparing sums of the
    // already-checkpointed rounds is a scan-only aggregate, replacing
    // the per-round shuffle-join emptiness check. decimal(38,0) keeps
    // the sum exact at any node count × id range.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var prevSum = lblSum(labels)
    var converged = prevSum == null // empty edge set: nothing to iterate
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbour = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      // Pointer jumping from round 3 on: also adopt the label OF the
      // current label. lbl is always a node in the same component with
      // lbl ≤ id, so this stays within the component while halving
      // label-chain depth each round — O(log diameter) convergence on
      // long chains. Quasi-clique dedup graphs converge in ≤ 3 plain
      // rounds, so the extra self-join is skipped while they do.
      val viaPointer =
        if (iter < 2) Seq.empty
        else Seq(labels.as("x")
          .join(labels.as("y"), col("x.lbl") === col("y.id"))
          .select(col("x.id").as("id"), col("y.lbl").as("lbl")))
      val next = (Seq(labels, viaNeighbour) ++ viaPointer)
        .reduce(_ union _)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      val s = lblSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    LastRounds.set(iter)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ConnectedComponents: maxIter=$maxIter exhausted before the " +
          "fixpoint — returned labels may split components (raise maxIter)")
    nodes.select(col("id"))
      .join(labels.withColumnRenamed("lbl", "_elbl"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_elbl"), col("id")).as("lbl"))
  }

  /** Union-find with path compression over a collected edge list;
    * roots are kept at the minimum id of their set, so the labels are
    * IDENTICAL to the distributed fixpoint. Only touched nodes ship
    * back; singletons re-attach exactly like the distributed path.
    */
  private def driverSolve(nodes: DataFrame, once: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    once.collect().foreach { row =>
      val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val ss = nodes.sparkSession
    import ss.implicits._
    val touched = parent.keys.toArray // snapshot: find() mutates parent
    val labels = touched.map(x => (x, find(x))).toSeq.toDF("id", "_elbl")
    nodes.select(col("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("_elbl"), col("id")).as("lbl"))
  }
}
