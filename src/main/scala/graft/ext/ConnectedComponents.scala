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

  /** @param nodes  one column `id` (LONG), one row per vertex
    * @param edges  columns `src`, `dst` (LONG); undirected — pass each
    *               edge once in either orientation, symmetrized here
    * @param maxIter safety bound on propagation rounds
    * @return one row per vertex: `id`, `lbl` = min id in its component
    */
  def apply(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // Materialize the edge list ONCE before symmetrizing and iterating:
    // edges is typically the tail of an expensive pipeline (shingle →
    // minhash → band join); a lazy `sym` would re-execute all of it on
    // every propagation round, and even a checkpointed union would run
    // the lineage twice (once per union branch).
    val once = edges.select(col("src"), col("dst")).localCheckpoint()
    val sym = once
      .union(once.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    // Iterate ONLY over nodes that have at least one edge. In a dedup
    // corpus the candidate subgraph is a sliver of the node set (most
    // docs are singletons); a singleton's label never changes, so
    // shuffling the full corpus through every round would be pure
    // waste. Singletons re-attach with lbl = id at the end.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var converged = false
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
      // Labels only ever decrease, so a strictly smaller label anywhere
      // is exactly "not yet converged".
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .where(col("n.lbl") < col("o.lbl"))
        .isEmpty
      labels = next
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ConnectedComponents: maxIter=$maxIter exhausted before the " +
          "fixpoint — returned labels may split components (raise maxIter)")
    nodes.select(col("id"))
      .join(labels.withColumnRenamed("lbl", "_elbl"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_elbl"), col("id")).as("lbl"))
  }
}
