package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming approximate quantiles per group — the streaming face of
  * the batch `sketch_quantile`: the SAME deterministic mergeable
  * bottom-K-by-hash sample, held as per-group state in
  * `mapGroupsWithState`. The sketch merge (bottomK(S ∪ batch)) is
  * commutative, associative and order-independent (the EngineProps
  * partitioning-invariance property), which is precisely what makes
  * it streamable: any micro-batch arrival order yields the same
  * sample, so the emitted estimates converge to the batch sketch's
  * numbers no matter how ingestion interleaves.
  *
  * Scale shape: state is BOUNDED at K (h, v, id) triples per group —
  * never the stream; each micro-batch merge sorts ≤ K + |batch rows
  * of the group| tuples by the TOTAL order (h, id) (bare-h ties would
  * make state shuffle-order-dependent). Estimates are integer-ranked
  * (⌈p·m⌉-th smallest sampled value), identical to the batch query's
  * formula.
  */
object StreamingQuantile {

  /** Bounded per-group state: the K hash-smallest (h, id, v) rows. */
  final case class QState(sample: List[(Long, Long, Double)])

  /** Integer-ranked estimates from a sample, identical to the batch
    * sketch_quantile formula: value at rank ⌈p·m/100⌉ (min 1) of the
    * sample ordered by (v, h). */
  private[graft] def estimates(
      sample: Seq[(Long, Long, Double)]): (Long, Seq[Double]) = {
    val byV = sample.map(t => (t._3, t._1)).sortBy(identity).map(_._1)
    val m = byV.length
    (m.toLong, Seq(25, 50, 90, 99).map { p =>
      byV(math.max(1, (p * m + 99) / 100) - 1)
    })
  }

  /** stream (g STRING, h BIGINT, id BIGINT, v DOUBLE) →
    * Update-mode rows (g, m_sample, p25_est, p50_est, p90_est,
    * p99_est), one per group per micro-batch that touched it. */
  def apply(stream: DataFrame, k: Int = 512): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("g", "h", "id", "v")
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[QState,
        (String, Long, Double, Double, Double, Double)](
        GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        // distinctBy (h, id) makes the merge IDEMPOTENT: an
        // at-least-once source re-delivering a micro-batch must not
        // let a duplicate occupy a bottom-K slot and evict a genuine
        // row (the sibling streaming ops suppress re-arrivals the
        // same way, via their pair-keyed state).
        val merged = (state.getOption.map(_.sample).getOrElse(Nil) ++
            rows.map(r => (r._2, r._3, r._4)))
          .distinctBy(t => (t._1, t._2))
          .sortBy(t => (t._1, t._2))
          .take(k)
        state.update(QState(merged))
        val (m, es) = estimates(merged)
        (g, m, es(0), es(1), es(2), es(3))
      }
      .toDF("g", "m_sample", "p25_est", "p50_est", "p90_est", "p99_est")
  }
}
