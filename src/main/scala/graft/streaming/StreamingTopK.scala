package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter TOP-K via the SpaceSaving summary (Metwally,
  * Agrawal & El Abbadi, ICDT'05) — the streaming face of the batch
  * `agg_topk_per_group`: a bounded table of m counters per group; a
  * tracked item increments its counter, an untracked item evicts the
  * current minimum and inherits its count as the new entry's error
  * bound.
  *
  * SpaceSaving's guarantees (what StreamingSpec pins): every estimate
  * only OVERCOUNTS (`n_est ≥ exact ≥ n_est − err`), and any item whose
  * true count exceeds n/m is guaranteed to be in the table — so the
  * emitted top-k can only miss an item that was never frequent.
  *
  * Unlike the CMS/HLL siblings, the summary is NOT merge-commutative:
  * the fold is order-dependent, so each micro-batch is first sorted by
  * the caller-supplied total order `seq` (the flatMapGroupsWithState
  * determinism contract — rows arrive in shuffle order) and the final
  * state is then a deterministic function of the batch split, which
  * the spec replays move for move against a driver-side reference
  * fold. Eviction tie-breaks are total too: (count asc, key asc).
  *
  * Scale shape: state is BOUNDED at m (key, count, err) triples per
  * group whatever the stream length or key cardinality; each batch
  * emits k rows per touched group — the summary a 100 TB ingest keeps
  * when the exact per-key aggregate is too wide to hold.
  */
object StreamingTopK {

  /** Bounded per-group state: tracked key → (count, error bound). */
  final case class TopKState(counters: Map[Long, (Long, Long)])

  /** One SpaceSaving step — shared by the streaming fold and the
    * spec's driver-side reference replay. */
  private[graft] def step(counters: Map[Long, (Long, Long)], h: Long,
      m: Int): Map[Long, (Long, Long)] =
    counters.get(h) match {
      case Some((c, e)) => counters.updated(h, (c + 1L, e))
      case None if counters.size < m => counters.updated(h, (1L, 0L))
      case None =>
        val (vk, (vc, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
        (counters - vk).updated(h, (vc + 1L, vc))
    }

  /** stream (g STRING, seq BIGINT, h BIGINT — one row per item
    * occurrence, `seq` a caller-unique total order) → Update-mode rows
    * (g, h, n_est, err, rank): the current top-k of every group after
    * each micro-batch that touched it, ranked (n_est desc, h asc). */
  def apply(stream: DataFrame, m: Int = 64, k: Int = 10): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("g", "seq", "h").as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, (String, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        var counters =
          state.getOption.map(_.counters).getOrElse(Map.empty[Long, (Long, Long)])
        // total-order the micro-batch: shuffle order is not a fold order
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
          counters = step(counters, r._3, m)
        }
        state.update(TopKState(counters))
        counters.toSeq
          .map { case (key, (c, e)) => (key, c, e) }
          .sortBy { case (key, c, _) => (-c, key) }
          .take(k)
          .zipWithIndex
          .iterator
          .map { case ((key, c, e), i) => (g, key, c, e, i + 1L) }
      }
      .toDF("g", "h", "n_est", "err", "rank")
  }
}
