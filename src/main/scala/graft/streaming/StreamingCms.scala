package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming count-min heavy-hitter estimates — the streaming face of
  * the batch `sketch_cms`: the same d×w counter table (same cell hash
  * family) held as bounded per-group state in
  * `flatMapGroupsWithState`, probed for a fixed token watchlist after
  * every micro-batch.
  *
  * Counter ADDITION is commutative and associative, so the state —
  * and therefore every probe estimate once all rows have arrived — is
  * invariant to how ingestion splits into micro-batches (the property
  * StreamingSpec pins against a hand-computed batch sketch).
  * Exactly-once accounting comes from the checkpointed micro-batch
  * replay contract (a replayed batch rebuilds the same state), not
  * from merge idempotence — counts, unlike the sibling ops'
  * keyed-pair states, cannot dedup blind re-deliveries.
  *
  * Scale shape: state is BOUNDED at d·w cells per group whatever the
  * stream length or vocabulary; probes are a driver-literal watchlist,
  * so each batch emits |probes| rows — the sketch a 100 TB ingest
  * keeps when the exact per-shard vocabulary aggregate is too wide.
  */
object StreamingCms {

  private val P = graft.ext.TextOps.P

  /** Bounded per-group state: occupied cells of the d×w counter table,
    * keyed j·w + col. */
  final case class CmsState(cells: Map[Int, Long])

  /** Cell column for hash h in row j — identical to sketch_cms'
    * `((h*(2*j + 1) + j*7919 + 1) % P) % w`. */
  private[graft] def cellOf(h: Long, j: Int, w: Int): Int =
    (((h * (2 * j + 1) + j.toLong * 7919L + 1L) % P) % w).toInt

  /** stream (g STRING, h BIGINT — one row per token occurrence) →
    * Update-mode rows (g, tok, n_est): the count-min estimate of every
    * watchlist token after each micro-batch that touched the group.
    * Estimates only overcount (CMS guarantee) and are monotone over
    * batches. */
  def apply(stream: DataFrame, probes: Seq[(String, Long)],
      d: Int = 3, w: Int = 1024): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("g", "h").as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CmsState, (String, String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        var cells = state.getOption.map(_.cells).getOrElse(Map.empty[Int, Long])
        rows.foreach { r =>
          var j = 0
          while (j < d) {
            val k = j * w + cellOf(r._2, j, w)
            cells = cells.updated(k, cells.getOrElse(k, 0L) + 1L)
            j += 1
          }
        }
        state.update(CmsState(cells))
        probes.iterator.map { case (tok, h) =>
          val est = (0 until d)
            .map(j => cells.getOrElse(j * w + cellOf(h, j, w), 0L)).min
          (g, tok, est)
        }
      }
      .toDF("g", "tok", "n_est")
  }
}
