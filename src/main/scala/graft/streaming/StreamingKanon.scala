package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Continuous k-anonymity exposure monitor — the streaming face of the
  * batch `privacy_kanon` audit. Per quasi-identifier cell (the
  * released (event_type, dow, daypart) tuple, pre-rendered as one
  * string key), state holds AT MOST [[K]] distinct user ids. The k-th
  * distinct user flips the cell SAFE forever — k-anonymity is
  * monotone under row arrival (new members can only raise the
  * distinct count), so the id set collapses to a boolean at that
  * point and per-cell memory is bounded by k ids whatever the stream
  * length. That bound is what makes a privacy gate deployable on an
  * unbounded event stream: |cells| · k longs of state, no timeline.
  *
  * Determinism: the transition is pure SET union (commutative and
  * idempotent — no within-batch sort needed, re-delivery of a user id
  * is a no-op), so the emitted rows are a deterministic function of
  * the batch split alone, and the FINAL state is split-invariant.
  *
  * Emits after each micro-batch the standing of every touched cell:
  * (cell, n_seen capped at k, safe).
  */
object StreamingKanon {

  /** Anonymity threshold — matches the batch `privacy_kanon` k. */
  val K = 5

  /** Bounded per-cell state: < K distinct ids, or the safe flag. */
  final case class KanonState(ids: Seq[Long], safe: Boolean)

  /** stream (cell STRING, user_id BIGINT — one row per event) →
    * Update-mode rows (cell, n_seen, safe). */
  def apply(stream: DataFrame): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("cell", "user_id").as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KanonState, (String, Long, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (cell, rows, state) =>
        var st = state.getOption.getOrElse(KanonState(Seq.empty, safe = false))
        if (st.safe) {
          rows.foreach(_ => ()) // drain; the cell can never un-safe
        } else {
          val u = st.ids.toSet ++ rows.map(_._2)
          st = if (u.size >= K) KanonState(Seq.empty, safe = true)
          else KanonState(u.toSeq.sorted, safe = false)
          state.update(st)
        }
        val n = if (st.safe) K.toLong else st.ids.size.toLong
        Iterator.single((cell, n, st.safe))
      }
      .toDF("cell", "n_seen", "safe")
  }
}
