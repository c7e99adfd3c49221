package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel (view → click → purchase per user) — the
  * incremental face of the batch `agg_funnel` query: instead of three
  * filter→aggregate→join passes over history, each user carries three
  * longs of state and every micro-batch advances them in event-time
  * order, emitting a row whenever a funnel step completes.
  *
  * Scale: state is O(1) per user (three epoch-ms timestamps, never an
  * event list), keyed and shuffled once by uid — the same bound that
  * makes the batch formulation safe applies to the state store. Within
  * a micro-batch, events are sorted per user before folding so intra-
  * batch arrival order can't reorder the funnel; cross-batch order is
  * the stream's own delivery contract (watermark the source upstream
  * for lateness bounds).
  */
object StreamingFunnel {

  case class FunnelEvent(ts: java.sql.Timestamp, uid: Long, etype: String)
  /** -1 = step not reached; otherwise epoch millis of the step. */
  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)
  case class FunnelAdvance(uid: Long, steps: Int, at: java.sql.Timestamp)

  private def advance(
      uid: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelAdvance] = {
    var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      e.etype match {
        case "view" if st.tView < 0 =>
          st = st.copy(tView = t); out += FunnelAdvance(uid, 1, e.ts)
        case "click" if st.tView >= 0 && st.tClick < 0 && t >= st.tView =>
          st = st.copy(tClick = t); out += FunnelAdvance(uid, 2, e.ts)
        case "purchase" if st.tClick >= 0 && st.tPurchase < 0 && t >= st.tClick =>
          st = st.copy(tPurchase = t); out += FunnelAdvance(uid, 3, e.ts)
        case _ => ()
      }
    }
    state.update(st)
    out.iterator
  }

  def apply(events: Dataset[FunnelEvent]): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.uid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance)
  }
}
