package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection — the incremental face of the batch
  * `anomaly_mad` / `ts_ewm_vol` family: per key, an exponentially
  * weighted mean/variance (α = 1/8) carried as three numbers of state,
  * flagging any observation deviating more than K = 4 EW standard
  * deviations from the mean the moment it arrives, instead of a batch
  * pass over history.
  *
  * Scale: state is O(1) per key (mean, variance, count — never a value
  * list), keyed and shuffled once. Within a micro-batch, observations
  * are sorted per key by (event time, value) — a total order — before
  * folding, so intra-batch arrival order can't reorder the recursion
  * even among equal timestamps; the flag for an
  * observation is judged against the state BEFORE it folds in (a spike
  * must not dilute the baseline it is judged against). The first
  * `WarmUp` observations only build state — flagging against a
  * two-point variance is noise, not detection.
  */
object StreamingAnomaly {

  final case class Obs(ts: java.sql.Timestamp, key: String, x: Double)
  final case class EwState(mean: Double, varr: Double, n: Long)
  final case class Flag(key: String, at: java.sql.Timestamp, x: Double,
      mean: Double, score: Double)

  val Alpha = 0.125
  val K = 4.0
  val WarmUp = 8L

  /** One observation against the running state; returns the flag (if
    * any) and the advanced state. Public so the parity spec folds the
    * SAME transition sequentially. */
  def advance(st: EwState, ts: java.sql.Timestamp, x: Double)
      : (Option[Flag], EwState) = {
    if (st.n == 0L) (None, EwState(x, 0.0, 1L))
    else {
      val d = x - st.mean
      val flag =
        if (st.n >= WarmUp && st.varr > 0.0 &&
          math.abs(d) > K * math.sqrt(st.varr))
          Some(Flag("", ts, x, st.mean, math.abs(d) / math.sqrt(st.varr)))
        else None
      (flag,
        EwState(st.mean + Alpha * d,
          (1.0 - Alpha) * (st.varr + Alpha * d * d), st.n + 1L))
    }
  }

  private def step(
      key: String,
      events: Iterator[Obs],
      state: GroupState[EwState]): Iterator[Flag] = {
    var st = state.getOption.getOrElse(EwState(0.0, 0.0, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[Flag]
    // (ts, x) is a TOTAL order over distinct observations — bare ts
    // would leave equal-timestamp folds in shuffle-arrival order and
    // the EW state (hence a borderline flag) nondeterministic.
    events.toSeq.sortBy(e => (e.ts.getTime, e.x)).foreach { e =>
      val (f, stN) = advance(st, e.ts, e.x)
      f.foreach(fl => out += fl.copy(key = key))
      st = stN
    }
    state.update(st)
    out.iterator
  }

  def apply(obs: Dataset[Obs]): Dataset[Flag] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        step)
  }
}
