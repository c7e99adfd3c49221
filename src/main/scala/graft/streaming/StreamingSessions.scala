package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-user activity sessions — the incremental face of the
  * batch `agg_sessions` query: the SAME native `session_window`
  * operator, run over an unbounded stream with a watermark. Sessions
  * merge in the state store while events keep arriving inside the gap
  * and emit exactly once (Append mode) when the watermark passes their
  * close — so a parity check against the batch query on the closed
  * prefix is exact, not approximate (StreamingSpec pins it).
  *
  * Scale: state is one (start, end, count, sum) per OPEN session per
  * user — never an event list — keyed and shuffled once by user_id;
  * the watermark bounds how long a session can stay open, so state
  * size is O(active users), independent of stream length.
  */
object StreamingSessions {

  /** `events` must have (ts TIMESTAMP, user_id LONG, value DOUBLE).
    * Emits one row per CLOSED session: (user_id, session_start,
    * session_end, n_events, sum_value). */
  def apply(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
