package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution matcher (view →
  * purchase within 10 minutes) as a native Structured Streaming
  * join, the one streaming primitive the suite's other faces
  * (stateful folds) don't exercise: TWO unbounded inputs joined on
  * key + event-time range, with watermarks on BOTH sides so Spark
  * can bound the join state.
  *
  * State-cleanup contract (what StreamingSpec pins): the range
  * condition `p_ts ∈ [v_ts, v_ts + 10 min]` plus the two watermarks
  * lets the engine evict a buffered view once the watermark passes
  * `v_ts + 10 min` (no purchase can ever match it again) and drop a
  * purchase arriving with event time below the watermark — so a
  * too-late purchase does NOT produce the match a batch join of the
  * same rows would, and per-key state is bounded by the join window,
  * not the stream length.
  *
  * Scale shape: the join is key-partitioned (hash on user) with
  * time-bounded state per key — the standard CDC/attribution join a
  * 100 TB event pipeline runs continuously.
  */
object StreamingMatch {

  /** views (user_id, ts) ⋈ purchases (user_id, ts) within
    * [v_ts, v_ts + 10 min]; both sides watermarked 5 min. Append-mode
    * rows (user_id, v_ts, p_ts, latency_us). */
  def apply(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.selectExpr("user_id AS v_user", "ts AS v_ts")
      .withWatermark("v_ts", "5 minutes")
    val p = purchases.selectExpr("user_id AS p_user", "ts AS p_ts")
      .withWatermark("p_ts", "5 minutes")
    v.join(p, expr("v_user = p_user AND p_ts >= v_ts" +
        " AND p_ts <= v_ts + INTERVAL 10 MINUTES"))
      .select(col("v_user").as("user_id"), col("v_ts"), col("p_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
          .as("latency_us"))
  }
}
