package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product-analytics + CDC operator surface over the `events` table:
  * the ranking-window family, cohort retention, snapshot diffing, and
  * latest-per-key compaction — the queries a training-data or metrics
  * pipeline runs daily alongside the dedup/similarity operators.
  *
  * Scale notes (100 TB design point):
  * - every date bucket here is PURE INTEGER math on epoch-micros
  *   (`div` by day/week constants), so Spark and DuckDB agree
  *   bit-for-bit and no calendar/timezone library sits in the hot path;
  * - `rel_window_suite` runs every ranking function over ONE window
  *   spec — one exchange, one sort, a single WindowExec feeds all
  *   seven outputs;
  * - `dedup_latest` is the argmax-struct form of "keep the newest
  *   version per key": the winner rides the partial aggregates
  *   (map-side combine), so the shuffle carries one row per key per
  *   map task — the window/row_number formulation would shuffle and
  *   sort EVERY version of every key;
  * - `cdc_diff` joins two per-key aggregates that hash-partition on
  *   the same key, so the full-outer join is exchange-aligned
  *   (no third shuffle).
  */
object AnalyticsQueries {

  private val WeekMicros = 604800000000L // 7 * 86400e6

  /** events with long user_id + epoch-micro t (shared derivation). */
  private def ev(s: SparkSession, dir: String): DataFrame =
    EventBars.events(s, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"), col("t"), col("value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The ranking-window family (row_number / rank / dense_rank /
    // percent_rank / cume_dist / ntile / lag / lead) over one shared
    // window spec. The sort key (t, event_id) is a TOTAL order —
    // event_id breaks timestamp ties — so every function is
    // deterministic; rank/dense_rank rank on t alone (so ties are
    // visible to them) while the frame order stays total.
    "rel_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
      val wT = Window.partitionBy("user_id").orderBy(col("t"))
      ev(s, dir).select(
        col("user_id"), col("t"), col("event_id"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(wT).cast("long").as("rnk"),
        dense_rank().over(wT).cast("long").as("drnk"),
        Rounding.r6(percent_rank().over(w)).as("prnk"),
        Rounding.r6(cume_dist().over(w)).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"),
        Rounding.r6(lag(col("value"), 1).over(w)).as("prev_value"),
        Rounding.r6(lead(col("value"), 1).over(w)).as("next_value"))
    }),

    // The frame-clause family the ranking suite doesn't touch: a
    // time-RANGE sliding frame (trailing 1 h — peers included by VALUE,
    // so timestamp ties can't make it order-dependent) plus
    // first/nth_value over the total-order ROWS frame. The ranged sum
    // runs over exact cent-longs; both specs share the one user_id
    // exchange.
    "rel_window_frames" -> ((s, dir) => {
      val wr = Window.partitionBy("user_id").orderBy(col("t"))
        .rangeBetween(-3600000000L, 0)
      val wf = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ev(s, dir)
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .select(col("user_id"), col("t"), col("event_id"),
          Rounding.r6(sum(col("c")).over(wr).cast("double") / lit(100.0))
            .as("sum_1h"),
          count(lit(1)).over(wr).cast("long").as("n_1h"),
          Rounding.r6(first(col("value")).over(wf)).as("first_seen"),
          Rounding.r6(nth_value(col("value"), 3).over(wf)).as("third_seen"))
    }),

    // Feature hashing (the hashing trick): the user×event-type cross
    // hashed into 1024 buckets — unbounded categorical crosses become a
    // fixed-width feature space. The hash is the corpus's polynomial
    // char fold; bucket stats are one exchange of exact longs.
    "feat_hashed_cross" -> ((s, dir) => {
      val P = graft.ext.TextOps.P
      ev(s, dir)
        .withColumn("ht", expr(
          "aggregate(transform(regexp_extract_all(event_type, '.', 0), " +
            s"c -> CAST(ascii(c) AS BIGINT)), 7L, (a, b) -> (a*131 + b) % ${P}L)"))
        .withColumn("bucket",
          expr(s"((ht * 31 + user_id % ${P}L) % ${P}L) % 1024"))
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("c")).as("sum_cents"))
    }),

    // Weekly cohort retention: users bucketed by their FIRST active
    // week; each later active week increments that cohort's
    // week-offset cell. Shape: distinct (user, week) partials first
    // (map-side combine collapses each user's events per week), then
    // the per-user min rides a second aggregate; the join back is
    // exchange-aligned on user_id. After the first aggregate only
    // (user, week) pairs move — never raw events.
    "agg_retention" -> ((s, dir) => {
      val uw = ev(s, dir)
        .select(col("user_id"), expr(s"t div $WeekMicros").as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // CDC snapshot diff: per-user state (event count, value sum) at the
    // data's midpoint timestamp vs at the end, reconciled with a
    // full-outer join → ADDED / CHANGED / UNCHANGED status per user
    // (REMOVED can't occur on an append-only log but the branch is the
    // generic contract). Status derives from integer counts only — no
    // float compare decides a row's fate. Both aggregates partition on
    // user_id, so the join adds no exchange; the midpoint scalar is a
    // broadcast single row.
    "cdc_diff" -> ((s, dir) => {
      val e = ev(s, dir)
      // integer midpoint (`div`), matching the oracle's `//` — a double
      // division here would round where the oracle floors
      val mid = e.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val withMid = e.crossJoin(broadcast(mid))
      val oldSnap = withMid.filter(col("t") <= col("mid"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_old"), sum(col("value")).as("s_old"))
      val newSnap = e.groupBy("user_id")
        .agg(count(lit(1)).as("n_new"), sum(col("value")).as("s_new"))
      oldSnap.join(newSnap, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          when(col("n_old").isNull, lit("ADDED"))
            .when(col("n_new").isNull, lit("REMOVED"))
            .when(col("n_old") =!= col("n_new"), lit("CHANGED"))
            .otherwise(lit("UNCHANGED")).as("status"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          col("n_new"),
          Rounding.r6(col("s_old")).as("sum_old"),
          Rounding.r6(col("s_new")).as("sum_new"))
    }),

    // Latest-per-key CDC compaction ("apply the change log, keep the
    // newest version"): argmax struct per (user, event_type) ordered by
    // (t, event_id) — unique, so the pick is deterministic. The struct
    // max folds in the partial aggregates; no per-key sort, no
    // full-history shuffle.
    "dedup_latest" -> ((s, dir) =>
      ev(s, dir)
        .groupBy("user_id", "event_type")
        .agg(max(struct(col("t"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("event_type"),
          col("m.t").as("t"), col("m.event_id").as("event_id"),
          Rounding.r6(col("m.value")).as("value"))),

    // SCD-2 interval build: turn the append-only change log into
    // versioned dimension rows — each event opens a version valid
    // [t, next t); the newest version per (user, event_type) stays
    // open-ended (valid_to null, is_current). One window over ONE
    // exchange keyed on the dimension key; the sort key (t, event_id)
    // is total, so interval bounds are deterministic even on timestamp
    // ties. At 100 TB this is the standard "rebuild the dimension from
    // the log" shape: shuffle once on the key, no self-join.
    "cdc_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("t"), col("event_id"))
      ev(s, dir).select(
        col("user_id"), col("event_type"),
        col("t").as("valid_from"),
        lead(col("t"), 1).over(w).as("valid_to"),
        Rounding.r6(col("value")).as("value"),
        lead(col("t"), 1).over(w).isNull.as("is_current"))
    }),

    // Point-in-time (PIT) join against the SCD-2 dimension: each
    // purchase picks the click-value version in effect at its
    // timestamp ([valid_from, valid_to) interval containment —
    // intervals are disjoint per user, so exactly one version wins,
    // no argmax needed). Both sides hash on user_id, so the range
    // predicate evaluates inside one aligned join.
    "join_scd2_pit" -> ((s, dir) => {
      val e = ev(s, dir)
      val dim = queries("cdc_scd2")(s, dir)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("du"), col("valid_from"),
          col("valid_to"), col("value").as("click_value"))
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("event_id"))
        .join(dim, col("user_id") === col("du")
          && col("t") >= col("valid_from")
          && (col("valid_to").isNull || col("t") < col("valid_to")))
        .select(col("user_id"), col("t"), col("event_id"),
          col("click_value"), col("valid_from"))
    }),

    // Equi-width histogram of `value` into 20 global buckets. The
    // min/max bounds are a single broadcast row; bucketing is one
    // per-row projection, so the only shuffle carries 20 bucket ids.
    // The bucket index is floor((v-mn)/(mx-mn)*20) clamped to 19 —
    // identical IEEE double ops on both engines, so bucket membership
    // can't straddle a boundary differently. The mx = mn guard covers
    // the degenerate all-equal (or single-row) column: 0/0 = NaN
    // would bucket as 0 in Spark but 19 in DuckDB (NaN sorts greatest
    // through least()).
    "agg_histogram" -> ((s, dir) => {
      val e = ev(s, dir)
      val bounds = e.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      e.crossJoin(broadcast(bounds))
        .select(when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(19L),
            floor((col("value") - col("mn")) / (col("mx") - col("mn")) * 20))
            .cast("long")).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
    }),

    // INTERSECT / EXCEPT set ops: compare the active-user sets of the
    // log's first and second halves (midpoint as in cdc_diff) and tag
    // each user both / first_only / second_only. Spark's native
    // Intersect/Except distinct operators plan as aggregates over one
    // hash exchange per side — ids only, never event rows.
    "rel_setops" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val withMid = e.crossJoin(broadcast(mid))
      val first = withMid.filter(col("t") <= col("mid")).select("user_id").distinct()
      val second = withMid.filter(col("t") > col("mid")).select("user_id").distinct()
      first.intersect(second).select(col("user_id"), lit("both").as("cohort"))
        .unionByName(first.except(second)
          .select(col("user_id"), lit("first_only").as("cohort")))
        .unionByName(second.except(first)
          .select(col("user_id"), lit("second_only").as("cohort")))
    }),

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) over each
    // half's (user, event_type) multiset — multiplicities survive, so
    // "both" rows appear min(n₁,n₂) times and the EXCEPT ALL sides
    // carry the count differences. Rolled up per (user, op) so the
    // output is deterministic counts, not row soup.
    "rel_setops_all" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val withMid = e.crossJoin(broadcast(mid))
      val first = withMid.filter(col("t") <= col("mid"))
        .select("user_id", "event_type")
      val second = withMid.filter(col("t") > col("mid"))
        .select("user_id", "event_type")
      first.intersectAll(second)
        .select(col("user_id"), col("event_type"), lit("common").as("op"))
        .unionByName(first.exceptAll(second)
          .select(col("user_id"), col("event_type"),
            lit("first_extra").as("op")))
        .unionByName(second.exceptAll(first)
          .select(col("user_id"), col("event_type"),
            lit("second_extra").as("op")))
        .groupBy("user_id", "event_type", "op")
        .agg(count(lit(1)).as("n"))
    }),

    // MERGE-INTO semantics (the write-side half of CDC, next to
    // cdc_diff's read-side): apply a change log to a base snapshot —
    // latest change wins per key, 'error' rows are tombstones
    // (DELETE), everything else upserts. Base = latest pre-midpoint
    // event per user; log = post-midpoint events. Both sides collapse
    // to ONE row/key via argmax structs riding the partial aggregates
    // (no per-key sort, no history shuffle), and the resolve join is
    // exchange-aligned on the same user_id hash — the exact shape a
    // lakehouse MERGE plans when the log is too big to broadcast.
    // Deleted keys vanish from the output (resulting-table semantics);
    // survivors carry the action that produced them.
    "cdc_merge" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val withMid = e.crossJoin(broadcast(mid))
      def latest(df: DataFrame) = df
        .groupBy("user_id")
        .agg(max(struct(col("t"), col("event_id"), col("event_type"),
          col("value"))).as("x"))
        .select(col("user_id"), col("x.t").as("t"),
          col("x.event_type").as("event_type"), col("x.value").as("value"))
      val base = latest(withMid.filter(col("t") <= col("mid")))
      val log = latest(withMid.filter(col("t") > col("mid")))
        .withColumn("op",
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
      base.as("b").join(log.as("l"), Seq("user_id"), "full_outer")
        .filter(col("l.op").isNull || col("l.op") === "U")
        .select(col("user_id"),
          when(col("l.op").isNull, lit("KEPT"))
            .when(col("b.t").isNull, lit("INSERTED"))
            .otherwise(lit("UPDATED")).as("action"),
          coalesce(col("l.t"), col("b.t")).as("version"),
          Rounding.r6(coalesce(col("l.value"), col("b.value"))).as("value"))
    }))

  val oracles: Map[String, String] = Map(

    "rel_window_suite" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id,
        |    user_id::BIGINT AS user_id, epoch_us(ts) AS t, value
        |  FROM events)
        |SELECT user_id, t, event_id,
        |  row_number() OVER w::BIGINT AS rn,
        |  rank() OVER wt::BIGINT AS rnk,
        |  dense_rank() OVER wt::BIGINT AS drnk,
        |  (round(percent_rank() OVER w, 6) + 0.0) AS prnk,
        |  (round(cume_dist() OVER w, 6) + 0.0) AS cdist,
        |  ntile(4) OVER w::BIGINT AS quartile,
        |  (round(lag(value, 1) OVER w, 6) + 0.0) AS prev_value,
        |  (round(lead(value, 1) OVER w, 6) + 0.0) AS next_value
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
        |  wt AS (PARTITION BY user_id ORDER BY t)""".stripMargin,

    "rel_window_frames" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id,
        |    user_id::BIGINT AS user_id, epoch_us(ts) AS t, value,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events)
        |SELECT user_id, t, event_id,
        |  (round((CAST(sum(c) OVER wr AS DOUBLE) / 100.0)
        |   * 1000000.0) / 1000000.0 + 0.0) AS sum_1h,
        |  count(*) OVER wr::BIGINT AS n_1h,
        |  (round(first_value(value) OVER wf * 1000000.0)
        |   / 1000000.0 + 0.0) AS first_seen,
        |  (round(nth_value(value, 3) OVER wf * 1000000.0)
        |   / 1000000.0 + 0.0) AS third_seen
        |FROM e
        |WINDOW wr AS (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "feat_hashed_cross" ->
      s"""WITH e AS (SELECT user_id::BIGINT AS user_id, event_type, value
         |  FROM events),
         |h AS (SELECT *,
         |    list_reduce(list_prepend(7::BIGINT,
         |      list_transform(regexp_extract_all(event_type, '.'),
         |        c -> unicode(c)::BIGINT)),
         |      (a, b) -> (a*131 + b) % ${graft.ext.TextOps.P}) AS ht
         |  FROM e),
         |b AS (SELECT
         |    ((ht * 31 + user_id % ${graft.ext.TextOps.P})
         |      % ${graft.ext.TextOps.P}) % 1024 AS bucket,
         |    user_id, CAST(round(value * 100) AS BIGINT) AS c FROM h)
         |SELECT bucket, count(*)::BIGINT AS n_events,
         |  count(DISTINCT user_id)::BIGINT AS n_users,
         |  sum(c)::BIGINT AS sum_cents
         |FROM b GROUP BY 1""".stripMargin,

    "agg_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id::BIGINT AS user_id,
        |    epoch_us(ts) // 604800000000 AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
        |SELECT c.cohort_wk, (u.wk - c.cohort_wk)::BIGINT AS week_offset,
        |  count(*)::BIGINT AS n_users
        |FROM uw u JOIN cohort c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "cdc_diff" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
        |    value FROM events),
        |mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM e),
        |old AS (SELECT user_id, count(*)::BIGINT AS n_old,
        |    sum(value) AS s_old
        |  FROM e, mid WHERE t <= mid GROUP BY 1),
        |new AS (SELECT user_id, count(*)::BIGINT AS n_new,
        |    sum(value) AS s_new FROM e GROUP BY 1)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  CASE WHEN o.n_old IS NULL THEN 'ADDED'
        |       WHEN n.n_new IS NULL THEN 'REMOVED'
        |       WHEN o.n_old <> n.n_new THEN 'CHANGED'
        |       ELSE 'UNCHANGED' END AS status,
        |  coalesce(o.n_old, 0)::BIGINT AS n_old, n.n_new,
        |  (round(o.s_old, 6) + 0.0) AS sum_old,
        |  (round(n.s_new, 6) + 0.0) AS sum_new
        |FROM old o FULL OUTER JOIN new n USING (user_id)""".stripMargin,

    "dedup_latest" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id,
        |    user_id::BIGINT AS user_id, event_type, epoch_us(ts) AS t,
        |    value FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY t DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_type, t, event_id,
        |  (round(value, 6) + 0.0) AS value
        |FROM r WHERE rn = 1""".stripMargin,

    "cdc_scd2" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id,
        |    user_id::BIGINT AS user_id, event_type, epoch_us(ts) AS t,
        |    value FROM events)
        |SELECT user_id, event_type, t AS valid_from,
        |  lead(t, 1) OVER w AS valid_to,
        |  (round(value, 6) + 0.0) AS value,
        |  lead(t, 1) OVER w IS NULL AS is_current
        |FROM e
        |WINDOW w AS (PARTITION BY user_id, event_type
        |  ORDER BY t, event_id)""".stripMargin,

    "join_scd2_pit" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id,
        |    user_id::BIGINT AS user_id, event_type, epoch_us(ts) AS t,
        |    value FROM events),
        |dim AS (SELECT user_id AS du, t AS valid_from,
        |    lead(t, 1) OVER (PARTITION BY user_id, event_type
        |      ORDER BY t, event_id) AS valid_to,
        |    (round(value, 6) + 0.0) AS click_value
        |  FROM e WHERE event_type = 'click'),
        |fact AS (SELECT user_id, t, event_id FROM e
        |  WHERE event_type = 'purchase')
        |SELECT f.user_id, f.t, f.event_id, d.click_value, d.valid_from
        |FROM fact f JOIN dim d ON f.user_id = d.du
        |  AND f.t >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.t < d.valid_to)""".stripMargin,

    "agg_histogram" ->
      """WITH e AS (SELECT value FROM events),
        |b AS (SELECT min(value) AS mn, max(value) AS mx FROM e)
        |SELECT CASE WHEN b.mx = b.mn THEN 0
        |    ELSE least(19, floor((e.value - b.mn) / (b.mx - b.mn) * 20))::BIGINT
        |  END AS bucket,
        |  count(*)::BIGINT AS n
        |FROM e, b GROUP BY 1""".stripMargin,

    "rel_setops" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t
        |    FROM events),
        |mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM e),
        |f AS (SELECT DISTINCT user_id FROM e, mid WHERE t <= mid),
        |s AS (SELECT DISTINCT user_id FROM e, mid WHERE t > mid)
        |SELECT user_id, 'both' AS cohort FROM (SELECT user_id FROM f INTERSECT SELECT user_id FROM s)
        |UNION ALL
        |SELECT user_id, 'first_only' AS cohort FROM (SELECT user_id FROM f EXCEPT SELECT user_id FROM s)
        |UNION ALL
        |SELECT user_id, 'second_only' AS cohort FROM (SELECT user_id FROM s EXCEPT SELECT user_id FROM f)""".stripMargin,

    "rel_setops_all" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id, event_type,
        |    epoch_us(ts) AS t FROM events),
        |mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM e),
        |f AS (SELECT user_id, event_type FROM e, mid WHERE t <= mid),
        |s AS (SELECT user_id, event_type FROM e, mid WHERE t > mid),
        |u AS (
        |  SELECT user_id, event_type, 'common' AS op FROM
        |    (SELECT * FROM f INTERSECT ALL SELECT * FROM s)
        |  UNION ALL
        |  SELECT user_id, event_type, 'first_extra' FROM
        |    (SELECT * FROM f EXCEPT ALL SELECT * FROM s)
        |  UNION ALL
        |  SELECT user_id, event_type, 'second_extra' FROM
        |    (SELECT * FROM s EXCEPT ALL SELECT * FROM f))
        |SELECT user_id, event_type, op, count(*)::BIGINT AS n
        |FROM u GROUP BY 1, 2, 3""".stripMargin,

    "cdc_merge" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id,
        |    user_id::BIGINT AS user_id, event_type, epoch_us(ts) AS t,
        |    value FROM events),
        |mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM e),
        |base AS (SELECT user_id, t, event_type, value FROM (
        |    SELECT e.*, row_number() OVER (PARTITION BY user_id
        |      ORDER BY t DESC, event_id DESC) AS rn
        |    FROM e, mid WHERE t <= mid) WHERE rn = 1),
        |log AS (SELECT user_id, t, value,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM (
        |    SELECT e.*, row_number() OVER (PARTITION BY user_id
        |      ORDER BY t DESC, event_id DESC) AS rn
        |    FROM e, mid WHERE t > mid) WHERE rn = 1)
        |SELECT coalesce(b.user_id, l.user_id) AS user_id,
        |  CASE WHEN l.op IS NULL THEN 'KEPT'
        |       WHEN b.t IS NULL THEN 'INSERTED'
        |       ELSE 'UPDATED' END AS action,
        |  coalesce(l.t, b.t) AS version,
        |  (round(coalesce(l.value, b.value), 6) + 0.0) AS value
        |FROM base b FULL OUTER JOIN log l USING (user_id)
        |WHERE l.op IS NULL OR l.op = 'U'""".stripMargin)
}
