package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query surface (scan → filter → join → aggregate → top-k).
  *
  * The reference itself has no joins/aggregations beyond unions
  * (SURVEY.md §2 "no joins ... exist in the reference"), but the engine
  * inherits the full Spark SQL relational algebra; these queries pin that
  * surface against the DuckDB oracle and double as the benchmark's
  * headline scan/join/agg workload.
  *
  * Scale notes (100 TB design point): only genuinely BOUNDED relations
  * (nation, region, one-row global aggregates) carry an explicit
  * `broadcast()` hint. SF-scaling sides (orders, customer, supplier,
  * part and their keyed rollups) are left hint-free so size-based
  * selection + AQE broadcast them at gate SFs but degrade to shuffled
  * joins at 100× instead of OOMing the driver (r13 verdict). Aggregates
  * are partial (map-side combine) by construction; all double
  * aggregates are rounded identically on both engines so segment-tree
  * vs fold summation order can't flip the hash compare.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Leaf groups for the rollup/cube/grouping-sets family: one ordinary
    * groupBy over the finest key combination, carrying re-aggregable
    * partials (sum, count). The multi-set expansion then runs over these
    * few rows instead of the raw scan. */
  private def leafAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("c"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: full scan, group-by on two low-card
    // keys — partial aggregation makes this shuffle ~12 rows at any scale.
    "q1_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Rounding.r4(sum(col("l_quantity"))).as("sum_qty"),
          Rounding.r4(sum(col("l_extendedprice"))).as("sum_base_price"),
          Rounding.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
          Rounding.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")))).as("sum_charge"),
          Rounding.r6(avg(col("l_quantity"))).as("avg_qty"),
          Rounding.r6(avg(col("l_extendedprice"))).as("avg_price"),
          Rounding.r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q3-shaped: selective dim filter → two joins → agg → top-k.
    // customer/orders are SF-scaling — no hint; AQE broadcasts them at
    // gate SFs and shuffles at 100×. Top-k ordered on the rounded
    // measure + unique key so the limit is deterministic.
    "q3_revenue_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord.join(cust,
          ord("o_custkey") === cust("c_custkey")), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Rounding.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped: five-way join. nation/region (bounded) broadcast
    // by hint; supplier/orders/customer are SF-scaling and hint-free —
    // broadcast at gate SFs by size, shuffled equi-joins at 100×.
    "q5_nation_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey")
          && cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Rounding.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),

    // TPC-H Q7 shape — cross-nation trade flow: supplier nation ≠
    // customer nation, revenue per (supp_nation, cust_nation,
    // ship-year). Same posture as q5: the two nation legs broadcast by
    // hint; supplier/orders/customer join hint-free (AQE decides).
    "q7_nation_trade" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val sup = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(Rounding.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),

    // TPC-H Q10 shape — top returned-revenue customers: returnflag='R'
    // lineitems joined through orders to customer+nation, top 20 by
    // revenue. nation broadcasts by hint; orders/customer hint-free
    // (SF-scaling); the top-20 is a TakeOrdered with a full
    // deterministic tiebreak.
    "q10_returned_items" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val nation = t(s, dir, "nation")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Rounding.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Grouping-sets/rollup surface (free from Spark SQL; SURVEY.md §2).
    // ROLLUP/CUBE/GROUPING SETS all pre-aggregate to the LEAF groups
    // first, then expand only the partials: a naive .cube() plans
    // Expand BEFORE the partial aggregate, multiplying every input row
    // by the number of grouping sets (3-4× the scan's rows through the
    // CPU at 100 TB). sum/count re-aggregate losslessly from leaves,
    // so Expand here touches |distinct key combos| rows, not the data.
    "agg_rollup" -> ((s, dir) => {
      leafAgg(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(Rounding.r4(sum(col("sq"))).as("sum_qty"),
          // coalesce keeps empty-input semantics identical to the raw
          // (non-pre-aggregated) form: over zero leaf rows the grand
          // total's count is 0, but sum over them is NULL.
          coalesce(sum(col("c")), lit(0L)).as("n"))
    }),

    // CUBE completes the grouping-sets family (all 4 key subsets).
    "agg_cube" -> ((s, dir) => {
      leafAgg(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(Rounding.r4(sum(col("sq"))).as("sum_qty"),
          // coalesce keeps empty-input semantics identical to the raw
          // (non-pre-aggregated) form: over zero leaf rows the grand
          // total's count is 0, but sum over them is NULL.
          coalesce(sum(col("c")), lit(0L)).as("n"))
    }),

    // Event-stream daily aggregate (time-bucketed analytics on `events`).
    // countDistinct alongside plain aggregates plans an Expand that
    // doubles every input row; the manual two-phase form — partials per
    // (type, day, user), then fold — computes identical values with one
    // full-width shuffle and no row duplication. The second groupBy
    // reuses the first's hash partitioning prefix only logically (keys
    // differ), but its input is already one row per user — tiny.
    // Null contract (matches the oracle's count(1)/avg(value)/
    // count(DISTINCT user_id)): a NULL user_id forms its own phase-1
    // group — its rows still count toward n_events and the sums but the
    // group is excluded from n_users; the avg denominator is the count
    // of NON-null values, not the row count.
    "agg_events_daily" -> ((s, dir) => {
      val per = EventBars.events(s, dir)
        .groupBy(col("event_type"),
          to_date(timestamp_micros(col("t"))).as("day"), col("user_id"))
        .agg(count(lit(1)).as("c"), sum(col("value")).as("sv"),
          count(col("value")).as("cv"))
      per.groupBy("event_type", "day")
        .agg(sum(col("c")).as("n_events"),
          Rounding.r4(sum(col("sv"))).as("sum_value"),
          Rounding.r6(sum(col("sv")) / sum(col("cv"))).as("avg_value"),
          count(col("user_id")).as("n_users"))
    }),

    // Semi/anti-join surface: customers with and without open orders.
    "join_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val open = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      val withOpen = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("HAS_OPEN").as("status"))
      val noOpen = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("NO_OPEN").as("status"))
      withOpen.unionByName(noOpen)
    }),

    // G1: distinct key extraction (data_indicators.py:48).
    "rel_distinct" -> ((s, dir) =>
      EventBars.events(s, dir)
        .select(col("user_id").cast("string").as("ticker")).distinct()),

    // G5: wide→long unpivot (the yfinance MultiIndex flattening,
    // data_download_yahoo.py:27-64) via codegen'd stack().
    "rel_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem").selectExpr("l_orderkey", "l_linenumber",
        "stack(4, 'quantity', (round((l_quantity) * 1000000.0) / 1000000.0 + 0.0), " +
          "'extendedprice', (round((l_extendedprice) * 1000000.0) / 1000000.0 + 0.0), " +
          "'discount', (round((l_discount) * 1000000.0) / 1000000.0 + 0.0), " +
          "'tax', (round((l_tax) * 1000000.0) / 1000000.0 + 0.0)) AS (measure, value)")),

    // Skew pattern: two-phase salted aggregation. Phase 1 spreads a hot
    // low-cardinality key over 16 salt buckets (map-side partials land
    // on 16 reducers instead of 1); phase 2 folds the partials. Result
    // is identical to a plain groupBy — that's the oracle.
    "agg_salted" -> ((s, dir) => {
      val phase1 = EventBars.events(s, dir)
        .withColumn("_salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
      phase1.groupBy("event_type")
        .agg(sum("pn").as("n_events"),
          Rounding.r4(sum("psum")).as("sum_value"))
    }),

    // Exact interpolated quantiles (linear interpolation over the sorted
    // values ≡ DuckDB quantile_cont). Sort-based instead of Spark's
    // `percentile` ObjectAggregate, which buffers every value per group
    // on one reducer thread and dominated the bench: one exchange+sort
    // (WindowExec) ranks the rows, then picking the bracketing rows per
    // quantile is a codegen'd hash aggregate that reuses the window's
    // partitioning — no second exchange, no object buffers.
    "agg_quantiles" -> ((s, dir) =>
      ExactQuantile.grouped(t(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice",
          Seq(0.25 -> "_q25", 0.5 -> "_q50", 0.75 -> "_q75"),
          checkpoint = false)
        .select(col("l_returnflag"),
          Rounding.r4(col("_q25")).as("p25"),
          Rounding.r4(col("_q50")).as("p50"),
          Rounding.r4(col("_q75")).as("p75"))),

    // The grouped-quantile edge-case pin: a 90/10 synthetic skew — one
    // "hot" group holding ~90% of all events beside ~997 "cold" groups,
    // many of them 1-row (or smaller than the bucket count). The hot
    // group exercises the range-bucket split (it spans ~0.9·P cells, no
    // single-task sort); the cold tail exercises groups whose every row
    // lands in one cell and n==1 interpolation (p25==p50==p75==value).
    "agg_quantiles_skew" -> ((s, dir) => {
      val e = EventBars.events(s, dir)
        .filter(col("value").isNotNull)
        .select(
          when(col("event_id").cast("long") % 10 < 9, lit("hot"))
            .otherwise(concat(lit("cold_"),
              (col("event_id").cast("long") % 997).cast("string"))).as("g"),
          col("value"))
      ExactQuantile.grouped(e, "g", "value",
          Seq(0.25 -> "_q25", 0.5 -> "_q50", 0.75 -> "_q75"),
          checkpoint = false)
        .select(col("g"),
          Rounding.r4(col("_q25")).as("p25"),
          Rounding.r4(col("_q50")).as("p50"),
          Rounding.r4(col("_q75")).as("p75"))
    }),

    // Feature prep: per-group z-score normalization. Stats via groupBy
    // (map-side partials; result = one row per group) broadcast back —
    // NOT a whole-partition window, which would funnel each group of a
    // low-cardinality key through a single task at scale.
    "feat_zscore" -> ((s, dir) => {
      val e = EventBars.events(s, dir)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("value"))
      val stats = e.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
      e.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          Rounding.r6(expr("try_divide(value - mu, sd)")).as("z"))
    }),

    // Feature prep: winsorization — clip each value to its group's
    // [p05, p95]. Thresholds via the shared distributed grouped exact
    // quantile (one row per group — bit-equal to the old whole-group
    // window rank, but no task ever sorts a whole group), broadcast
    // back onto the events for a scan-local clip.
    "feat_winsorize" -> ((s, dir) => {
      val e = EventBars.events(s, dir)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("value"))
      val q = ExactQuantile.grouped(e, "event_type", "value",
        Seq(0.05 -> "_q05", 0.95 -> "_q95"), checkpoint = false)
      e.join(broadcast(q), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          Rounding.r6(least(greatest(col("value"), col("_q05")),
            col("_q95"))).as("clipped"))
    }),

    // Spark's native session_window: per-user activity sessions with a
    // 30-minute inactivity gap (the streaming-capable cousin of F1's
    // gaps-and-islands; oracle = classic islands SQL).
    "agg_sessions" -> ((s, dir) =>
      EventBars.events(s, dir)
        .withColumn("ts2", timestamp_micros(col("t")))
        .groupBy(col("user_id").cast("long").as("user_id"),
          session_window(col("ts2"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          Rounding.r4(sum(col("value"))).as("sum_value"))
        .select(col("user_id"),
          expr("CAST(unix_micros(session_window.start) AS BIGINT)").as("session_start"),
          col("n_events"), col("sum_value"))),

    // Hopping (sliding) windows via Spark's native window(): 10-minute
    // windows sliding every 5 — each event lands in exactly two. The
    // oracle expands the same two aligned starts with integer math.
    "agg_hopping" -> ((s, dir) =>
      EventBars.events(s, dir)
        .groupBy(window(timestamp_micros(col("t")), "10 minutes", "5 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Rounding.r4(sum(col("value"))).as("sum_value"))
        .select(
          expr("CAST(unix_micros(window.start) AS BIGINT)").as("wstart"),
          col("event_type"), col("n_events"), col("sum_value"))),

    // Long→wide pivot (inverse of rel_unpivot): event counts per type.
    "rel_pivot" -> ((s, dir) =>
      EventBars.events(s, dir)
        .groupBy(col("user_id").cast("long").as("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // ISO week-of-year (the reference's dead get_week_year helper,
    // utils.py:110-121): weekly event rollup on ISO (year, week).
    "agg_isoweek" -> ((s, dir) =>
      EventBars.events(s, dir)
        .select(expr("CAST(extract(yearofweek FROM timestamp_micros(t)) AS BIGINT)").as("iso_year"),
          weekofyear(timestamp_micros(col("t"))).cast("long").as("iso_week"),
          col("value"))
        .groupBy("iso_year", "iso_week")
        .agg(count(lit(1)).as("n_events"),
          Rounding.r4(sum(col("value"))).as("sum_value"))),

    // GROUPING SETS — the general form cube/rollup specialize. Spark 4's
    // native groupingSets API plans the same single-pass Expand as cube,
    // reading the input once for all three granularities.
    "agg_grouping_sets" -> ((s, dir) =>
      leafAgg(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty[Column]),
          col("l_returnflag"), col("l_linestatus"))
        .agg(Rounding.r4(sum(col("sq"))).as("sum_qty"),
          // coalesce keeps empty-input semantics identical to the raw
          // (non-pre-aggregated) form: over zero leaf rows the grand
          // total's count is 0, but sum over them is NULL.
          coalesce(sum(col("c")), lit(0L)).as("n"))),

    // Ordered event funnel (view → click → purchase per user): earliest
    // view, earliest click at-or-after it, earliest purchase at-or-after
    // that. Each step filters THEN aggregates to one row per user before
    // joining, so the joins are tiny and all hash-partition on user_id —
    // the per-step exchanges align and no step ever shuffles raw events
    // more than once. At 100 TB this beats any collect_list-per-user
    // formulation (no user's history is ever materialized as one row).
    "agg_funnel" -> ((s, dir) => {
      val ev = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"), col("t"),
          col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("t").as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").where(col("t") >= col("t_view"))
        .groupBy("user_id").agg(min("t").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").where(col("t") >= col("t_click"))
        .groupBy("user_id").agg(min("t").as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (lit(1L)
            + when(col("t_click").isNotNull, 1L).otherwise(0L)
            + when(col("t_purchase").isNotNull, 1L).otherwise(0L))
            .as("steps"))
    }),

    // Range join WITHOUT an equi-key, the shape that naively plans a
    // BroadcastNestedLoopJoin: attach every event to each traffic-spike
    // window containing it ([spike minute − 90 s, + 150 s); spike =
    // minute with ≥ 2× the mean per-minute event count). Distributed
    // formulation: explode each interval into the minute buckets it
    // covers (bounded: 5/interval), EQUI-join points to intervals on the
    // bucket, then apply the exact containment as a residual filter —
    // shuffle is O(points + 5·intervals), per-task work is bucket-local,
    // and no nested-loop join exists at any scale. (This is the bucketed
    // range-join scheme Spark itself lacks as a native operator.)
    "join_range_points" -> ((s, dir) => {
      val ev = EventBars.events(s, dir).select(col("event_id"), col("t"))
      val counts = ev.groupBy(expr("t div 60000000").as("mnt"))
        .agg(count(lit(1)).as("n"))
      val meanN = counts.agg(avg(col("n")).as("an"))
      val spikes = counts.join(broadcast(meanN))
        .filter(col("n") >= lit(2.0) * col("an"))
        .select((col("mnt") * 60000000L).as("spike_start"),
          (col("mnt") * 60000000L - 90000000L).as("lo"),
          (col("mnt") * 60000000L + 150000000L).as("hi"),
          col("n").as("n_spike"))
        .withColumn("bkt",
          explode(expr("sequence(lo div 60000000, (hi - 1) div 60000000)")))
      ev.withColumn("bkt", expr("t div 60000000"))
        .join(spikes, "bkt")
        .where(col("t") >= col("lo") && col("t") < col("hi"))
        .select(col("event_id"), col("t"), col("spike_start"), col("n_spike"))
    }),

    // Interval-OVERLAP join (two interval sets, not point-in-interval):
    // per-user daily activity intervals × per-type daily activity
    // intervals, paired wherever they overlap in time. The non-equi
    // overlap predicate (a.lo ≤ b.hi AND b.lo ≤ a.hi) would plan as a
    // nested-loop join; instead both sides replicate to the 1-hour
    // bins they touch and EQUI-join on the bin, with exact overlap as
    // a residual. A pair overlapping k shared bins would surface k
    // times — each pair is emitted only from the bin that contains
    // greatest(lo_a, lo_b) (the overlap's first instant, which both
    // sides' bin ranges provably cover), so no distinct() reshuffles
    // the matches. Shuffle is O(intervals · bins-per-interval), never
    // O(pairs); bin width trades replication against bucket fan-in.
    "join_interval" -> ((s, dir) => {
      val W = 3600000000L // 1-hour bins
      val e = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"),
          col("event_type"), col("t"), expr("t div 86400000000").as("day"))
      def spans(df: DataFrame, keys: Seq[String]) = df
        .groupBy(keys.map(col): _*)
        .agg(min(col("t")).as("lo"), max(col("t")).as("hi"),
          count(lit(1)).as("n"))
        .withColumn("bkt",
          explode(expr(s"sequence(lo div $W, hi div $W)")))
      val users = spans(e, Seq("user_id", "day"))
        .select(col("bkt"), col("user_id"), col("lo").as("u_lo"),
          col("hi").as("u_hi"), col("n").as("n_user"))
      val types = spans(e, Seq("event_type", "day"))
        .select(col("bkt"), col("event_type"), col("lo").as("t_lo"),
          col("hi").as("t_hi"), col("n").as("n_type"))
      users.join(types, "bkt")
        .where(col("u_lo") <= col("t_hi") && col("t_lo") <= col("u_hi")
          && col("bkt") === expr(s"greatest(u_lo, t_lo) div $W"))
        .select(col("user_id"), col("event_type"),
          col("u_lo"), col("u_hi"), col("n_user"), col("n_type"),
          (least(col("u_hi"), col("t_hi"))
            - greatest(col("u_lo"), col("t_lo"))).as("overlap_us"))
    }),

    // Skew-salted JOIN (completing the skew toolkit agg_salted starts):
    // event_type has 5 values, so each key is ~20% of the big side — a
    // plain shuffle join puts a fifth of the table in one task. The
    // salted form spreads every key over 8 shards; the shuffle-hash
    // hint forces the shuffle path the technique exists for (stats
    // would otherwise broadcast this small dim and hide the skew).
    "join_skew_salted" -> ((s, dir) => {
      val ev = EventBars.events(s, dir)
        .select(col("event_id"), col("event_type"),
          Rounding.r6(col("value")).as("value"))
      val dim = EventBars.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("n_type"))
        .hint("shuffle_hash")
      graft.ext.SaltedJoin(ev, dim, Seq("event_type"), 8)
    }),

    // Ranking-window surface: top-3 events per type by value.
    "agg_topk_per_group" -> ((s, dir) =>
      EventBars.events(s, dir)
        .withColumn("rnk", expr(
          "CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT)"))
        .filter(col("rnk") <= 3)
        .select(col("event_type"), col("event_id"), col("rnk"),
          Rounding.r6(col("value")).as("value"))))

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  (round(sum(l_quantity), 4) + 0.0) AS sum_qty,
        |  (round(sum(l_extendedprice), 4) + 0.0) AS sum_base_price,
        |  (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS sum_disc_price,
        |  (round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) + 0.0) AS sum_charge,
        |  (round(avg(l_quantity), 6) + 0.0) AS avg_qty,
        |  (round(avg(l_extendedprice), 6) + 0.0) AS avg_price,
        |  (round(avg(l_discount), 6) + 0.0) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0)
        |    AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  (round(sum(l_quantity), 4) + 0.0) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  (round(sum(l_quantity), 4) + 0.0) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "agg_events_daily" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n_events,
        |  (round(sum(value), 4) + 0.0) AS sum_value,
        |  (round(avg(value), 6) + 0.0) AS avg_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY event_type, CAST(ts AS DATE)""".stripMargin,

    "join_semi_anti" ->
      """SELECT c_custkey, 'HAS_OPEN' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |UNION ALL
        |SELECT c_custkey, 'NO_OPEN' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "rel_distinct" ->
      "SELECT DISTINCT CAST(user_id AS VARCHAR) AS ticker FROM events",

    "rel_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
        |  (round(l_quantity, 6) + 0.0) AS value FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'extendedprice',
        |  (round(l_extendedprice, 6) + 0.0) FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'discount',
        |  (round(l_discount, 6) + 0.0) FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'tax',
        |  (round(l_tax, 6) + 0.0) FROM lineitem""".stripMargin,

    "agg_salted" ->
      """SELECT event_type, count(*) AS n_events,
        |  (round(sum(value), 4) + 0.0) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_quantiles" ->
      """SELECT l_returnflag,
        |  (round(quantile_cont(l_extendedprice, 0.25), 4) + 0.0) AS p25,
        |  (round(quantile_cont(l_extendedprice, 0.5), 4) + 0.0) AS p50,
        |  (round(quantile_cont(l_extendedprice, 0.75), 4) + 0.0) AS p75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "agg_quantiles_skew" ->
      """WITH e AS (SELECT CASE WHEN event_id::BIGINT % 10 < 9 THEN 'hot'
        |    ELSE 'cold_' || (event_id::BIGINT % 997)::VARCHAR END AS g, value
        |  FROM events WHERE value IS NOT NULL)
        |SELECT g,
        |  (round(quantile_cont(value, 0.25), 4) + 0.0) AS p25,
        |  (round(quantile_cont(value, 0.5), 4) + 0.0) AS p50,
        |  (round(quantile_cont(value, 0.75), 4) + 0.0) AS p75
        |FROM e GROUP BY g""".stripMargin,

    "feat_zscore" ->
      """SELECT event_id::BIGINT AS event_id, event_type,
        |  (round((value - avg(value) OVER (PARTITION BY event_type))
        |       / stddev_samp(value) OVER (PARTITION BY event_type), 6) + 0.0) AS z
        |FROM events""".stripMargin,

    "feat_winsorize" ->
      """SELECT event_id::BIGINT AS event_id, event_type,
        |  (round(least(greatest(value,
        |      quantile_cont(value, 0.05) OVER (PARTITION BY event_type)),
        |      quantile_cont(value, 0.95) OVER (PARTITION BY event_type)), 6) + 0.0)
        |    AS clipped
        |FROM events""".stripMargin,

    "agg_sessions" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t, value
        |  FROM events),
        |g AS (SELECT *, CASE WHEN t - lag(t) OVER w >= 1800000000 OR
        |    lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
        |SELECT user_id, min(t)::BIGINT AS session_start,
        |  count(*) AS n_events, (round(sum(value), 4) + 0.0) AS sum_value
        |FROM i GROUP BY user_id, sid""".stripMargin,

    "agg_hopping" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value FROM events),
        |x AS (SELECT event_type, value,
        |    unnest([t - (t % 300000000) - 300000000, t - (t % 300000000)]) AS wstart
        |  FROM e)
        |SELECT wstart::BIGINT AS wstart, event_type,
        |  count(*) AS n_events, (round(sum(value), 4) + 0.0) AS sum_value
        |FROM x GROUP BY wstart, event_type""".stripMargin,

    "rel_pivot" ->
      """SELECT user_id::BIGINT AS user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1""".stripMargin,

    "agg_isoweek" ->
      """SELECT isoyear(ts)::BIGINT AS iso_year, week(ts)::BIGINT AS iso_week,
        |  count(*) AS n_events, (round(sum(value), 4) + 0.0) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  (round(sum(l_quantity), 4) + 0.0) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin,

    "agg_funnel" ->
      """WITH ev AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
        |    event_type FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.t) AS t_click FROM ev e
        |  JOIN v ON e.user_id = v.user_id AND e.t >= v.t_view
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.t) AS t_purchase FROM ev e
        |  JOIN c ON e.user_id = c.user_id AND e.t >= c.t_click
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
        |  (1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END)::BIGINT AS steps
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,

    "join_range_points" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |m AS (SELECT t // 60000000 AS mnt, count(*)::BIGINT AS n
        |  FROM ev GROUP BY 1),
        |a AS (SELECT avg(n) AS an FROM m),
        |sp AS (SELECT mnt * 60000000 AS spike_start,
        |    mnt * 60000000 - 90000000 AS lo, mnt * 60000000 + 150000000 AS hi,
        |    n AS n_spike
        |  FROM m, a WHERE n >= 2.0 * an)
        |SELECT e.event_id, e.t, s.spike_start, s.n_spike
        |FROM ev e JOIN sp s ON e.t >= s.lo AND e.t < s.hi""".stripMargin,

    "join_interval" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id, event_type,
        |    epoch_us(ts) AS t, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |u AS (SELECT user_id, day, min(t) AS u_lo, max(t) AS u_hi,
        |    count(*)::BIGINT AS n_user FROM e GROUP BY 1, 2),
        |ty AS (SELECT event_type, day, min(t) AS t_lo, max(t) AS t_hi,
        |    count(*)::BIGINT AS n_type FROM e GROUP BY 1, 2)
        |SELECT u.user_id, ty.event_type, u.u_lo, u.u_hi, u.n_user,
        |  ty.n_type, least(u.u_hi, ty.t_hi) - greatest(u.u_lo, ty.t_lo)
        |    AS overlap_us
        |FROM u JOIN ty ON u.u_lo <= ty.t_hi AND ty.t_lo <= u.u_hi""".stripMargin,

    "join_skew_salted" ->
      """WITH d AS (SELECT event_type, count(*) AS n_type
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, (round(e.value, 6) + 0.0) AS value,
        |  d.n_type
        |FROM events e JOIN d USING (event_type)""".stripMargin,

    "agg_topk_per_group" ->
      """WITH r AS (SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id)::BIGINT AS rnk,
        |    (round(value, 6) + 0.0) AS value
        |  FROM events)
        |SELECT event_type, event_id, rnk, value FROM r WHERE rnk <= 3""".stripMargin)
}
