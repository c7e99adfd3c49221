package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second behavioral batch: the engagement/health dashboard layer —
  * DAU/WAU/MAU with stickiness, weekly churn states, power-user
  * deciles, market-basket brand affinity, and inter-event-time
  * distributions.
  *
  * Scale notes: active-user counts collapse to DISTINCT (user, day)
  * pairs FIRST, then the trailing 7/30-day windows come from a bounded
  * calendar explode of those pairs (×7/×30 of the already-collapsed
  * pair set — never of raw events); the day-keyed rollup joins are
  * broadcast. Churn and inter-event windows ride one user exchange.
  * Basket pairs distinct (order, brand) before the self-join, so the
  * pair blowup is bounded by the brand alphabet (~25), not basket
  * size; the deciles/summary tables rank already-aggregated key-level
  * rows. Everything crossing a shuffle is an exact integer; divisions
  * are textually mirrored double casts of those integers.
  */
object Behavior2Queries {

  private val r6 = Rounding.r6 _

  private val DayUs = 86400000000L
  private val WeekUs = 604800000000L

  private def ev(s: SparkSession, dir: String): DataFrame =
    EventBars.events(s, dir).select(
      col("user_id").cast("long").as("user_id"), col("t"),
      col("event_id"), col("event_type"))

  private val evDuck =
    """ev AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
      |  event_id, event_type FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DAU / trailing-7 WAU / trailing-30 MAU / stickiness per active
    // day. The ×7 and ×30 calendar explodes run over distinct
    // (user, day) pairs; rollups join broadcast on the day key.
    "behav_dau_mau" -> ((s, dir) => {
      val ud = ev(s, dir)
        .select(col("user_id"), expr(s"t div $DayUs").as("day")).distinct()
      def trailing(k: Int, out: String): DataFrame = ud
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + lit(k - 1))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as(out))
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      dau
        .join(broadcast(trailing(7, "wau")), "day")
        .join(broadcast(trailing(30, "mau")), "day")
        .select(col("day"), col("dau"), col("wau"), col("mau"),
          r6(col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"))
    }),

    // Weekly lifecycle states: per week, active / new / retained /
    // resurrected counts, plus how many of this week's actives churn
    // (no activity next week). All integer arithmetic; the O(weeks)
    // aggregate materializes once and "next week's retained" is a
    // broadcast self-join on wk+1 — the lead() without the
    // unpartitioned window (a join miss IS the null lead of the last
    // week).
    "behav_churn" -> ((s, dir) => {
      val uw = ev(s, dir)
        .select(col("user_id"), expr(s"t div $WeekUs").as("wk")).distinct()
      val st = uw
        .withColumn("prev",
          lag(col("wk"), 1).over(Window.partitionBy("user_id").orderBy("wk")))
      val weekly = st.groupBy("wk").agg(
        count(lit(1)).as("n_active"),
        count(when(col("prev").isNull, lit(1))).as("n_new"),
        count(when(col("prev") === col("wk") - 1L, lit(1))).as("n_retained"),
        count(when(col("prev").isNotNull && col("prev") < col("wk") - 1L,
          lit(1))).as("n_resurrected"))
        .localCheckpoint()
      val nxt = weekly.select((col("wk") - 1L).as("wk"),
        col("n_retained").as("_nr_next"))
      weekly.join(broadcast(nxt), Seq("wk"), "left")
        .withColumn("n_churned", col("n_active") - col("_nr_next"))
        .drop("_nr_next")
    }),

    // Power-user deciles: users ranked by event count into 10 buckets
    // via the distributed exact rank (bit-equal to ntile over
    // (n, user_id), range-bucketed so no single-partition stage); per
    // decile, user count, event mass, and share of all events (the
    // event total is a free by-product of the rank's offsets job —
    // a driver literal, not a window).
    "behav_power_users" -> ((s, dir) => {
      val uc = ev(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
        .localCheckpoint()
      val r = DistRank.rowNumber(uc, "_rk", col("n_events"),
        Seq(col("n_events"), col("user_id")), totalCols = Seq("n_events"))
      r.df
        .withColumn("decile", DistRank.ntileOf(col("_rk"), r.n, 10))
        .groupBy("decile").agg(
          count(lit(1)).as("n_users"),
          sum(col("n_events")).as("events"))
        .select(col("decile"), col("n_users"), col("events"),
          r6(col("events").cast("double")
            / lit(r.sums("n_events")).cast("double")).as("event_share"))
    }),

    // Market-basket brand affinity over orders: ONE order-key exchange
    // builds each order's sorted distinct brand set (broadcast part
    // join feeds it), then pairs are generated IN-ROW from the array
    // (codegen'd transform/slice HOFs — no self-join, so no second big
    // exchange at 100 TB); support and lift from exact counts. The
    // basket table feeds THREE consumers (order total, per-brand
    // counts, pair counts), so it is checkpointed once — without it
    // each consumer replays the lineitem join + collect_set exchange.
    "basket_pairs" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val pt = s.read.parquet(s"$dir/part.parquet")
      val ob = li.join(broadcast(pt),
          li("l_partkey") === pt("p_partkey"))
        .groupBy(col("l_orderkey").as("okey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
        .localCheckpoint()
      val nOrders = ob.agg(count(lit(1)).as("n_orders"))
      val nb = ob.select(explode(col("bs")).as("p_brand"))
        .groupBy("p_brand").agg(count(lit(1)).as("n_b"))
      ob.select(explode(expr(
          "flatten(transform(bs, (x, i) -> transform(" +
            "slice(bs, i + 2, size(bs)), y -> named_struct('a', x, 'b', y))))"))
          .as("p"))
        .select(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
        .join(broadcast(nb.select(col("p_brand").as("brand_a"),
          col("n_b").as("n_a"))), "brand_a")
        .join(broadcast(nb.select(col("p_brand").as("brand_b"),
          col("n_b").as("n_bb"))), "brand_b")
        .crossJoin(broadcast(nOrders))
        .select(col("brand_a"), col("brand_b"), col("n_ab"),
          r6(col("n_ab").cast("double") / col("n_orders").cast("double"))
            .as("support"),
          r6(col("n_ab").cast("double") * col("n_orders").cast("double")
            / (col("n_a").cast("double") * col("n_bb").cast("double")))
            .as("lift"))
    }),

    // Inter-event-time distribution per event type: consecutive-event
    // gaps within each user's stream (exact integer micros), then the
    // shared quantile_cont-bit-equal kernel; seconds conversion happens
    // AFTER interpolation so the r6 gate sits far above quantile ulps.
    // Funnel conversion LATENCY by signup cohort day: per user the
    // first view and the first purchase strictly after it; the
    // view→purchase delay distribution (p50/p90, exact interpolated
    // quantiles) per first-view day — the drift curve growth teams
    // watch, where agg_funnel only counts stage hits. Both firsts are
    // min aggregates (map-side combinable); the 30-value cohort key
    // rides the range-bucketed grouped quantile, never a whole-cohort
    // window.
    "behav_funnel_latency" -> ((s, dir) => {
      val e = ev(s, dir)
      val fv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("t")).as("tv"))
      val lat = e.filter(col("event_type") === "purchase")
        .join(fv, Seq("user_id"))
        .filter(col("t") > col("tv"))
        .groupBy("user_id")
        .agg(min(col("t")).as("tp"), min(col("tv")).as("tv0"))
        .withColumn("cohort_day",
          expr("CAST(tv0 DIV 86400000000L AS BIGINT) - 19723L"))
        .withColumn("latd", (col("tp") - col("tv0")).cast("double"))
        .localCheckpoint()
      val q = ExactQuantile.grouped(lat, "cohort_day", "latd",
        Seq(0.5 -> "q50", 0.9 -> "q90"), checkpoint = false)
      lat.groupBy("cohort_day").agg(count(lit(1)).as("n_converted"))
        .join(broadcast(q), "cohort_day")
        .select(col("cohort_day"), col("n_converted"),
          r6(col("q50") / lit(1e6)).as("p50_s"),
          r6(col("q90") / lit(1e6)).as("p90_s"))
    }),

    // Sample-ratio-mismatch guard (the first gate every experimentation
    // platform runs before reading any metric): per event_type — plus
    // an 'ALL' row over the whole exposure log — the distinct-user
    // count per arm and the 1-df chi-square against the designed 50/50
    // split. With e = (n_a+n_b)/2, the two-cell statistic collapses to
    // (n_a-n_b)^2/(n_a+n_b): exact integers end-to-end, ONE double
    // division at the end, flagged at the 0.05 critical value. Scale
    // shape: distinct (event_type, user, arm) collapses map-side, the
    // per-type aggregate is alphabet-sized, and the ALL row rides the
    // same distinct pass re-collapsed — no window, no join.
    "ab_srm" -> ((s, dir) => {
      val ua = ev(s, dir)
        .select(col("event_type"), col("user_id"),
          (col("user_id") % 2).cast("int").as("arm"))
        .distinct()
        .localCheckpoint()
      // empty-in → empty-out: the ungrouped ALL aggregate always emits
      // one row; a (0, 0) row is both meaningless and a 0/0 — drop it.
      // Never filters real data (every group has ≥ 1 user).
      def counts(g: DataFrame, tag: Column) = g
        .filter(col("n_a") + col("n_b") > 0)
        .select(tag.as("event_type"), col("n_a"), col("n_b"),
          r6(expr("CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)" +
            " / CAST(n_a + n_b AS DOUBLE)")).as("chi2"),
          (expr("CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)" +
            " / CAST(n_a + n_b AS DOUBLE)") > lit(3.841459).cast("double"))
            .as("srm"))
      val per = ua.groupBy("event_type").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      val all = ua.select(col("user_id"), col("arm")).distinct()
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      counts(per, col("event_type"))
        .unionByName(counts(all, lit("ALL")))
    }),

    // Power analysis / minimum-detectable-effect readout from the same
    // exact integer moments as ab_ttest: per event_type, the standard
    // error of the arm difference, the MDE at alpha=.05 / power=.8
    // (z_{.975}+z_{.8} = 2.801585), its relative form against the
    // control mean, and the per-arm n needed to detect a 5% relative
    // lift. Every double derives from exact BIGINT sums in textually
    // mirrored expressions; n_needed stays DOUBLE (a tiny control mean
    // sends it astronomically large — a BIGINT cast would overflow).
    "ab_power" -> ((s, dir) => {
      def v(n: String, sN: String, ssN: String) =
        s"(CAST($ssN AS DOUBLE)/10000.0 - (CAST($sN AS DOUBLE)/100.0)" +
          s"*(CAST($sN AS DOUBLE)/100.0)/CAST($n AS DOUBLE))" +
          s"/(CAST($n AS DOUBLE) - 1.0)"
      EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"),
          col("event_type"),
          // winsorized at ±1e9 cents (the TsRiskQueries convention):
          // caps c*c at 1e18 (< Long.Max) so the per-row product can
          // never wrap before the exact decimal accumulation below
          expr("greatest(CAST(-1000000000 AS BIGINT), " +
            "least(CAST(1000000000 AS BIGINT), " +
            "CAST(round(value * 100) AS BIGINT)))").as("c"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
        .groupBy("event_type")
        .agg(
          sum(when(col("arm") === 0, lit(1L)).otherwise(lit(0L))).as("n_a"),
          sum(when(col("arm") === 0, col("c")).otherwise(lit(0L))).as("sa"),
          sum(when(col("arm") === 0, col("c") * col("c"))
            .otherwise(lit(0L)).cast("decimal(38,0)")).as("ssa"),
          sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L))).as("n_b"),
          sum(when(col("arm") === 1, col("c")).otherwise(lit(0L))).as("sb"),
          sum(when(col("arm") === 1, col("c") * col("c"))
            .otherwise(lit(0L)).cast("decimal(38,0)")).as("ssb"))
        .filter(col("n_a") > 1 && col("n_b") > 1)
        .withColumn("va", expr(v("n_a", "sa", "ssa")))
        .withColumn("vb", expr(v("n_b", "sb", "ssb")))
        .withColumn("se2",
          expr("va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE)"))
        .withColumn("ma",
          expr("(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          r6(col("ma")).as("mean_a"),
          r6(expr("sqrt(se2)")).as("se_diff"),
          r6(expr("CAST(2.801585 AS DOUBLE) * sqrt(se2)")).as("mde_abs"),
          r6(expr("CASE WHEN ma = 0 THEN NULL ELSE " +
            "CAST(2.801585 AS DOUBLE) * sqrt(se2) / ma END")).as("mde_rel"),
          // un-ceiled on purpose: Spark's ceil(DOUBLE) returns LONG
          // (ANSI overflow on a tiny control mean), DuckDB's returns
          // DOUBLE — the raw requirement is the portable number.
          r6(expr("CASE WHEN ma = 0 THEN NULL ELSE " +
            "CAST(2.801585 AS DOUBLE) * CAST(2.801585 AS DOUBLE)" +
            " * (va + vb) / ((CAST(0.05 AS DOUBLE) * ma)" +
            " * (CAST(0.05 AS DOUBLE) * ma)) END")).as("n_needed_5pct"))
    }),

    // Heterogeneous treatment effects by daypart (the segment-level
    // readout after ab_ttest's global one): the same exact-integer
    // Welch machinery per (event_type, 6-hour daypart) — where in the
    // day the effect concentrates, the first cut of any heterogeneity
    // analysis. Segments quadruple the comparisons, so the emitted
    // t is read against a Bonferroni-style bar (noted, not baked in —
    // the table IS the evidence, thresholds are policy). One
    // alphabet×4-sized aggregate; no window, no join.
    "ab_hte" -> ((s, dir) => {
      def v(n: String, sN: String, ssN: String) =
        s"(CAST($ssN AS DOUBLE)/10000.0 - (CAST($sN AS DOUBLE)/100.0)" +
          s"*(CAST($sN AS DOUBLE)/100.0)/CAST($n AS DOUBLE))" +
          s"/(CAST($n AS DOUBLE) - 1.0)"
      EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"),
          col("event_type"),
          // same winsorize-then-exact-decimal posture as ab_power
          expr("greatest(CAST(-1000000000 AS BIGINT), " +
            "least(CAST(1000000000 AS BIGINT), " +
            "CAST(round(value * 100) AS BIGINT)))").as("c"),
          expr("((t DIV 3600000000) % 24) DIV 6").as("daypart"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
        .groupBy("event_type", "daypart")
        .agg(
          sum(when(col("arm") === 0, lit(1L)).otherwise(lit(0L))).as("n_a"),
          sum(when(col("arm") === 0, col("c")).otherwise(lit(0L))).as("sa"),
          sum(when(col("arm") === 0, col("c") * col("c"))
            .otherwise(lit(0L)).cast("decimal(38,0)")).as("ssa"),
          sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L))).as("n_b"),
          sum(when(col("arm") === 1, col("c")).otherwise(lit(0L))).as("sb"),
          sum(when(col("arm") === 1, col("c") * col("c"))
            .otherwise(lit(0L)).cast("decimal(38,0)")).as("ssb"))
        .filter(col("n_a") > 1 && col("n_b") > 1)
        .withColumn("va", expr(v("n_a", "sa", "ssa")))
        .withColumn("vb", expr(v("n_b", "sb", "ssb")))
        .withColumn("se2",
          expr("va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE)"))
        .select(col("event_type"), col("daypart"), col("n_a"), col("n_b"),
          r6(expr("(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)"))
            .as("mean_a"),
          r6(expr("(CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE)"))
            .as("mean_b"),
          r6(expr("(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)" +
            " - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE)"))
            .as("diff"),
          r6(expr("try_divide((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)" +
            " - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE), sqrt(se2))"))
            .as("t_welch"))
    }),

    // UCB1 bandit allocation replayed over the experiment's days
    // (Auer et al., ML'02) — the adaptive-allocation face of the A/B
    // family: at each day, each arm's upper confidence bound is
    // cumulative mean + sqrt(2·ln N / n_arm) and the bandit pulls the
    // larger (ties → arm 0, deterministic). Pure replay of exact
    // integer cumulative sums through event_type-partitioned day
    // windows — no randomness, so the DuckDB oracle mirrors every
    // pull. The emitted pick sequence is the regret-bounded schedule
    // a bandit WOULD have run; read next to ab_sequential (which
    // guards the stopping side as this guards the allocation side).
    "ab_ucb" -> ((s, dir) => {
      val wC = Window.partitionBy("event_type").orderBy("day")
      val daily = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"),
          col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"),
          expr("t DIV 86400000000").as("day"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
        .groupBy("event_type", "day")
        .agg(
          sum(when(col("arm") === 0, lit(1L)).otherwise(lit(0L))).as("d_na"),
          sum(when(col("arm") === 0, col("c")).otherwise(lit(0L))).as("d_sa"),
          sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L))).as("d_nb"),
          sum(when(col("arm") === 1, col("c")).otherwise(lit(0L))).as("d_sb"))
      daily.select(col("event_type"), col("day"),
          sum(col("d_na")).over(wC).as("n_a"),
          sum(col("d_sa")).over(wC).as("sa"),
          sum(col("d_nb")).over(wC).as("n_b"),
          sum(col("d_sb")).over(wC).as("sb"))
        .filter(col("n_a") > 0 && col("n_b") > 0)
        .withColumn("ucb_a", expr(
          "(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)" +
            " + sqrt(CAST(2.0 AS DOUBLE) * ln(CAST(n_a + n_b AS DOUBLE))" +
            " / CAST(n_a AS DOUBLE))"))
        .withColumn("ucb_b", expr(
          "(CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE)" +
            " + sqrt(CAST(2.0 AS DOUBLE) * ln(CAST(n_a + n_b AS DOUBLE))" +
            " / CAST(n_b AS DOUBLE))"))
        .select(col("event_type"), col("day"), col("n_a"), col("n_b"),
          r6(col("ucb_a")).as("ucb_a"), r6(col("ucb_b")).as("ucb_b"),
          expr("CAST(CASE WHEN ucb_a >= ucb_b THEN 0 ELSE 1 END AS INT)")
            .as("pick"))
    }),

    "behav_interevent" -> ((s, dir) => {
      val g = ev(s, dir)
        .withColumn("gap",
          col("t") - lag(col("t"), 1)
            .over(Window.partitionBy("user_id").orderBy("t", "event_id")))
        .filter(col("gap").isNotNull)
        .withColumn("gapd", col("gap").cast("double"))
      val q = ExactQuantile.grouped(g, "event_type", "gapd",
        Seq(0.5 -> "q50", 0.9 -> "q90", 0.99 -> "q99"))
      g.groupBy("event_type").agg(count(lit(1)).as("n"))
        .join(broadcast(q), "event_type")
        .select(col("event_type"), col("n"),
          r6(col("q50") / lit(1e6)).as("p50_s"),
          r6(col("q90") / lit(1e6)).as("p90_s"),
          r6(col("q99") / lit(1e6)).as("p99_s"))
    }),

    // k-anonymity audit (training-data governance face): treat
    // (event_type, day-of-week, 6-hour daypart) as the released
    // quasi-identifier tuple and ask how many users hide behind each
    // combination. A QI cell with fewer than k=5 distinct users
    // re-identifies its members by intersection — the classic
    // k-anonymity failure. Output per event_type: cell count, small
    // (<k) cell count, QI memberships exposed through small cells,
    // and the exposure rate — the exact suppression budget an
    // anonymized release of this table would pay. Shape: one
    // DISTINCT on the 4-tuple, one cell rollup, one event_type
    // rollup — all map-side-combinable exact integers; no window,
    // no join, scales as a two-exchange aggregate at any corpus
    // size.
    "privacy_kanon" -> ((s, dir) => {
      val qi = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"),
          col("event_type"),
          expr(s"(t DIV $DayUs) % 7").as("dow"),
          expr("((t DIV 3600000000) % 24) DIV 6").as("daypart"))
        .distinct()
      qi.groupBy("event_type", "dow", "daypart")
        .agg(count(lit(1)).as("n_users"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("n_users") < 5L, 1L).otherwise(0L))
            .as("n_small_cells"),
          sum(when(col("n_users") < 5L, col("n_users")).otherwise(0L))
            .as("n_exposed"),
          sum(col("n_users")).as("n_memberships"))
        .select(col("event_type"), col("n_cells"), col("n_small_cells"),
          col("n_exposed"),
          r6(expr("CAST(n_exposed AS DOUBLE)" +
            " / CAST(n_memberships AS DOUBLE)")).as("exposure_rate"))
    }))

  val oracles: Map[String, String] = Map(

    "behav_dau_mau" ->
      s"""WITH $evDuck,
         |ud AS (SELECT DISTINCT user_id, t // $DayUs AS day FROM ev),
         |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
         |w7 AS (SELECT DISTINCT user_id, day + unnest(range(0, 7)) AS day
         |  FROM ud),
         |wau AS (SELECT day, count(*) AS wau FROM w7 GROUP BY day),
         |w30 AS (SELECT DISTINCT user_id, day + unnest(range(0, 30)) AS day
         |  FROM ud),
         |mau AS (SELECT day, count(*) AS mau FROM w30 GROUP BY day)
         |SELECT dau.day, dau, wau, mau,
         |  (round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6) + 0.0)
         |    AS stickiness
         |FROM dau JOIN wau ON dau.day = wau.day
         |JOIN mau ON dau.day = mau.day""".stripMargin,

    "behav_churn" ->
      s"""WITH $evDuck,
         |uw AS (SELECT DISTINCT user_id, t // $WeekUs AS wk FROM ev),
         |st AS (SELECT *, lag(wk) OVER (PARTITION BY user_id ORDER BY wk)
         |    AS prev FROM uw),
         |weekly AS (
         |  SELECT wk, count(*) AS n_active,
         |    count(CASE WHEN prev IS NULL THEN 1 END) AS n_new,
         |    count(CASE WHEN prev = wk - 1 THEN 1 END) AS n_retained,
         |    count(CASE WHEN prev IS NOT NULL AND prev < wk - 1 THEN 1 END)
         |      AS n_resurrected
         |  FROM st GROUP BY wk)
         |SELECT w.wk, w.n_active, w.n_new, w.n_retained, w.n_resurrected,
         |  w.n_active - nxt.n_retained AS n_churned
         |FROM weekly w LEFT JOIN weekly nxt ON nxt.wk = w.wk + 1""".stripMargin,

    "behav_power_users" ->
      s"""WITH $evDuck,
         |uc AS (SELECT user_id, count(*) AS n_events FROM ev
         |  GROUP BY user_id),
         |d AS (SELECT *, ntile(10) OVER (ORDER BY n_events, user_id)
         |    AS decile FROM uc),
         |g AS (SELECT decile, count(*) AS n_users,
         |    CAST(sum(n_events) AS BIGINT) AS events
         |  FROM d GROUP BY decile)
         |SELECT decile, n_users, events,
         |  (round(CAST(events AS DOUBLE)
         |    / CAST(CAST(sum(events) OVER () AS BIGINT) AS DOUBLE), 6) + 0.0)
         |    AS event_share
         |FROM g""".stripMargin,

    "basket_pairs" ->
      """WITH ob AS (
        |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
        |nb AS (SELECT p_brand, count(*) AS n_b FROM ob GROUP BY p_brand),
        |pr AS (
        |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |    count(*) AS n_ab
        |  FROM ob a JOIN ob b ON a.okey = b.okey
        |    AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_ab,
        |  (round(CAST(n_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE), 6) + 0.0)
        |    AS support,
        |  (round(CAST(n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
        |    / (CAST(na.n_b AS DOUBLE) * CAST(nbb.n_b AS DOUBLE)), 6) + 0.0)
        |    AS lift
        |FROM pr CROSS JOIN n
        |JOIN nb na ON na.p_brand = pr.brand_a
        |JOIN nb nbb ON nbb.p_brand = pr.brand_b""".stripMargin,

    "behav_funnel_latency" ->
      s"""WITH $evDuck,
         |fv AS (SELECT user_id, min(t) AS tv FROM ev
         |  WHERE event_type = 'view' GROUP BY 1),
         |fp AS (SELECT e.user_id, min(e.t) AS tp, min(fv.tv) AS tv0
         |  FROM ev e JOIN fv ON fv.user_id = e.user_id
         |  WHERE e.event_type = 'purchase' AND e.t > fv.tv GROUP BY 1),
         |lat AS (SELECT (tv0 // 86400000000 - 19723)::BIGINT AS cohort_day,
         |    CAST(tp - tv0 AS DOUBLE) AS latd FROM fp)
         |SELECT cohort_day, count(*)::BIGINT AS n_converted,
         |  (round(quantile_cont(latd, 0.5) / 1e6, 6) + 0.0) AS p50_s,
         |  (round(quantile_cont(latd, 0.9) / 1e6, 6) + 0.0) AS p90_s
         |FROM lat GROUP BY 1""".stripMargin,

    "ab_srm" ->
      s"""WITH $evDuck,
         |ua AS (SELECT DISTINCT event_type, user_id,
         |    (user_id % 2)::INT AS arm FROM ev),
         |per AS (SELECT event_type,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
         |  FROM ua GROUP BY 1),
         |alls AS (SELECT 'ALL' AS event_type,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
         |  FROM (SELECT DISTINCT user_id, arm FROM ua)),
         |u AS (SELECT * FROM (SELECT * FROM per
         |    UNION ALL SELECT * FROM alls)
         |  WHERE n_a + n_b > 0)
         |SELECT event_type, n_a, n_b,
         |  (round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
         |    / CAST(n_a + n_b AS DOUBLE) * 1000000.0) / 1000000.0 + 0.0)
         |    AS chi2,
         |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
         |    / CAST(n_a + n_b AS DOUBLE) > CAST(3.841459 AS DOUBLE) AS srm
         |FROM u""".stripMargin,

    "ab_power" ->
      s"""WITH eva AS (SELECT user_id::BIGINT AS user_id, event_type,
         |    greatest(CAST(-1000000000 AS BIGINT),
         |      least(CAST(1000000000 AS BIGINT),
         |      CAST(round(value * 100) AS BIGINT))) AS c,
         |    (user_id::BIGINT % 2)::INT AS arm FROM events),
         |g AS (SELECT event_type,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 0 THEN c ELSE 0 END)::BIGINT AS sa,
         |    sum(CASE WHEN arm = 0 THEN c*c ELSE 0 END) AS ssa,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         |    sum(CASE WHEN arm = 1 THEN c ELSE 0 END)::BIGINT AS sb,
         |    sum(CASE WHEN arm = 1 THEN c*c ELSE 0 END) AS ssb
         |  FROM eva GROUP BY 1
         |  HAVING n_a > 1 AND n_b > 1),
         |v AS (SELECT *,
         |    (CAST(ssa AS DOUBLE)/10000.0 - (CAST(sa AS DOUBLE)/100.0)
         |      *(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE))
         |      /(CAST(n_a AS DOUBLE) - 1.0) AS va,
         |    (CAST(ssb AS DOUBLE)/10000.0 - (CAST(sb AS DOUBLE)/100.0)
         |      *(CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |      /(CAST(n_b AS DOUBLE) - 1.0) AS vb
         |  FROM g),
         |s2 AS (SELECT *,
         |    va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE) AS se2,
         |    (CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE) AS ma
         |  FROM v)
         |SELECT event_type, n_a, n_b,
         |  (round(ma * 1000000.0) / 1000000.0 + 0.0) AS mean_a,
         |  (round(sqrt(se2) * 1000000.0) / 1000000.0 + 0.0) AS se_diff,
         |  (round(CAST(2.801585 AS DOUBLE) * sqrt(se2) * 1000000.0)
         |    / 1000000.0 + 0.0) AS mde_abs,
         |  (round((CASE WHEN ma = 0 THEN NULL ELSE
         |    CAST(2.801585 AS DOUBLE) * sqrt(se2) / ma END) * 1000000.0)
         |    / 1000000.0 + 0.0) AS mde_rel,
         |  (round((CASE WHEN ma = 0 THEN NULL ELSE
         |    CAST(2.801585 AS DOUBLE) * CAST(2.801585 AS DOUBLE)
         |    * (va + vb) / ((CAST(0.05 AS DOUBLE) * ma)
         |    * (CAST(0.05 AS DOUBLE) * ma)) END) * 1000000.0)
         |    / 1000000.0 + 0.0) AS n_needed_5pct
         |FROM s2""".stripMargin,

    "ab_hte" ->
      s"""WITH hev AS (SELECT user_id::BIGINT AS user_id, event_type,
         |    greatest(CAST(-1000000000 AS BIGINT),
         |      least(CAST(1000000000 AS BIGINT),
         |      CAST(round(value * 100) AS BIGINT))) AS c,
         |    ((epoch_us(ts) // 3600000000) % 24) // 6 AS daypart,
         |    (user_id::BIGINT % 2)::INT AS arm FROM events),
         |hg AS (SELECT event_type, daypart,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 0 THEN c ELSE 0 END)::BIGINT AS sa,
         |    sum(CASE WHEN arm = 0 THEN c*c ELSE 0 END) AS ssa,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         |    sum(CASE WHEN arm = 1 THEN c ELSE 0 END)::BIGINT AS sb,
         |    sum(CASE WHEN arm = 1 THEN c*c ELSE 0 END) AS ssb
         |  FROM hev GROUP BY 1, 2
         |  HAVING n_a > 1 AND n_b > 1),
         |hv AS (SELECT *,
         |    (CAST(ssa AS DOUBLE)/10000.0 - (CAST(sa AS DOUBLE)/100.0)
         |      *(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE))
         |      /(CAST(n_a AS DOUBLE) - 1.0) AS va,
         |    (CAST(ssb AS DOUBLE)/10000.0 - (CAST(sb AS DOUBLE)/100.0)
         |      *(CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |      /(CAST(n_b AS DOUBLE) - 1.0) AS vb
         |  FROM hg),
         |hs AS (SELECT *,
         |    va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE) AS se2
         |  FROM hv)
         |SELECT event_type, daypart, n_a, n_b,
         |  (round(((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_a,
         |  (round(((CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_b,
         |  (round(((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)
         |    - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS diff,
         |  (round((CASE WHEN sqrt(se2) = 0 THEN NULL
         |     ELSE ((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)
         |       - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |       / sqrt(se2) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS t_welch
         |FROM hs""".stripMargin,

    "ab_ucb" ->
      s"""WITH uev AS (SELECT user_id::BIGINT AS user_id, event_type,
         |    CAST(round(value * 100) AS BIGINT) AS c,
         |    epoch_us(ts) // 86400000000 AS day,
         |    (user_id::BIGINT % 2)::INT AS arm FROM events),
         |ud AS (SELECT event_type, day,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS d_na,
         |    sum(CASE WHEN arm = 0 THEN c ELSE 0 END)::BIGINT AS d_sa,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS d_nb,
         |    sum(CASE WHEN arm = 1 THEN c ELSE 0 END)::BIGINT AS d_sb
         |  FROM uev GROUP BY 1, 2),
         |uc AS (SELECT event_type, day,
         |    (sum(d_na) OVER w)::BIGINT AS n_a,
         |    (sum(d_sa) OVER w)::BIGINT AS sa,
         |    (sum(d_nb) OVER w)::BIGINT AS n_b,
         |    (sum(d_sb) OVER w)::BIGINT AS sb
         |  FROM ud WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |uf AS (SELECT * FROM uc WHERE n_a > 0 AND n_b > 0),
         |ub AS (SELECT *,
         |    (CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)
         |      + sqrt(CAST(2.0 AS DOUBLE) * ln(CAST(n_a + n_b AS DOUBLE))
         |      / CAST(n_a AS DOUBLE)) AS ucb_a,
         |    (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE)
         |      + sqrt(CAST(2.0 AS DOUBLE) * ln(CAST(n_a + n_b AS DOUBLE))
         |      / CAST(n_b AS DOUBLE)) AS ucb_b
         |  FROM uf)
         |SELECT event_type, day, n_a, n_b,
         |  (round(ucb_a * 1000000.0) / 1000000.0 + 0.0) AS ucb_a,
         |  (round(ucb_b * 1000000.0) / 1000000.0 + 0.0) AS ucb_b,
         |  CAST(CASE WHEN ucb_a >= ucb_b THEN 0 ELSE 1 END AS INT) AS pick
         |FROM ub""".stripMargin,

    "behav_interevent" ->
      s"""WITH $evDuck,
         |g AS (
         |  SELECT event_type,
         |    CAST(t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
         |      AS DOUBLE) AS gapd
         |  FROM ev),
         |f AS (SELECT * FROM g WHERE gapd IS NOT NULL)
         |SELECT event_type, count(*) AS n,
         |  (round(quantile_cont(gapd, 0.5) / 1e6, 6) + 0.0) AS p50_s,
         |  (round(quantile_cont(gapd, 0.9) / 1e6, 6) + 0.0) AS p90_s,
         |  (round(quantile_cont(gapd, 0.99) / 1e6, 6) + 0.0) AS p99_s
         |FROM f GROUP BY event_type""".stripMargin,

    "privacy_kanon" ->
      s"""WITH $evDuck,
         |kqi AS (SELECT DISTINCT user_id, event_type,
         |    (t // $DayUs) % 7 AS dow,
         |    ((t // 3600000000) % 24) // 6 AS daypart FROM ev),
         |kcell AS (SELECT event_type, dow, daypart,
         |    count(*)::BIGINT AS n_users
         |  FROM kqi GROUP BY 1, 2, 3)
         |SELECT event_type, count(*)::BIGINT AS n_cells,
         |  sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_small_cells,
         |  sum(CASE WHEN n_users < 5 THEN n_users ELSE 0 END)::BIGINT
         |    AS n_exposed,
         |  (round(CAST(sum(CASE WHEN n_users < 5 THEN n_users ELSE 0 END)
         |      AS DOUBLE) / CAST(sum(n_users) AS DOUBLE), 6) + 0.0)
         |    AS exposure_rate
         |FROM kcell GROUP BY event_type""".stripMargin)
}
