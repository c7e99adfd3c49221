package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.TextOps

/** Behavioral / graph / corpus-statistics batch: conversion attribution,
  * RFM segmentation, Markov transition matrix, edit-distance-verified
  * near-dup, near-dup-graph degree histogram + triangle census, bigram
  * PMI, BM25 retrieval scoring, equi-depth binning, and a key-skew
  * profiler — the event-analytics and corpus-statistics layer next to
  * the engine's dedup/similarity operators.
  *
  * Scale notes: attribution and Markov are one user/key exchange with
  * map-side-collapsing argmin/argmax or count partials; the graph
  * queries reuse the capped LSH candidate edges (bounded per bucket);
  * PMI/BM25 broadcast their (bounded-vocab) dictionaries and corpus
  * constants; RFM / equi-depth / key-skew / gini / pareto rank through
  * [[DistRank]] — the range-bucketed distributed exact rank — so even
  * `bin_equidepth`, whose total order runs over RAW lineitem rows,
  * never plans a single-partition window (PlanSpec pins this for the
  * whole suite). Exact-integer arithmetic (cents, counts) everywhere a
  * double sum would be summation-order-dependent across engines.
  */
object BehaviorQueries {

  private val r6 = Rounding.r6 _

  /** events with micros t, typed user_id. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    EventBars.events(s, dir).select(
      col("user_id").cast("long").as("user_id"), col("t"),
      col("event_id"), col("event_type"),
      col("value"))

  private val evDuck =
    """ev AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
      |  event_id, event_type, value FROM events)""".stripMargin

  /** LSH near-dup edges (a < b, jaccard ≥ 0.8) — Spark side of
    * [[ExtCommon.lshPairsDuck]]. */
  private def edges(s: SparkSession, dir: String): DataFrame =
    ExtCommon.minhashPairs(s, dir)
      .filter(ExtCommon.jaccardExpr >= 0.8)
      .select(col("a"), col("b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exponentially time-decayed event popularity (half-life 7 days at
    // the 2024-02-01 horizon) — the freshness-weighted count feature
    // stores keep. A naive Σ exp(−λ·age) is a cross-partition DOUBLE
    // sum (order-nondeterministic) with a libm pow (ulp-divergent
    // across engines). Instead: (1) the big shuffle aggregates EXACT
    // integer counts per (event_type, age_day); (2) the day weight
    // r^d unrolls as a left fold of the LITERAL per-day factor — the
    // identical IEEE multiply chain on both engines; (3) per-day terms
    // micro-quantize to longs before the final (31-row) sum. Events
    // older than the fold horizon would cost O(d) per DAY GROUP, not
    // per row — bounded by retention, and the weight underflows to ~0
    // past 50 half-lives anyway.
    "agg_decayed_count" -> ((s, dir) => {
      val r = math.pow(0.5, 1.0 / 7.0) // per-day factor, half-life 7d
      val T0 = 1706745600000000L // 2024-02-01T00:00:00Z epoch micros
      ev(s, dir)
        .select(col("event_type"),
          expr(s"CAST((${T0}L - t) DIV 86400000000L AS INT)").as("d"))
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
        .withColumn("w", expr(s"CASE WHEN d <= 0 THEN CAST(1.0 AS DOUBLE) " +
          s"ELSE aggregate(sequence(1, d), CAST(1.0 AS DOUBLE), " +
          s"(a, x) -> a * $r) END"))
        .withColumn("tm", expr(
          "CAST(round(CAST(cnt AS DOUBLE) * w * 1000000.0) AS BIGINT)"))
        .groupBy("event_type")
        .agg(sum(col("cnt")).as("n_events"),
          Rounding.r6(sum(col("tm")).cast("double") / lit(1e6))
            .as("decayed_count"))
    }),

    // First/last-touch attribution: for each user with a purchase, the
    // earliest and latest non-purchase touch strictly before their LAST
    // purchase. Argmax structs ride the partial aggregates; the
    // touch↔conversion join is exchange-aligned on user_id.
    "attr_touch" -> ((s, dir) => {
      val e = ev(s, dir)
      val conv = e.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(max(struct(col("t"), col("event_id"))).as("cv"))
        .select(col("user_id"), col("cv.t").as("pt"), col("cv.event_id").as("pe"))
      e.filter(col("event_type") =!= "purchase")
        .join(conv, Seq("user_id"))
        .filter(col("t") < col("pt")
          || (col("t") === col("pt") && col("event_id") < col("pe")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_touches"),
          min(struct(col("t"), col("event_id"), col("event_type")))
            .getField("event_type").as("first_touch"),
          max(struct(col("t"), col("event_id"), col("event_type")))
            .getField("event_type").as("last_touch"),
          first(col("pt")).as("conv_t"))
    }),

    // RFM segmentation: user-level recency/frequency/monetary, quartile
    // scores via the distributed exact rank (bit-equal to ntile over
    // (metric, user_id) — the tiebreak makes the bucketing
    // deterministic, and monetary runs in exact cents so the sort key
    // is cross-engine identical). The rollup materializes once
    // (|users| rows); each metric then ranks on its own partitioned
    // range-bucket window — no single-partition stage.
    "seg_rfm" -> ((s, dir) => {
      val u = ev(s, dir)
        .withColumn("cents", round(col("value") * lit(100.0), 0).cast("long"))
        .groupBy("user_id")
        .agg(max(col("t")).as("rec"), count(lit(1)).as("freq"),
          sum(col("cents")).as("mc"))
        .localCheckpoint()
      val rr = DistRank.rowNumber(u, "_rr", col("rec"),
        Seq(col("rec"), col("user_id")))
      val rf = DistRank.rowNumber(rr.df, "_rf", col("freq"),
        Seq(col("freq"), col("user_id")))
      val rm = DistRank.rowNumber(rf.df, "_rm", col("mc"),
        Seq(col("mc"), col("user_id")))
      rm.df
        .withColumn("r_q", DistRank.ntileOf(col("_rr"), rr.n, 4))
        .withColumn("f_q", DistRank.ntileOf(col("_rf"), rr.n, 4))
        .withColumn("m_q", DistRank.ntileOf(col("_rm"), rr.n, 4))
        .select(col("user_id"), col("rec"), col("freq"),
          (col("mc") / lit(100.0)).as("monetary"),
          col("r_q"), col("f_q"), col("m_q"),
          (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm"))
    }),

    // Event-type Markov transition matrix: (type → next type) counts per
    // user-ordered stream; P(next|cur) from exact integer counts (the
    // row-normalizing window reuses the groupBy's hash partitioning).
    "behav_markov" -> ((s, dir) => {
      val wu = Window.partitionBy("user_id").orderBy("t", "event_id")
      ev(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(wu))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n_trans"))
        .withColumn("p", col("n_trans")
          / sum(col("n_trans")).over(Window.partitionBy("event_type")))
    }),

    // 3-step path mining (the sequence generalization of the Markov
    // pairs): every consecutive event-type triple per user via two
    // leads on the SAME user window (one exchange + sort), then a
    // count + distinct-users rollup per path. The path alphabet is
    // bounded (|types|³), so the aggregate output is tiny no matter
    // how large the log — counts stay exact longs.
    "behav_path" -> ((s, dir) => {
      val wu = Window.partitionBy("user_id").orderBy("t", "event_id")
      ev(s, dir)
        .withColumn("e2", lead(col("event_type"), 1).over(wu))
        .withColumn("e3", lead(col("event_type"), 2).over(wu))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("n_paths"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // Semi-structured extraction: pull the `$.k` attribute out of the
    // raw JSON props column and roll it up per event type. The JSON
    // parse is a per-row projection (native JsonPath expression — no
    // UDF, no shuffle of the raw payload); everything downstream is
    // one map-side-collapsing aggregate over exact longs. The distinct
    // count rides the same exchange as a two-phase distinct aggregate.
    "ev_json" -> ((s, dir) =>
      EventBars.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .withColumn("avg_k",
          r6(expr("try_divide(CAST(sum_k AS DOUBLE), CAST(n_k AS DOUBLE))")))),

    // Welch two-sample t-test per event type, arms assigned by user-id
    // parity (the deterministic stand-in for an experiment flag). The
    // per-arm moments are conditional sums over EXACT cent-integers
    // (double sums would be summation-order-dependent across engines);
    // the t statistic and Welch–Satterthwaite df are derived on the
    // |event_types|-row aggregate with a mirrored expression tree, so
    // the doubles are bit-equal. One exchange, map-side partials.
    // Kaplan-Meier retention curve with right-censoring: per-user
    // lifetime = (last − first activity day) + 1; users still active
    // in the final 3 observed days are CENSORED (they didn't churn,
    // the window just ended) — the estimator plain retention tables
    // get wrong. S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over churn
    // durations. Scale shape: ONE user_id aggregate reduces events to
    // a ≤31-row duration table; the risk-set suffix sum and the KM
    // product are broadcast self-joins of that tiny table (the
    // one-row-agg crossJoin posture — NOT an unpartitioned window,
    // which the PlanSpec sweep bans suite-wide), and the product folds
    // a SORTED struct array so both engines multiply in ascending-dur
    // order — bit-equal doubles.
    "behav_survival" -> ((s, dir) => {
      val byDur = ev(s, dir)
        .withColumn("day", expr("CAST(t DIV 86400000000L AS BIGINT) - 19723L"))
        .groupBy("user_id")
        .agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
        .select((col("ld") - col("fd") + lit(1L)).as("dur"),
          when(col("ld") < 27L, lit(1L)).otherwise(lit(0L)).as("evt"))
        .groupBy("dur")
        .agg(count(lit(1)).as("n_total"), sum(col("evt")).as("d_churn"))
        .localCheckpoint()
      val risk = byDur.as("a")
        .join(broadcast(byDur.select(col("dur").as("bdur"),
          col("n_total").as("bn"))), col("bdur") >= col("a.dur"))
        .groupBy(col("a.dur").as("dur"), col("a.n_total").as("n_total"),
          col("a.d_churn").as("d_churn"))
        .agg(sum(col("bn")).as("n_risk"))
        .withColumn("ratio", expr(
          "1.0D - CAST(d_churn AS DOUBLE) / CAST(n_risk AS DOUBLE)"))
        .localCheckpoint()
      risk.as("x")
        .join(broadcast(risk.select(col("dur").as("ydur"),
          col("ratio").as("yratio"))), col("ydur") <= col("x.dur"))
        .groupBy(col("x.dur").as("dur"), col("x.n_risk").as("n_risk"),
          col("x.d_churn").as("d_churn"),
          (col("x.n_total") - col("x.d_churn")).as("c_censored"))
        .agg(expr("aggregate(transform(array_sort(" +
          "collect_list(struct(ydur, yratio))), p -> p.yratio), " +
          "CAST(1.0 AS DOUBLE), (a, x) -> a * x)").as("km0"))
        .select(col("dur"), col("n_risk"), col("d_churn"),
          col("c_censored"), r6(col("km0")).as("km"))
    }),

    // CUPED variance reduction for the A/B readout: per-user PRE-period
    // spend (days 1–15) is the covariate X, POST-period spend the
    // metric Y; adjusted mean per arm = Ȳ_arm − θ·(X̄_arm − X̄), with
    // θ = cov(X,Y)/var(X) pooled. Everything that crosses a shuffle is
    // an exact cent-long (per-user conditional sums fold map-side, the
    // comoment products sum as longs — ts_beta's posture; at 100 TB
    // user-sums widen the products to DECIMAL(38,0)/HUGEINT per the
    // wrap caveat); θ/ρ² are single deterministic double expressions.
    // ρ² is the variance-reduction factor CUPED buys (1−ρ² of the
    // metric variance remains).
    "ab_cuped" -> ((s, dir) => {
      val Tm = 1705363200000000L // 2024-01-16T00:00:00Z pre/post split
      val u = ev(s, dir)
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("user_id")
        .agg(sum(when(col("t") < Tm, col("c")).otherwise(lit(0L))).as("x"),
          sum(when(col("t") >= Tm, col("c")).otherwise(lit(0L))).as("y"))
        .localCheckpoint()
      val g = u.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      u.withColumn("arm", (col("user_id") % 2).cast("bigint"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("sax"), sum(col("y")).as("say"))
        .crossJoin(broadcast(g))
        .withColumn("theta", expr(
          "try_divide(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)," +
            " CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"))
        .select(col("arm"), col("n_users"),
          r6(expr("(CAST(sax AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE)"))
            .as("mean_pre"),
          r6(expr("(CAST(say AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE)"))
            .as("mean_post"),
          r6(expr("(CAST(say AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE)" +
            " - theta*((CAST(sax AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE)" +
            " - (CAST(sx AS DOUBLE)/100.0)/CAST(n AS DOUBLE))"))
            .as("mean_adj"),
          r6(col("theta")).as("theta"),
          r6(expr("try_divide((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))" +
            "*(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))," +
            " (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)" +
            " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))" +
            "*(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)" +
            " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))")).as("rho2"))
    }),

    // Difference-in-differences readout — the panel cousin of
    // ab_cuped: per-user PRE/POST cent-sums (same fixed 2024-01-16
    // split), arms by user parity, user-level cell means, and
    // DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)
    // — the parallel-trends estimate of the treatment effect when
    // assignment isn't randomized per event. Everything crossing a
    // shuffle is an exact cent-long; the four means and the DiD are
    // one fixed-order double expression over six broadcast scalars.
    "behav_did" -> ((s, dir) => {
      val Tm = 1705363200000000L // 2024-01-16T00:00:00Z pre/post split
      val u = ev(s, dir)
        .filter(col("user_id").isNotNull)
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("user_id")
        .agg(sum(when(col("t") < Tm, col("c")).otherwise(lit(0L))).as("x"),
          sum(when(col("t") >= Tm, col("c")).otherwise(lit(0L))).as("y"))
      def mean(sc: String, n: String) =
        s"CASE WHEN $n = 0 THEN NULL ELSE " +
          s"(CAST($sc AS DOUBLE)/100.0)/CAST($n AS DOUBLE) END"
      u.agg(
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("user_id") % 2 === 0, col("x")).otherwise(0L)).as("stx"),
        sum(when(col("user_id") % 2 === 0, col("y")).otherwise(0L)).as("sty"),
        sum(when(col("user_id") % 2 =!= 0, col("x")).otherwise(0L)).as("scx"),
        sum(when(col("user_id") % 2 =!= 0, col("y")).otherwise(0L)).as("scy"))
        // empty-in → empty-out (repo convention for global aggregates)
        .filter(col("n_treat") + col("n_ctrl") > 0)
        .withColumn("mtp", expr(mean("stx", "n_treat")))
        .withColumn("mtq", expr(mean("sty", "n_treat")))
        .withColumn("mcp", expr(mean("scx", "n_ctrl")))
        .withColumn("mcq", expr(mean("scy", "n_ctrl")))
        .select(col("n_treat"), col("n_ctrl"),
          r6(col("mtp")).as("treat_pre"), r6(col("mtq")).as("treat_post"),
          r6(col("mcp")).as("ctrl_pre"), r6(col("mcq")).as("ctrl_post"),
          r6(col("mtq") - col("mtp") - (col("mcq") - col("mcp"))).as("did"))
    }),

    // Poisson bootstrap confidence intervals — THE large-scale
    // resampling method (per-row independent Poisson(1) weights stand
    // in for with-replacement resampling, so replicas aggregate in one
    // map-side-combinable pass instead of B shuffles of the data).
    // Weights are DETERMINISTIC: the inverse-CDF of Poisson(1)
    // truncated at 4, looked up by integer thresholds on a Knuth hash
    // of (event_id, replica) — a defined resampling scheme both
    // engines share bit-for-bit. B = 64 replica means per arm are
    // exact cent-long ratios; the 95% CI reads order statistics 2 and
    // 63 off the sorted 64-value array (no percentile interpolation
    // ambiguity). At 100 TB the explode is ×64 on the scan — the
    // price of the bootstrap — but the exchange carries only
    // (arm, replica) cells.
    "ab_bootstrap" -> ((s, dir) => {
      val B = 64
      // The 64 replica weights accumulate in per-partition long arrays
      // over the 2·B (arm, b) cells instead of exploding B struct rows
      // per event through the partial aggregate (~38M rows at sf0.1 —
      // the emb_mmd_poly accumulator shape, same reason). Weight
      // arithmetic is bit-identical: event_id reduced mod 1000003
      // BEFORE the Knuth multiply so the product never leaves Long
      // range (DuckDB BIGINT overflow throws where Spark would wrap),
      // pmod, then the Poisson(1) inverse CDF at 1e-4 resolution:
      // P(0)=.3679 P(1)=.3679 P(2)=.1839 P(3)=.0613 rest → 4.
      // A NULL c contributes to sw but never to swc (sum semantics);
      // an (arm, b) cell with no non-NULL c stays NULL-swc so the
      // m-is-NULL filter below behaves exactly as before. Arm keeps
      // Spark/DuckDB `%` semantics (a negative user_id yields arm =
      // -1, its own group, exactly as the pre-accumulator groupBy
      // produced) — the accumulator indexes arm + 1 over THREE arm
      // slots so bad-sign data lands in the -1 group instead of
      // crashing an executor on a negative array index.
      val base = ev(s, dir)
        .filter(col("user_id").isNotNull)
        .select((col("user_id") % 2).cast("bigint").as("arm"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"),
          col("event_id").cast("long").as("event_id"))
      val repSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("arm",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("swc",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sw",
          org.apache.spark.sql.types.LongType)))
      val partials = base.mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        val swc = Array.fill(3 * B)(0L)
        val sw = Array.fill(3 * B)(0L)
        val sawC = Array.fill(3 * B)(false)
        val armSeen = Array.fill(3)(false)
        it.foreach { row =>
          val armIdx = row.getLong(0).toInt + 1 // arm ∈ {-1, 0, 1}
          val cNull = row.isNullAt(1)
          val c = if (cNull) 0L else row.getLong(1)
          val eid = row.getLong(2) % 1000003L
          armSeen(armIdx) = true
          var b = 1
          while (b <= B) {
            val h = {
              val m = (eid * 2654435761L + b * 40503L) % 10000L
              if (m < 0) m + 10000L else m
            }
            val w =
              if (h < 3679) 0L else if (h < 7358) 1L
              else if (h < 9197) 2L else if (h < 9810) 3L else 4L
            val cell = armIdx * B + (b - 1)
            sw(cell) += w
            if (!cNull) { swc(cell) += w * c; sawC(cell) = true }
            b += 1
          }
        }
        (0 until 3).iterator.filter(armSeen).flatMap(a =>
          (1 to B).iterator.map { b =>
            val cell = a * B + (b - 1)
            org.apache.spark.sql.Row((a - 1).toLong, b,
              if (sawC(cell)) java.lang.Long.valueOf(swc(cell)) else null,
              sw(cell))
          })
      }(org.apache.spark.sql.Encoders.row(repSchema))
      val means = partials.groupBy("arm", "b")
        .agg(sum(col("swc")).as("swc"), sum(col("sw")).as("sw"))
        .withColumn("m", expr("CAST(round(try_divide(" +
          "CAST(swc AS DOUBLE), CAST(sw AS DOUBLE)) * 10000.0)" +
          " AS BIGINT)"))
      means.filter(col("m").isNotNull)
        .groupBy("arm")
        .agg(count(lit(1)).as("n_reps"),
          expr("array_sort(collect_list(m))").as("ms"))
        .filter(col("n_reps") === B)
        .select(col("arm"), col("n_reps"),
          r6(expr("CAST(element_at(ms, 2) AS DOUBLE) / 1000000.0"))
            .as("ci_lo"),
          r6(expr("CAST(element_at(ms, 63) AS DOUBLE) / 1000000.0"))
            .as("ci_hi"))
    }),

    "ab_ttest" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("arm", (col("user_id") % 2).cast("int"))
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
      // Every operand forced to DOUBLE explicitly: Spark parses a
      // `100.0` literal as DECIMAL and would run this in decimal
      // arithmetic, diverging from DuckDB's double ulps.
      def v(n: String, sN: String, ssN: String) =
        s"(CAST($ssN AS DOUBLE)/10000.0 - (CAST($sN AS DOUBLE)/100.0)" +
          s"*(CAST($sN AS DOUBLE)/100.0)/CAST($n AS DOUBLE))" +
          s"/(CAST($n AS DOUBLE) - 1.0)"
      val va = v("n_a", "sa", "ssa")
      val vb = v("n_b", "sb", "ssb")
      e.groupBy("event_type")
        .agg(
          sum(when(col("arm") === 0, lit(1L)).otherwise(lit(0L))).as("n_a"),
          sum(when(col("arm") === 0, col("c")).otherwise(lit(0L))).as("sa"),
          sum(when(col("arm") === 0, col("c") * col("c"))
            .otherwise(lit(0L))).as("ssa"),
          sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L))).as("n_b"),
          sum(when(col("arm") === 1, col("c")).otherwise(lit(0L))).as("sb"),
          sum(when(col("arm") === 1, col("c") * col("c"))
            .otherwise(lit(0L))).as("ssb"))
        .filter(col("n_a") > 1 && col("n_b") > 1)
        .withColumn("va", expr(va))
        .withColumn("vb", expr(vb))
        .withColumn("se2",
          expr("va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE)"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          r6(expr("(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)"))
            .as("mean_a"),
          r6(expr("(CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE)"))
            .as("mean_b"),
          r6(expr("try_divide((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)" +
            " - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE), sqrt(se2))"))
            .as("t_welch"),
          r6(expr("try_divide(se2*se2, " +
            "(va/CAST(n_a AS DOUBLE))*(va/CAST(n_a AS DOUBLE))" +
            "/(CAST(n_a AS DOUBLE) - 1.0)" +
            " + (vb/CAST(n_b AS DOUBLE))*(vb/CAST(n_b AS DOUBLE))" +
            "/(CAST(n_b AS DOUBLE) - 1.0))"))
            .as("df"))
    }),

    // Always-valid sequential A/B monitoring (mixture SPRT, the
    // Robbins/Johari-et-al. posture): the peeking-proof face of
    // ab_ttest. Events roll up per (event_type, day); cumulative
    // exact-integer sums ride a day-ordered window PARTITIONED by
    // event_type (bounded rows per partition -- never the
    // unpartitioned global window the suite bans); each day's
    // mixture-likelihood p-value p_t = min(1, sqrt((se2+tau2)/se2) *
    // exp(-diff^2*tau2 / (2*se2*(se2+tau2)))) with tau2 = 1.0 value^2
    // (the mixture prior scale), and the always-valid decision value
    // is the running min of p_t -- monotone, so "significant once,
    // significant forever", the property sequential testing exists
    // for. Every input to the double math is an exact integer cumsum,
    // so both engines evaluate identical IEEE expressions.
    "ab_sequential" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wC = Window.partitionBy("event_type").orderBy("day")
      def v(n: String, sN: String, ssN: String) =
        s"(CAST($ssN AS DOUBLE)/10000.0 - (CAST($sN AS DOUBLE)/100.0)" +
          s"*(CAST($sN AS DOUBLE)/100.0)/CAST($n AS DOUBLE))" +
          s"/(CAST($n AS DOUBLE) - 1.0)"
      val daily = ev(s, dir)
        .withColumn("arm", (col("user_id") % 2).cast("int"))
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("day", expr("t DIV 86400000000"))
        .groupBy("event_type", "day")
        .agg(
          sum(when(col("arm") === 0, lit(1L)).otherwise(lit(0L))).as("d_na"),
          sum(when(col("arm") === 0, col("c")).otherwise(lit(0L))).as("d_sa"),
          sum(when(col("arm") === 0, col("c") * col("c"))
            .otherwise(lit(0L))).as("d_ssa"),
          sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L))).as("d_nb"),
          sum(when(col("arm") === 1, col("c")).otherwise(lit(0L))).as("d_sb"),
          sum(when(col("arm") === 1, col("c") * col("c"))
            .otherwise(lit(0L))).as("d_ssb"))
      val cum = daily.select(col("event_type"), col("day"),
        sum(col("d_na")).over(wC).as("n_a"),
        sum(col("d_sa")).over(wC).as("sa"),
        sum(col("d_ssa")).over(wC).as("ssa"),
        sum(col("d_nb")).over(wC).as("n_b"),
        sum(col("d_sb")).over(wC).as("sb"),
        sum(col("d_ssb")).over(wC).as("ssb"))
      val pp = cum
        .filter(col("n_a") > 1 && col("n_b") > 1)
        .withColumn("va", expr(v("n_a", "sa", "ssa")))
        .withColumn("vb", expr(v("n_b", "sb", "ssb")))
        .withColumn("se2",
          expr("va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE)"))
        .withColumn("diff",
          expr("(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)" +
            " - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE)"))
        .withColumn("p", expr("CASE WHEN se2 <= 0 THEN NULL ELSE " +
          "least(CAST(1.0 AS DOUBLE), sqrt((se2 + 1.0)/se2) " +
          "* exp(-(diff*diff)/(2.0*se2*(se2 + 1.0)))) END"))
      pp.withColumn("p_min", min(col("p")).over(wC))
        .select(col("event_type"), col("day"), col("n_a"), col("n_b"),
          r6(col("diff")).as("diff"),
          r6(col("p")).as("p_seq"),
          r6(col("p_min")).as("p_min"),
          (col("p_min") < lit(0.05)).as("signif"))
    }),

    // Edit-distance verification of the LSH candidates — the exact
    // confirmation pass symmetric jaccard only approximates. Texts
    // shuffle only for candidate ids (two hash joins on doc_id).
    "dedup_editdist" -> ((s, dir) => {
      val dd = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      ExtCommon.minhashIdPairs(s, dir)
        .join(dd.select(col("doc_id").as("a"), col("text").as("ta")), Seq("a"))
        .join(dd.select(col("doc_id").as("b"), col("text").as("tb")), Seq("b"))
        .withColumn("ed", levenshtein(col("ta"), col("tb")))
        .select(col("a"), col("b"), col("ed").cast("long").as("edit_dist"),
          r6(lit(1.0) - col("ed").cast("double")
            / greatest(length(col("ta")), length(col("tb")))).as("edit_sim"))
    }),

    // Degree histogram of the near-dup graph over ALL documents
    // (singletons included): both endpoints explode in ONE pass over
    // the edge list (a union of two selects would re-run the whole LSH
    // candidate pipeline per branch); degree partials collapse
    // map-side; the doc↔degree join shuffles ids only.
    "graph_degree" -> ((s, dir) => {
      val deg = edges(s, dir)
        .select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("id"))
        .join(deg, Seq("id"), "left")
        .withColumn("degree", coalesce(col("deg"), lit(0L)))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    }),

    // Degree assortativity of the near-dup graph (Newman 2002): the
    // Pearson correlation of endpoint degrees over both edge
    // orientations -- positive in template/boilerplate cliques (hubs
    // link hubs), negative in star-shaped spam bursts. Exact integer
    // moments (degrees are counts; the cross-products widen to
    // DECIMAL(38,0)/HUGEINT where 100 TB degree sums would wrap);
    // both-orientation symmetry makes S_y = S_x and S_yy = S_xx
    // EXACTLY, so the closed form divides once at the end. Edge list
    // materializes once; degree partials collapse map-side; the two
    // degree attachments are id-keyed joins.
    "graph_assortativity" -> ((s, dir) => {
      val ed = edges(s, dir).localCheckpoint()
      val deg = ed.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val both = ed.select(col("a"), col("b"))
        .unionAll(ed.select(col("b").as("a"), col("a").as("b")))
      both
        .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
        .agg(count(lit(1)).as("n"),
          sum(col("da")).as("sx"),
          sum(expr("CAST(da AS DECIMAL(38,0)) * db")).as("sxy"),
          sum(expr("CAST(da AS DECIMAL(38,0)) * da")).as("sxx"))
        .filter(col("n") > 0) // empty edge list -> empty output
        .select(col("n").as("n_samples"),
          r6(expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)")).as("mean_deg"),
          r6(expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN NULL ELSE" +
            " CAST(CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) END"))
            .as("assortativity"))
    }),

    // Triangle census of the near-dup graph: the a<b edge orientation
    // makes each triangle a single (a<b<c) wedge-close join — edges
    // shuffle on their join keys, never the docs. The edge list is
    // consumed four times (e1/e2/e3/wedges), so it materializes ONCE
    // via localCheckpoint (the [[graft.ext.PageRank]] treatment — the
    // LSH candidate pipeline is far heavier than the edge list).
    // Wedge count from the degree partials; clustering = 3·tri/wedges.
    "graph_triangles" -> ((s, dir) => {
      val ed = edges(s, dir).localCheckpoint()
      val tri = ed.as("e1")
        .join(ed.as("e2"), col("e1.b") === col("e2.a"))
        .join(ed.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
      val ne = ed.agg(count(lit(1)).as("n_edges"))
      val wedges = ed
        .select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("d"))
        .agg(coalesce(sum(col("d") * (col("d") - 1) / lit(2)), lit(0.0))
          .cast("long").as("n_wedges"))
      ne.crossJoin(tri).crossJoin(wedges)
        .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
          when(col("n_wedges") > 0,
            (lit(3.0) * col("n_triangles")) / col("n_wedges"))
            .as("clustering"))
        .filter(col("n_edges") > 0) // empty-in → empty-out
    }),

    // Per-node LOCAL clustering coefficient — the node-level face of
    // graph_triangles' global census: lcc(v) = 2·tri(v)/(deg(v)·(deg−1))
    // flags near-dup docs whose neighborhoods are cliques (template
    // families) vs hubs bridging unrelated dup groups (boilerplate).
    // Per-node triangle counts explode the same single wedge-close
    // join's three corners; everything keys on node ids.
    "graph_local_cc" -> ((s, dir) => {
      val ed = edges(s, dir).localCheckpoint()
      val triN = ed.as("e1")
        .join(ed.as("e2"), col("e1.b") === col("e2.a"))
        .join(ed.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b")))
          .as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
      val deg = ed.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("id"))
        .join(deg, Seq("id"), "left")
        .join(triN, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("deg"), lit(0L)).as("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          r6(expr("CASE WHEN coalesce(deg, 0) >= 2 THEN " +
            "2.0 * CAST(coalesce(n_tri, 0) AS DOUBLE) " +
            "/ (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE)) END"))
            .as("lcc"))
    }),

    // Per-user lifetime summary (the LTV rollup): first/last touch via
    // argmin/argmax structs, purchase totals as exact cents, tenure
    // from the exact epoch extremes — ONE exchange, every aggregate a
    // map-side-collapsing partial.
    "behav_ltv" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          min(struct(col("t"), col("event_id"), col("event_type")))
            .getField("event_type").as("first_type"),
          max(struct(col("t"), col("event_id"), col("event_type")))
            .getField("event_type").as("last_type"),
          min(col("t")).as("t_first"), max(col("t")).as("t_last"),
          sum(when(col("event_type") === "purchase", col("c"))
            .otherwise(lit(0L))).as("purch_cents"),
          sum(when(col("event_type") === "purchase", lit(1L))
            .otherwise(lit(0L))).as("n_purchases"))
        .select(col("user_id"), col("n_events"), col("first_type"),
          col("last_type"),
          r6(expr("CAST(t_last - t_first AS DOUBLE) / 86400000000.0"))
            .as("tenure_days"),
          r6(expr("CAST(purch_cents AS DOUBLE) / 100.0")).as("ltv"),
          col("n_purchases"))),

    // LTV by acquisition cohort: users bucket by their FIRST-event
    // week, spend stays exact cents until the final per-cohort
    // averages. Two exchanges, both over per-user rollups.
    "behav_cohort_ltv" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("user_id")
        .agg(min(expr("t div 604800000000")).as("cohort_wk"),
          sum(when(col("event_type") === "purchase", col("c"))
            .otherwise(lit(0L))).as("pc"),
          count(lit(1)).as("ne"))
        .groupBy("cohort_wk")
        .agg(count(lit(1)).as("n_users"), sum(col("pc")).as("spc"),
          sum(col("ne")).as("sne"))
        .select(col("cohort_wk"), col("n_users"),
          r6(expr("CAST(spc AS DOUBLE) / 100.0 / CAST(n_users AS DOUBLE)"))
            .as("avg_ltv"),
          r6(expr("CAST(sne AS DOUBLE) / CAST(n_users AS DOUBLE)"))
            .as("avg_events"))),

    // Pareto concentration: the spend share of the top 10% of users
    // (⌈n/10⌉ by rank). Distributed exact rank over the |users|
    // rollup (descending spend — the bucket key is the negated
    // metric); n and the top cut become driver literals, so the final
    // pass is one scalar aggregate. Every sum is exact cents.
    "agg_pareto" -> ((s, dir) => {
      val u = ev(s, dir).filter(col("event_type") === "purchase")
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("user_id").agg(sum(col("c")).as("x"))
        .localCheckpoint()
      val r = DistRank.rowNumber(u, "rk", negate(col("x")),
        Seq(col("x").desc, col("user_id")))
      val ntop = (r.n + 9L) / 10L
      r.df
        .agg(count(lit(1)).as("nz"), sum(col("x")).as("sx"),
          sum(when(col("rk") <= lit(ntop), col("x")).otherwise(lit(0L)))
            .as("tx"))
        .filter(col("nz") > 0)
        .select(lit(r.n).as("n_users"), lit(ntop).as("n_top"),
          r6(expr("CAST(sx AS DOUBLE) / 100.0")).as("total_spend"),
          r6(expr("try_divide(CAST(tx AS DOUBLE), CAST(sx AS DOUBLE))"))
            .as("top10_share"))
    }),

    // Gini coefficient of per-user purchase spend — the inequality
    // number behind "whales drive revenue". Per-user totals are exact
    // cents; the rank·value cross terms stay exact longs; ranks come
    // from the distributed exact rank over the |users| rollup — no
    // single-partition window at any scale.
    // G = (2Σi·xᵢ − (n+1)Σx) / (nΣx), x ascending.
    "agg_gini" -> ((s, dir) => {
      val u = ev(s, dir).filter(col("event_type") === "purchase")
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy("user_id").agg(sum(col("c")).as("x"))
        .localCheckpoint()
      DistRank.rowNumber(u, "i", col("x"), Seq(col("x"), col("user_id"))).df
        .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("sixi"))
        .filter(col("n_users") > 0)
        .select(col("n_users"),
          r6(expr("CAST(sx AS DOUBLE) / 100.0")).as("total_spend"),
          r6(expr("try_divide(" +
            "2.0*CAST(sixi AS DOUBLE)" +
            " - (CAST(n_users AS DOUBLE) + 1.0)*CAST(sx AS DOUBLE), " +
            "CAST(n_users AS DOUBLE)*CAST(sx AS DOUBLE))")).as("gini"))
    }),

    // Per-user modal event type — mode as an argmax struct over the
    // (user, type) count rollup, tie broken to the lexicographically
    // largest type so the pick is deterministic. Two exchanges, both
    // over count partials.
    "agg_mode" -> ((s, dir) =>
      ev(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("event_type"))).as("m"),
          sum(col("n")).as("n_events"))
        .select(col("user_id"), col("m.event_type").as("mode_type"),
          col("m.n").as("n_mode"), col("n_events"))),

    // Neighbor-overlap link scoring on the near-dup graph: per edge,
    // common-neighbor count and neighborhood Jaccard (the classic
    // link-prediction feature). Everything is equi-joins over the ONCE-
    // materialized edge list (the localCheckpoint treatment — the LSH
    // pipeline is far heavier than the edges); counts are exact longs.
    "graph_jaccard" -> ((s, dir) => {
      val ed = edges(s, dir).localCheckpoint()
      val sym = ed.select(col("a").as("u"), col("b").as("v"))
        .union(ed.select(col("b").as("u"), col("a").as("v")))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
      val cn = ed.as("e")
        .join(sym.as("x"), col("e.a") === col("x.u"))
        .join(sym.as("y"),
          col("e.b") === col("y.u") && col("x.v") === col("y.v"))
        .groupBy(col("e.a").as("a"), col("e.b").as("b"))
        .agg(count(lit(1)).as("nc0"))
      ed.join(cn, Seq("a", "b"), "left")
        .join(deg.select(col("u").as("a"), col("d").as("deg_a")), Seq("a"))
        .join(deg.select(col("u").as("b"), col("d").as("deg_b")), Seq("b"))
        .withColumn("n_common", coalesce(col("nc0"), lit(0L)))
        .select(col("a"), col("b"), col("n_common"), col("deg_a"),
          col("deg_b"),
          r6(expr("try_divide(CAST(n_common AS DOUBLE), " +
            "CAST(deg_a + deg_b - 2 - n_common AS DOUBLE))")).as("jaccard"))
    }),

    // Adjacent-bigram PMI over the corpus (count ≥ 5): bigram counts
    // collapse map-side; the unigram dictionary and corpus totals are
    // broadcast (bounded vocabulary). All inputs to ln() are exact
    // integer ratios, so the PMI doubles are cross-engine identical.
    "text_pmi" -> ((s, dir) => {
      val dd = s.read.parquet(s"$dir/documents.parquet")
      val tk = dd.select(col("doc_id"), expr(TextOps.toksSpark).as("toks"))
      val bgc = tk.filter(size(col("toks")) > 1)
        .select(explode(expr(
          "transform(slice(toks, 1, size(toks) - 1), (x, i) -> struct(x AS w1, toks[i + 1] AS w2))"))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      val uni = tk.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      // Corpus totals from token LENGTHS, not from re-aggregating the
      // unigram/bigram tables — one tiny scan instead of re-running
      // both groupBys: n1 = Σ|toks|, n2 = Σ(|toks|−1 over len>1 docs).
      val totals = tk.agg(
        sum(size(col("toks"))).as("n1"),
        sum(when(size(col("toks")) > 1, size(col("toks")) - 1)
          .otherwise(0)).as("n2"))
      bgc.filter(col("n_pair") >= 5)
        .join(broadcast(uni.select(col("w").as("w1"), col("c").as("cx"))), Seq("w1"))
        .join(broadcast(uni.select(col("w").as("w2"), col("c").as("cy"))), Seq("w2"))
        .crossJoin(broadcast(totals))
        .select(col("w1"), col("w2"), col("n_pair"),
          r6(log((col("n_pair") / col("n2"))
            / ((col("cx") / col("n1")) * (col("cy") / col("n1"))))).as("pmi"))
    }),

    // BM25 (k1=1.2, b=0.75) against a fixed 3-term query — corpus
    // constants (N, df, avgdl) reduce to one broadcast row; per-doc
    // scoring is a projection. Counts are exact, avgdl is an
    // exact-integer ratio, so scores agree bit-for-bit before r6.
    "text_bm25" -> ((s, dir) => {
      def tf(t: String) =
        expr(s"CAST(size(filter(toks, x -> x = '$t')) AS DOUBLE)")
      val dd = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(TextOps.toksSpark).as("toks"))
        .withColumn("dl", size(col("toks")).cast("double"))
        .withColumn("tf1", tf("join"))
        .withColumn("tf2", tf("hash"))
        .withColumn("tf3", tf("vector"))
      val stats = dd.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sdl"),
        count(when(col("tf1") > 0, lit(1))).as("df1"),
        count(when(col("tf2") > 0, lit(1))).as("df2"),
        count(when(col("tf3") > 0, lit(1))).as("df3"))
      def idf(dfc: String) =
        log(lit(1.0) + (col("nd") - col(dfc) + lit(0.5)) / (col(dfc) + lit(0.5)))
      def term(tfc: String, dfc: String) =
        idf(dfc) * ((col(tfc) * lit(2.2))
          / (col(tfc) + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      dd.crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sdl") / col("nd"))
        .withColumn("score",
          term("tf1", "df1") + term("tf2", "df2") + term("tf3", "df3"))
        .filter(col("score") > 0)
        .select(col("doc_id"),
          ((col("tf1") > 0).cast("int") + (col("tf2") > 0).cast("int")
            + (col("tf3") > 0).cast("int")).as("n_terms_hit"),
          r6(col("score")).as("bm25"))
    }),

    // Equi-depth (decile) binning of lineitem prices: the distributed
    // exact rank over the (price, orderkey, linenumber) total order
    // (bit-equal to ntile(10), but range-bucketed — the biggest fact
    // table never collapses to one partition); deterministic bucket
    // edges; per-bin stats in exact cents. The three passes (bounds,
    // offsets, rank) each read only the pruned 3-column projection
    // straight off the parquet scan — cheaper than materializing.
    "bin_equidepth" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_extendedprice").as("price"),
          col("l_orderkey"), col("l_linenumber"))
      val r = DistRank.rowNumber(li, "_rk", col("price"),
        Seq(col("price"), col("l_orderkey"), col("l_linenumber")))
      r.df
        .withColumn("bin", DistRank.ntileOf(col("_rk"), r.n, 10))
        .withColumn("cents", round(col("price") * lit(100.0), 0).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"),
          min(col("price")).as("min_price"),
          max(col("price")).as("max_price"),
          r6(sum(col("cents")) / lit(100.0) / count(lit(1))).as("avg_price"))
    }),

    // Key-skew profiler on the events user distribution: top-10 heavy
    // keys with corpus share, plus the p50/p99 group-size quantiles and
    // each key's ratio to the median — the report that decides whether
    // a join needs salting. Group sizes collapse map-side first.
    "key_skew" -> ((s, dir) => {
      // Everything AFTER the one events→sizes groupBy rides the
      // distributed exact rank over the materialized key-size table:
      // the row count and event total become driver literals, so the
      // quantile POSITIONS are literals too — the p50/p99 lookup is a
      // 4-row filter + scalar aggregate broadcast back over the top-10.
      // Quantile arithmetic is the ExactQuantile / quantile_cont
      // bit-equal form: pos=(n−1)p, v_lo(1−f)+v_hi·f.
      val sizes = ev(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
        .withColumn("nd", col("n").cast("double"))
        .localCheckpoint()
      val r = DistRank.rowNumber(sizes, "_rn1", col("nd"),
        Seq(col("nd"), col("user_id")), totalCols = Seq("n"))
      val cnt = r.n
      val total = r.sums("n")
      val rn0 = col("_rn1") - 1L
      def quant(p: Double, out: String) = {
        val pos = (cnt - 1L).toDouble * p
        val lo = math.floor(pos).toLong
        val frac = pos - math.floor(pos)
        val vl = max(when(rn0 === lit(lo), col("nd")))
        val vh = max(when(rn0 === lit(lo + 1L), col("nd")))
        (if (frac == 0.0) vl
         else vl * lit(1.0 - frac) + vh * lit(frac)).as(out)
      }
      val los = Seq(0.5, 0.99).flatMap { p =>
        val lo = math.floor((cnt - 1L).toDouble * p).toLong
        Seq(lo, lo + 1L)
      }
      val qrow = r.df.filter(rn0.isin(los: _*))
        .agg(quant(0.5, "p50_size"), quant(0.99, "p99_size"))
      DistRank.rowNumber(r.df, "_rnk", negate(col("n")),
          Seq(col("n").desc, col("user_id"))).df
        .filter(col("_rnk") <= 10L)
        .crossJoin(broadcast(qrow))
        .select(col("_rnk").cast("int").as("rnk"), col("user_id"),
          col("n").as("n_events"),
          r6(col("n") / lit(total)).as("share"),
          col("p50_size"), col("p99_size"),
          r6(col("nd") / col("p50_size")).as("ratio_to_p50"))
    }))

  val oracles: Map[String, String] = Map(

    "agg_decayed_count" -> {
      val r = math.pow(0.5, 1.0 / 7.0)
      s"""WITH $evDuck,
         |ag AS (SELECT event_type,
         |    ((1706745600000000 - t) // 86400000000)::INTEGER AS d,
         |    count(*)::BIGINT AS cnt FROM ev GROUP BY 1, 2),
         |wt AS (SELECT *, CASE WHEN d <= 0 THEN 1.0::DOUBLE
         |    ELSE list_reduce(list_prepend(1.0::DOUBLE,
         |      list_transform(generate_series(1, d), x -> $r::DOUBLE)),
         |      (a, b) -> a * b) END AS w FROM ag),
         |tm AS (SELECT event_type, cnt,
         |    CAST(round(cnt::DOUBLE * w * 1000000.0) AS BIGINT) AS tm FROM wt)
         |SELECT event_type, sum(cnt)::BIGINT AS n_events,
         |  (round((sum(tm)::DOUBLE / 1000000.0) * 1000000.0) / 1000000.0 + 0.0)
         |    AS decayed_count
         |FROM tm GROUP BY 1""".stripMargin
    },

    "attr_touch" ->
      s"""WITH $evDuck,
         |cv AS (SELECT user_id,
         |    (max(struct_pack(t := t, event_id := event_id))).t AS pt,
         |    (max(struct_pack(t := t, event_id := event_id))).event_id AS pe
         |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
         |tc AS (SELECT e.*, cv.pt FROM ev e JOIN cv ON e.user_id = cv.user_id
         |  WHERE e.event_type <> 'purchase'
         |    AND (e.t < cv.pt OR (e.t = cv.pt AND e.event_id < cv.pe)))
         |SELECT user_id, count(*)::BIGINT AS n_touches,
         |  (min(struct_pack(t := t, event_id := event_id,
         |     event_type := event_type))).event_type AS first_touch,
         |  (max(struct_pack(t := t, event_id := event_id,
         |     event_type := event_type))).event_type AS last_touch,
         |  first(pt) AS conv_t
         |FROM tc GROUP BY user_id""".stripMargin,

    "seg_rfm" ->
      s"""WITH $evDuck,
         |u AS (SELECT user_id, max(t) AS rec, count(*)::BIGINT AS freq,
         |    sum(CAST(round(value * 100.0) AS BIGINT)) AS mc
         |  FROM ev GROUP BY user_id),
         |q AS (SELECT *,
         |    ntile(4) OVER (ORDER BY rec, user_id)::INTEGER AS r_q,
         |    ntile(4) OVER (ORDER BY freq, user_id)::INTEGER AS f_q,
         |    ntile(4) OVER (ORDER BY mc, user_id)::INTEGER AS m_q
         |  FROM u)
         |SELECT user_id, rec, freq, mc / 100.0 AS monetary,
         |  r_q, f_q, m_q, (r_q * 100 + f_q * 10 + m_q)::INTEGER AS rfm
         |FROM q""".stripMargin,

    "behav_markov" ->
      s"""WITH $evDuck,
         |n AS (SELECT event_type, lead(event_type) OVER (
         |    PARTITION BY user_id ORDER BY t, event_id) AS next_type
         |  FROM ev),
         |g AS (SELECT event_type, next_type, count(*)::BIGINT AS n_trans
         |  FROM n WHERE next_type IS NOT NULL GROUP BY event_type, next_type)
         |SELECT event_type, next_type, n_trans,
         |  n_trans / sum(n_trans) OVER (PARTITION BY event_type) AS p
         |FROM g""".stripMargin,

    "behav_path" ->
      s"""WITH $evDuck,
         |n AS (SELECT user_id, event_type AS step1,
         |    lead(event_type, 1) OVER w AS step2,
         |    lead(event_type, 2) OVER w AS step3
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
         |SELECT step1, step2, step3, count(*)::BIGINT AS n_paths,
         |  count(DISTINCT user_id)::BIGINT AS n_users
         |FROM n WHERE step3 IS NOT NULL
         |GROUP BY step1, step2, step3""".stripMargin,

    "ev_json" ->
      """WITH j AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*)::BIGINT AS n, count(k)::BIGINT AS n_k,
        |  sum(k)::BIGINT AS sum_k, min(k)::BIGINT AS min_k,
        |  max(k)::BIGINT AS max_k,
        |  count(DISTINCT k)::BIGINT AS n_distinct_k,
        |  (round((CASE WHEN count(k) = 0 THEN NULL
        |     ELSE CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE) END)
        |   * 1000000.0) / 1000000.0 + 0.0) AS avg_k
        |FROM j GROUP BY 1""".stripMargin,

    "behav_survival" ->
      s"""WITH $evDuck,
         |ud AS (SELECT user_id, min(t // 86400000000 - 19723) AS fd,
         |    max(t // 86400000000 - 19723) AS ld FROM ev GROUP BY 1),
         |uu AS (SELECT (ld - fd + 1)::BIGINT AS dur,
         |    CASE WHEN ld < 27 THEN 1 ELSE 0 END AS evt FROM ud),
         |bd AS (SELECT dur, count(*)::BIGINT AS n_total,
         |    sum(evt)::BIGINT AS d_churn FROM uu GROUP BY 1),
         |rk AS (SELECT a.dur, a.n_total, a.d_churn,
         |    sum(b.n_total)::BIGINT AS n_risk
         |  FROM bd a JOIN bd b ON b.dur >= a.dur GROUP BY 1, 2, 3),
         |rt AS (SELECT *, 1.0::DOUBLE - CAST(d_churn AS DOUBLE)
         |    / CAST(n_risk AS DOUBLE) AS ratio FROM rk),
         |km AS (SELECT x.dur, x.n_risk, x.d_churn,
         |    (x.n_total - x.d_churn)::BIGINT AS c_censored,
         |    list_reduce(list_prepend(1.0::DOUBLE, list_transform(
         |      list_sort(list(struct_pack(ydur := y.dur, yratio := y.ratio))),
         |      p -> p.yratio)), (a, b) -> a * b) AS km0
         |  FROM rt x JOIN rt y ON y.dur <= x.dur GROUP BY 1, 2, 3, 4)
         |SELECT dur, n_risk, d_churn, c_censored,
         |  (round(km0 * 1000000.0) / 1000000.0 + 0.0) AS km FROM km""".stripMargin,

    "ab_bootstrap" ->
      s"""WITH $evDuck,
         |base AS (SELECT user_id % 2 AS arm,
         |    CAST(round(value * 100) AS BIGINT) AS c, event_id
         |  FROM ev WHERE user_id IS NOT NULL),
         |rep AS (SELECT arm, c, b,
         |    ((((event_id % 1000003) * 2654435761 + b * 40503) % 10000)
         |      + 10000) % 10000 AS h
         |  FROM base, generate_series(1, 64) g(b)),
         |wt AS (SELECT arm, b,
         |    CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
         |      WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3
         |      ELSE 4 END::BIGINT AS w, c FROM rep),
         |mn AS (SELECT arm, b, CAST(round((CASE WHEN sum(w) = 0 THEN NULL
         |      ELSE sum(w * c)::DOUBLE / sum(w)::DOUBLE END) * 10000.0)
         |      AS BIGINT) AS m
         |  FROM wt GROUP BY 1, 2),
         |ci AS (SELECT arm, count(*)::BIGINT AS n_reps,
         |    list_sort(list(m)) AS ms
         |  FROM mn WHERE m IS NOT NULL GROUP BY 1 HAVING count(*) = 64)
         |SELECT arm, n_reps,
         |  (round((ms[2]::DOUBLE / 1000000.0) * 1000000.0) / 1000000.0
         |    + 0.0) AS ci_lo,
         |  (round((ms[63]::DOUBLE / 1000000.0) * 1000000.0) / 1000000.0
         |    + 0.0) AS ci_hi
         |FROM ci""".stripMargin,

    "behav_did" ->
      s"""WITH $evDuck,
         |c AS (SELECT user_id, t, CAST(round(value * 100) AS BIGINT) AS c
         |  FROM ev WHERE user_id IS NOT NULL),
         |u AS (SELECT user_id,
         |    sum(CASE WHEN t < 1705363200000000 THEN c ELSE 0 END)::BIGINT AS x,
         |    sum(CASE WHEN t >= 1705363200000000 THEN c ELSE 0 END)::BIGINT AS y
         |  FROM c GROUP BY 1),
         |g AS (SELECT
         |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_treat,
         |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_ctrl,
         |    sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END)::BIGINT AS stx,
         |    sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END)::BIGINT AS sty,
         |    sum(CASE WHEN user_id % 2 <> 0 THEN x ELSE 0 END)::BIGINT AS scx,
         |    sum(CASE WHEN user_id % 2 <> 0 THEN y ELSE 0 END)::BIGINT AS scy
         |  FROM u),
         |m AS (SELECT *,
         |    CASE WHEN n_treat = 0 THEN NULL ELSE
         |      (CAST(stx AS DOUBLE)/100.0)/CAST(n_treat AS DOUBLE) END AS mtp,
         |    CASE WHEN n_treat = 0 THEN NULL ELSE
         |      (CAST(sty AS DOUBLE)/100.0)/CAST(n_treat AS DOUBLE) END AS mtq,
         |    CASE WHEN n_ctrl = 0 THEN NULL ELSE
         |      (CAST(scx AS DOUBLE)/100.0)/CAST(n_ctrl AS DOUBLE) END AS mcp,
         |    CASE WHEN n_ctrl = 0 THEN NULL ELSE
         |      (CAST(scy AS DOUBLE)/100.0)/CAST(n_ctrl AS DOUBLE) END AS mcq
         |  FROM g WHERE n_treat + n_ctrl > 0)
         |SELECT n_treat, n_ctrl,
         |  (round(mtp * 1000000.0) / 1000000.0 + 0.0) AS treat_pre,
         |  (round(mtq * 1000000.0) / 1000000.0 + 0.0) AS treat_post,
         |  (round(mcp * 1000000.0) / 1000000.0 + 0.0) AS ctrl_pre,
         |  (round(mcq * 1000000.0) / 1000000.0 + 0.0) AS ctrl_post,
         |  (round((mtq - mtp - (mcq - mcp)) * 1000000.0) / 1000000.0 + 0.0)
         |    AS did
         |FROM m""".stripMargin,

    "ab_cuped" ->
      s"""WITH $evDuck,
         |c AS (SELECT user_id, t, CAST(round(value * 100) AS BIGINT) AS c
         |  FROM ev),
         |u AS (SELECT user_id,
         |    sum(CASE WHEN t < 1705363200000000 THEN c ELSE 0 END)::BIGINT AS x,
         |    sum(CASE WHEN t >= 1705363200000000 THEN c ELSE 0 END)::BIGINT AS y
         |  FROM c GROUP BY 1),
         |g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |    sum(y)::BIGINT AS sy, sum(x*x)::BIGINT AS sxx,
         |    sum(x*y)::BIGINT AS sxy, sum(y*y)::BIGINT AS syy FROM u),
         |a AS (SELECT user_id % 2 AS arm, count(*)::BIGINT AS n_users,
         |    sum(x)::BIGINT AS sax, sum(y)::BIGINT AS say FROM u GROUP BY 1),
         |th AS (SELECT *,
         |    CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) = 0 THEN NULL
         |      ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
         |        - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         |        / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) END AS theta
         |  FROM a, g)
         |SELECT arm, n_users,
         |  (round(((CAST(sax AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_pre,
         |  (round(((CAST(say AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_post,
         |  (round(((CAST(say AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE)
         |    - theta*((CAST(sax AS DOUBLE)/100.0)/CAST(n_users AS DOUBLE)
         |    - (CAST(sx AS DOUBLE)/100.0)/CAST(n AS DOUBLE)))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_adj,
         |  (round(theta * 1000000.0) / 1000000.0 + 0.0) AS theta,
         |  (round((CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         |      *(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) = 0 THEN NULL
         |    ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         |      *(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         |      / ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         |      *(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS rho2
         |FROM th""".stripMargin,

    "ab_ttest" ->
      s"""WITH $evDuck,
         |c AS (SELECT event_type, user_id % 2 AS arm,
         |    CAST(round(value * 100) AS BIGINT) AS c FROM ev),
         |g AS (SELECT event_type,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 0 THEN c ELSE 0 END)::BIGINT AS sa,
         |    sum(CASE WHEN arm = 0 THEN c*c ELSE 0 END)::BIGINT AS ssa,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         |    sum(CASE WHEN arm = 1 THEN c ELSE 0 END)::BIGINT AS sb,
         |    sum(CASE WHEN arm = 1 THEN c*c ELSE 0 END)::BIGINT AS ssb
         |  FROM c GROUP BY 1
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
         |    va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE) AS se2 FROM v)
         |SELECT event_type, n_a, n_b,
         |  (round(((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_a,
         |  (round(((CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_b,
         |  (round((CASE WHEN sqrt(se2) = 0 THEN NULL
         |     ELSE ((CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)
         |       - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |       / sqrt(se2) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS t_welch,
         |  (round((CASE WHEN (va/CAST(n_a AS DOUBLE))*(va/CAST(n_a AS DOUBLE))
         |       /(CAST(n_a AS DOUBLE) - 1.0)
         |       + (vb/CAST(n_b AS DOUBLE))*(vb/CAST(n_b AS DOUBLE))
         |       /(CAST(n_b AS DOUBLE) - 1.0) = 0 THEN NULL
         |     ELSE se2*se2 / ((va/CAST(n_a AS DOUBLE))*(va/CAST(n_a AS DOUBLE))
         |       /(CAST(n_a AS DOUBLE) - 1.0)
         |       + (vb/CAST(n_b AS DOUBLE))*(vb/CAST(n_b AS DOUBLE))
         |       /(CAST(n_b AS DOUBLE) - 1.0)) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS df
         |FROM s2""".stripMargin,

    "ab_sequential" ->
      s"""WITH $evDuck,
         |c AS (SELECT event_type, t // 86400000000 AS day,
         |    user_id % 2 AS arm,
         |    CAST(round(value * 100) AS BIGINT) AS c FROM ev),
         |d AS (SELECT event_type, day,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS d_na,
         |    sum(CASE WHEN arm = 0 THEN c ELSE 0 END)::BIGINT AS d_sa,
         |    sum(CASE WHEN arm = 0 THEN c*c ELSE 0 END)::BIGINT AS d_ssa,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS d_nb,
         |    sum(CASE WHEN arm = 1 THEN c ELSE 0 END)::BIGINT AS d_sb,
         |    sum(CASE WHEN arm = 1 THEN c*c ELSE 0 END)::BIGINT AS d_ssb
         |  FROM c GROUP BY 1, 2),
         |cu AS (SELECT event_type, day,
         |    (sum(d_na) OVER w)::BIGINT AS n_a,
         |    (sum(d_sa) OVER w)::BIGINT AS sa,
         |    (sum(d_ssa) OVER w)::BIGINT AS ssa,
         |    (sum(d_nb) OVER w)::BIGINT AS n_b,
         |    (sum(d_sb) OVER w)::BIGINT AS sb,
         |    (sum(d_ssb) OVER w)::BIGINT AS ssb
         |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |f AS (SELECT * FROM cu WHERE n_a > 1 AND n_b > 1),
         |v AS (SELECT *,
         |    (CAST(ssa AS DOUBLE)/10000.0 - (CAST(sa AS DOUBLE)/100.0)
         |      *(CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE))
         |      /(CAST(n_a AS DOUBLE) - 1.0) AS va,
         |    (CAST(ssb AS DOUBLE)/10000.0 - (CAST(sb AS DOUBLE)/100.0)
         |      *(CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE))
         |      /(CAST(n_b AS DOUBLE) - 1.0) AS vb
         |  FROM f),
         |s2 AS (SELECT *,
         |    va/CAST(n_a AS DOUBLE) + vb/CAST(n_b AS DOUBLE) AS se2,
         |    (CAST(sa AS DOUBLE)/100.0)/CAST(n_a AS DOUBLE)
         |      - (CAST(sb AS DOUBLE)/100.0)/CAST(n_b AS DOUBLE) AS diff
         |  FROM v),
         |pp AS (SELECT *, CASE WHEN se2 <= 0 THEN NULL ELSE
         |    least(CAST(1.0 AS DOUBLE), sqrt((se2 + 1.0)/se2)
         |      * exp(-(diff*diff)/(2.0*se2*(se2 + 1.0)))) END AS p
         |  FROM s2),
         |pm AS (SELECT *, min(p) OVER (PARTITION BY event_type
         |    ORDER BY day) AS p_min FROM pp)
         |SELECT event_type, day, n_a, n_b,
         |  (round(diff * 1000000.0) / 1000000.0 + 0.0) AS diff,
         |  (round(p * 1000000.0) / 1000000.0 + 0.0) AS p_seq,
         |  (round(p_min * 1000000.0) / 1000000.0 + 0.0) AS p_min,
         |  p_min < CAST(0.05 AS DOUBLE) AS signif
         |FROM pm""".stripMargin,

    "dedup_editdist" ->
      s"""WITH ${ExtCommon.candPairsDuck},
         |tx AS (SELECT cp.a, cp.b, da.text AS ta, db3.text AS tb
         |  FROM cp JOIN dt da ON da.doc_id = cp.a
         |  JOIN dt db3 ON db3.doc_id = cp.b)
         |SELECT a, b, levenshtein(ta, tb)::BIGINT AS edit_dist,
         |  (round((1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
         |     / greatest(length(ta), length(tb))) * 1000000.0)
         |   / 1000000.0 + 0.0) AS edit_sim
         |FROM tx""".stripMargin,

    "graph_degree" ->
      s"""WITH ${ExtCommon.lshPairsDuck},
         |dg AS (SELECT id, count(*)::BIGINT AS deg FROM (
         |    SELECT a AS id FROM pr UNION ALL SELECT b FROM pr)
         |  GROUP BY id),
         |al AS (SELECT doc_id::BIGINT AS id FROM documents)
         |SELECT coalesce(dg.deg, 0)::BIGINT AS degree,
         |  count(*)::BIGINT AS n_nodes
         |FROM al LEFT JOIN dg ON al.id = dg.id
         |GROUP BY degree""".stripMargin,

    "graph_assortativity" ->
      s"""WITH ${ExtCommon.lshPairsDuck},
         |adg AS (SELECT id, count(*)::BIGINT AS deg FROM (
         |    SELECT a AS id FROM pr UNION ALL SELECT b FROM pr)
         |  GROUP BY id),
         |abo AS (SELECT a, b FROM pr UNION ALL SELECT b AS a, a AS b FROM pr),
         |aj AS (SELECT da.deg AS da, db.deg AS db FROM abo
         |  JOIN adg da ON da.id = abo.a JOIN adg db ON db.id = abo.b),
         |am AS (SELECT count(*)::BIGINT AS n, sum(da)::BIGINT AS sx,
         |    sum(da::HUGEINT * db) AS sxy, sum(da::HUGEINT * da) AS sxx
         |  FROM aj)
         |SELECT n AS n_samples,
         |  (round(sx::DOUBLE / n::DOUBLE, 6) + 0.0) AS mean_deg,
         |  (round(CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0
         |     THEN NULL ELSE
         |     (n::HUGEINT * sxy - sx::HUGEINT * sx)::DOUBLE
         |       / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE END
         |   * 1000000.0) / 1000000.0 + 0.0) AS assortativity
         |FROM am WHERE n > 0""".stripMargin,

    "graph_triangles" ->
      s"""WITH ${ExtCommon.lshPairsDuck},
         |tr AS (SELECT count(*)::BIGINT AS n_triangles
         |  FROM pr e1 JOIN pr e2 ON e1.b = e2.a
         |  JOIN pr e3 ON e3.a = e1.a AND e3.b = e2.b),
         |ne AS (SELECT count(*)::BIGINT AS n_edges FROM pr),
         |dg AS (SELECT id, count(*)::BIGINT AS d FROM (
         |    SELECT a AS id FROM pr UNION ALL SELECT b FROM pr)
         |  GROUP BY id),
         |wg AS (SELECT CAST(coalesce(sum(d * (d - 1) / 2), 0.0) AS BIGINT)
         |    AS n_wedges FROM dg)
         |SELECT n_edges, n_triangles, n_wedges,
         |  CASE WHEN n_wedges > 0
         |    THEN (3.0 * n_triangles) / n_wedges END AS clustering
         |FROM ne, tr, wg WHERE n_edges > 0""".stripMargin,

    "graph_local_cc" ->
      s"""WITH ${ExtCommon.lshPairsDuck},
         |t3 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM pr e1 JOIN pr e2 ON e1.b = e2.a
         |  JOIN pr e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tn AS (SELECT id, count(*)::BIGINT AS n_tri FROM (
         |    SELECT x AS id FROM t3 UNION ALL SELECT y FROM t3
         |    UNION ALL SELECT z FROM t3) GROUP BY id),
         |dg AS (SELECT id, count(*)::BIGINT AS d FROM (
         |    SELECT a AS id FROM pr UNION ALL SELECT b FROM pr)
         |  GROUP BY id),
         |al AS (SELECT doc_id::BIGINT AS id FROM documents)
         |SELECT al.id AS doc_id, coalesce(dg.d, 0)::BIGINT AS degree,
         |  coalesce(tn.n_tri, 0)::BIGINT AS n_tri,
         |  (round((CASE WHEN coalesce(dg.d, 0) >= 2 THEN
         |    2.0 * coalesce(tn.n_tri, 0)::DOUBLE
         |    / (dg.d::DOUBLE * (dg.d - 1)::DOUBLE) END) * 1000000.0)
         |   / 1000000.0 + 0.0) AS lcc
         |FROM al LEFT JOIN dg ON al.id = dg.id
         |LEFT JOIN tn ON al.id = tn.id""".stripMargin,

    "behav_cohort_ltv" ->
      s"""WITH $evDuck,
         |u AS (SELECT user_id,
         |    min(t // 604800000000) AS cohort_wk,
         |    sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(round(value * 100) AS BIGINT)
         |      ELSE 0 END)::BIGINT AS pc,
         |    count(*)::BIGINT AS ne
         |  FROM ev GROUP BY 1)
         |SELECT cohort_wk, count(*)::BIGINT AS n_users,
         |  (round((CAST(sum(pc) AS DOUBLE) / 100.0
         |    / CAST(count(*) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS avg_ltv,
         |  (round((CAST(sum(ne) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS avg_events
         |FROM u GROUP BY 1""".stripMargin,

    "agg_pareto" ->
      s"""WITH $evDuck,
         |u AS (SELECT user_id,
         |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS x
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
         |r AS (SELECT x,
         |    row_number() OVER (ORDER BY x DESC, user_id)::BIGINT AS rk,
         |    count(*) OVER ()::BIGINT AS n FROM u),
         |r2 AS (SELECT *, (n + 9) // 10 AS ntop FROM r),
         |g AS (SELECT max(n)::BIGINT AS n_users,
         |    max(ntop)::BIGINT AS n_top, sum(x)::BIGINT AS sx,
         |    sum(CASE WHEN rk <= ntop THEN x ELSE 0 END)::BIGINT AS tx
         |  FROM r2)
         |SELECT n_users, n_top,
         |  (round((CAST(sx AS DOUBLE) / 100.0)
         |   * 1000000.0) / 1000000.0 + 0.0) AS total_spend,
         |  (round((CASE WHEN sx = 0 THEN NULL
         |     ELSE CAST(tx AS DOUBLE) / CAST(sx AS DOUBLE) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS top10_share
         |FROM g WHERE n_users IS NOT NULL""".stripMargin,

    "agg_gini" ->
      s"""WITH $evDuck,
         |u AS (SELECT user_id,
         |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS x
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
         |r AS (SELECT x,
         |    row_number() OVER (ORDER BY x, user_id)::BIGINT AS i FROM u),
         |g AS (SELECT count(*)::BIGINT AS n_users, sum(x)::BIGINT AS sx,
         |    sum(i * x)::BIGINT AS sixi FROM r)
         |SELECT n_users,
         |  (round((CAST(sx AS DOUBLE) / 100.0)
         |   * 1000000.0) / 1000000.0 + 0.0) AS total_spend,
         |  (round((CASE WHEN CAST(n_users AS DOUBLE)*CAST(sx AS DOUBLE) = 0
         |     THEN NULL
         |     ELSE (2.0*CAST(sixi AS DOUBLE)
         |       - (CAST(n_users AS DOUBLE) + 1.0)*CAST(sx AS DOUBLE))
         |       / (CAST(n_users AS DOUBLE)*CAST(sx AS DOUBLE)) END)
         |   * 1000000.0) / 1000000.0 + 0.0) AS gini
         |FROM g WHERE n_users > 0""".stripMargin,

    "behav_ltv" ->
      s"""WITH $evDuck,
         |c AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS c FROM ev)
         |SELECT user_id, count(*)::BIGINT AS n_events,
         |  first(event_type ORDER BY t, event_id) AS first_type,
         |  last(event_type ORDER BY t, event_id) AS last_type,
         |  (round((CAST(max(t) - min(t) AS DOUBLE) / 86400000000.0)
         |   * 1000000.0) / 1000000.0 + 0.0) AS tenure_days,
         |  (round((CAST(sum(CASE WHEN event_type = 'purchase' THEN c
         |      ELSE 0 END) AS DOUBLE) / 100.0)
         |   * 1000000.0) / 1000000.0 + 0.0) AS ltv,
         |  sum(CASE WHEN event_type = 'purchase' THEN 1
         |    ELSE 0 END)::BIGINT AS n_purchases
         |FROM c GROUP BY 1""".stripMargin,

    "agg_mode" ->
      s"""WITH $evDuck,
         |g AS (SELECT user_id, event_type, count(*)::BIGINT AS n
         |  FROM ev GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY n DESC, event_type DESC) AS rk,
         |    sum(n) OVER (PARTITION BY user_id)::BIGINT AS n_events
         |  FROM g)
         |SELECT user_id, event_type AS mode_type, n AS n_mode, n_events
         |FROM r WHERE rk = 1""".stripMargin,

    "graph_jaccard" ->
      s"""WITH ${ExtCommon.lshPairsDuck},
         |sym AS (SELECT a AS u, b AS v FROM pr
         |  UNION ALL SELECT b, a FROM pr),
         |deg AS (SELECT u, count(*)::BIGINT AS d FROM sym GROUP BY 1),
         |cn AS (SELECT e.a, e.b, count(*)::BIGINT AS nc0
         |  FROM pr e JOIN sym x ON e.a = x.u
         |  JOIN sym y ON e.b = y.u AND x.v = y.v
         |  GROUP BY 1, 2)
         |SELECT e.a, e.b, coalesce(cn.nc0, 0)::BIGINT AS n_common,
         |  da.d AS deg_a, db2.d AS deg_b,
         |  (round((CASE
         |     WHEN da.d + db2.d - 2 - coalesce(cn.nc0, 0) = 0 THEN NULL
         |     ELSE CAST(coalesce(cn.nc0, 0) AS DOUBLE)
         |       / CAST(da.d + db2.d - 2 - coalesce(cn.nc0, 0) AS DOUBLE)
         |   END) * 1000000.0) / 1000000.0 + 0.0) AS jaccard
         |FROM pr e
         |LEFT JOIN cn ON e.a = cn.a AND e.b = cn.b
         |JOIN deg da ON e.a = da.u
         |JOIN deg db2 ON e.b = db2.u""".stripMargin,

    "text_pmi" ->
      s"""WITH dtt AS (SELECT doc_id::BIGINT AS doc_id,
         |    ${TextOps.toksDuck} AS toks FROM documents),
         |u AS (SELECT doc_id, unnest(toks) AS w,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM dtt WHERE len(toks) > 1),
         |bg AS (SELECT u1.w AS w1, u2.w AS w2
         |  FROM u u1 JOIN u u2
         |    ON u1.doc_id = u2.doc_id AND u2.pos = u1.pos + 1),
         |bgc AS (SELECT w1, w2, count(*)::BIGINT AS n_pair
         |  FROM bg GROUP BY w1, w2),
         |uni AS (SELECT w, count(*)::BIGINT AS c FROM (
         |    SELECT unnest(toks) AS w FROM dtt) GROUP BY w),
         |tot AS (SELECT sum(len(toks)) AS n1,
         |    sum(CASE WHEN len(toks) > 1 THEN len(toks) - 1 ELSE 0 END) AS n2
         |  FROM dtt)
         |SELECT b.w1, b.w2, b.n_pair,
         |  (round((ln((b.n_pair / n2)
         |     / ((ux.c / n1) * (uy.c / n1)))) * 1000000.0)
         |   / 1000000.0 + 0.0) AS pmi
         |FROM bgc b JOIN uni ux ON ux.w = b.w1
         |JOIN uni uy ON uy.w = b.w2, tot
         |WHERE b.n_pair >= 5""".stripMargin,

    "text_bm25" ->
      s"""WITH dd AS (SELECT doc_id::BIGINT AS doc_id,
         |    ${TextOps.toksDuck} AS toks FROM documents),
         |f AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         |    len(list_filter(toks, x -> x = 'join'))::DOUBLE AS tf1,
         |    len(list_filter(toks, x -> x = 'hash'))::DOUBLE AS tf2,
         |    len(list_filter(toks, x -> x = 'vector'))::DOUBLE AS tf3
         |  FROM dd),
         |st AS (SELECT count(*)::BIGINT AS nd, sum(dl) AS sdl,
         |    count(*) FILTER (WHERE tf1 > 0)::BIGINT AS df1,
         |    count(*) FILTER (WHERE tf2 > 0)::BIGINT AS df2,
         |    count(*) FILTER (WHERE tf3 > 0)::BIGINT AS df3
         |  FROM f),
         |sc AS (SELECT doc_id, tf1, tf2, tf3, dl, sdl / nd AS avgdl,
         |    nd, df1, df2, df3 FROM f, st),
         |s2 AS (SELECT *,
         |    ln(1.0 + (nd - df1 + 0.5) / (df1 + 0.5))
         |      * ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)))
         |    + ln(1.0 + (nd - df2 + 0.5) / (df2 + 0.5))
         |      * ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)))
         |    + ln(1.0 + (nd - df3 + 0.5) / (df3 + 0.5))
         |      * ((tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)))
         |    AS score FROM sc)
         |SELECT doc_id,
         |  ((tf1 > 0)::INTEGER + (tf2 > 0)::INTEGER + (tf3 > 0)::INTEGER)
         |    ::INTEGER AS n_terms_hit,
         |  (round(score * 1000000.0) / 1000000.0 + 0.0) AS bm25
         |FROM s2 WHERE score > 0""".stripMargin,

    "bin_equidepth" ->
      """WITH li AS (SELECT l_extendedprice AS price, l_orderkey,
        |    l_linenumber FROM lineitem),
        |b AS (SELECT *,
        |    ntile(10) OVER (ORDER BY price, l_orderkey, l_linenumber)
        |      ::INTEGER AS bin,
        |    CAST(round(price * 100.0) AS BIGINT) AS cents
        |  FROM li)
        |SELECT bin, count(*)::BIGINT AS n_rows,
        |  min(price) AS min_price, max(price) AS max_price,
        |  (round((sum(cents) / 100.0 / count(*)) * 1000000.0)
        |   / 1000000.0 + 0.0) AS avg_price
        |FROM b GROUP BY bin""".stripMargin,

    "key_skew" ->
      s"""WITH $evDuck,
         |sz AS (SELECT user_id, count(*)::BIGINT AS n FROM ev
         |  GROUP BY user_id),
         |q AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50_size,
         |    quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99_size,
         |    sum(n) AS total FROM sz),
         |r AS (SELECT *, row_number() OVER (ORDER BY n DESC, user_id)
         |    ::INTEGER AS rnk FROM sz)
         |SELECT rnk, user_id, n AS n_events,
         |  (round((n / total) * 1000000.0) / 1000000.0 + 0.0) AS share,
         |  p50_size, p99_size,
         |  (round((CAST(n AS DOUBLE) / p50_size) * 1000000.0)
         |   / 1000000.0 + 0.0) AS ratio_to_p50
         |FROM r, q WHERE rnk <= 10""".stripMargin)
}
