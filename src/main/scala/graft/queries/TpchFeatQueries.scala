package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** TPC-H Q6/Q14/Q18 shapes plus the feature-engineering projections a
  * training pipeline bolts onto the warehouse: smoothed target
  * encoding, min-max scaling, and a Gopher-style per-source document
  * quality gate.
  *
  * Scale notes: Q6 is a pure scan-side filter + scalar aggregate
  * (predicate pushdown does the work); Q14/Q18's SF-scaling sides (part,
  * customer, the having-filtered order rollup) join hint-free — AQE
  * broadcasts them at gate SFs, shuffles at 100×;
  * so the big lineitem table shuffles exactly once (its groupBy). The
  * feature encoders broadcast O(|event types|) stats back over the
  * stream; the quality gate is one scan + one per-source aggregate
  * whose rule flags are all exact-integer comparisons (no float crosses
  * a shuffle unquantized; ratio divisions happen on the aggregated
  * counts).
  */
object TpchFeatQueries {

  private val r4 = Rounding.r4 _
  private val r6 = Rounding.r6 _

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def ev(s: SparkSession, dir: String): DataFrame =
    EventBars.events(s, dir).select(
      col("event_id"), col("event_type"), col("value"))

  private val evDuck =
    """ev AS (SELECT event_id, event_type, value FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q6 shape: forecast-revenue-change — a pure pushed-down
    // filter over one fact table and a scalar aggregate.
    "q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07)
          && col("l_quantity") < lit(24.0))
        // constant-group so empty input yields ZERO rows (engine-wide
        // empty-in → empty-out invariant), not a null scalar row
        .groupBy(lit(true).as("_g"))
        .agg(
          r4(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .drop("_g")),

    // TPC-H Q14 shape: promo revenue share in one ship month; `part`
    // joined hint-free (SF-scaling), single scalar output.
    "q14_promo_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(lit(true).as("_g"))
        .agg(
          r4(sum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0.0))))
            .as("promo_revenue"),
          r4(sum(rev)).as("total_revenue"),
          r6(lit(100.0)
            * sum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0.0)))
            / sum(rev)).as("promo_share"),
          count(lit(1)).as("n_items"))
        .drop("_g")
    }),

    // TPC-H Q18 shape: large-volume orders. The having-filtered order
    // rollup and customer join hint-free (both SF-scaling; AQE picks
    // broadcast at gate SFs) — lineitem shuffles on its own groupBy.
    "q18_big_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > lit(150.0))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          r4(col("sum_qty")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Smoothed target encoding of event_type against value (m = 100
    // pseudo-observations of the global mean). Sums cross the shuffle
    // as exact cent-longs; the blend is a textually-mirrored scalar on
    // the aggregated integers.
    "feat_target_encode" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("cents", round(col("value") * lit(100.0)).cast("long"))
      val g = e.agg(sum(col("cents")).as("gs"), count(lit(1)).as("gn"))
      e.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
        .crossJoin(broadcast(g))
        .select(col("event_type"), col("n"),
          r6(col("sc").cast("double") / col("n").cast("double") / lit(100.0))
            .as("mean_value"),
          r6((col("sc").cast("double")
            + lit(100.0) * (col("gs").cast("double") / col("gn").cast("double")))
            / (col("n") + 100L).cast("double") / lit(100.0)).as("enc_value"))
    }),

    // Min-max scaling per event type: per-type bounds broadcast back
    // over the stream; comparisons/extremes are exact, the one divide
    // is per-row and mirrored.
    "feat_minmax" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull)
      val stats = e.groupBy("event_type")
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      e.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"),
          r6(try_divide(col("value") - col("mn"), col("mx") - col("mn")))
            .as("scaled"))
    }),

    // Gopher-style quality gate: per (source, rule) doc counts and
    // fail rates. Every rule flag is an exact-integer comparison
    // (token counts, summed token lengths, digit counts) — no float
    // leaves the row until the final aggregated fail-rate division.
    "corpus_gopher" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("toks", expr(TextOps.toksSpark))
        .withColumn("nw", expr("CAST(size(toks) AS BIGINT)"))
        .withColumn("nd", expr("CAST(size(array_distinct(toks)) AS BIGINT)"))
        .withColumn("sum_len", expr(
          "aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)), 0L, (a, b) -> a + b)"))
        .withColumn("nc", expr("CAST(length(text) AS BIGINT)"))
        .withColumn("ndig", expr(
          "nc - CAST(length(regexp_replace(text, '[0-9]', '')) AS BIGINT)"))
        .select(col("source"),
          when(col("nw") < 15L, 1L).otherwise(0L).as("f_short"),
          when(col("nw") > 80L, 1L).otherwise(0L).as("f_long"),
          when(col("sum_len") < lit(3L) * col("nw")
            || col("sum_len") > lit(8L) * col("nw"), 1L).otherwise(0L)
            .as("f_wordlen"),
          when(lit(2L) * col("nd") < col("nw"), 1L).otherwise(0L)
            .as("f_repeat"),
          when(lit(5L) * col("ndig") > col("nc"), 1L).otherwise(0L)
            .as("f_digit"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f_short")).as("s1"), sum(col("f_long")).as("s2"),
          sum(col("f_wordlen")).as("s3"), sum(col("f_repeat")).as("s4"),
          sum(col("f_digit")).as("s5"))
        .select(col("source"), col("n_docs"), expr(
          "stack(5, 'short', s1, 'long', s2, 'wordlen', s3, " +
            "'repeat', s4, 'digit', s5) AS (rule, n_fail)"))
        .select(col("source"), col("rule"), col("n_docs"), col("n_fail"),
          r6(col("n_fail").cast("double") / col("n_docs").cast("double"))
            .as("fail_rate"))
    }))

  val oracles: Map[String, String] = Map(

    "q6_forecast" ->
      """SELECT (round(sum(l_extendedprice * l_discount), 4) + 0.0) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24.0
        |GROUP BY (1 = 1)""".stripMargin,

    "q14_promo_share" ->
      """SELECT
        |  (round(sum(CASE WHEN p_type = 'ECONOMY'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4) + 0.0)
        |    AS promo_revenue,
        |  (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0)
        |    AS total_revenue,
        |  (round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1.0 - l_discount)), 6) + 0.0)
        |    AS promo_share,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
        |GROUP BY (1 = 1)""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 150.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  (round(sum_qty, 4) + 0.0) AS sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "feat_target_encode" ->
      s"""WITH $evDuck,
         |e AS (SELECT event_type,
         |    CAST(round(value * 100.0) AS BIGINT) AS cents
         |  FROM ev WHERE value IS NOT NULL),
         |g AS (SELECT CAST(sum(cents) AS BIGINT) AS gs, count(*) AS gn FROM e),
         |p AS (SELECT event_type, count(*) AS n,
         |    CAST(sum(cents) AS BIGINT) AS sc
         |  FROM e GROUP BY event_type)
         |SELECT event_type, n,
         |  (round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) + 0.0)
         |    AS mean_value,
         |  (round((CAST(sc AS DOUBLE)
         |    + 100.0 * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
         |    / CAST(n + 100 AS DOUBLE) / 100.0, 6) + 0.0) AS enc_value
         |FROM p CROSS JOIN g""".stripMargin,

    "feat_minmax" ->
      s"""WITH $evDuck,
         |e AS (SELECT event_id, event_type, value FROM ev
         |  WHERE value IS NOT NULL),
         |stats AS (SELECT event_type, min(value) AS mn, max(value) AS mx
         |  FROM e GROUP BY event_type)
         |SELECT event_id, e.event_type,
         |  (round(CASE WHEN mx - mn <> 0 THEN (value - mn) / (mx - mn) END, 6)
         |    + 0.0) AS scaled
         |FROM e JOIN stats ON e.event_type = stats.event_type""".stripMargin,

    "corpus_gopher" ->
      s"""WITH d AS (
         |  SELECT source, text, ${TextOps.toksDuck} AS toks,
         |    length(text)::BIGINT AS nc
         |  FROM documents),
         |f AS (
         |  SELECT source,
         |    len(toks)::BIGINT AS nw,
         |    len(list_distinct(toks))::BIGINT AS nd,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(toks, t -> length(t)::BIGINT)),
         |      (a, b) -> a + b) AS sum_len,
         |    nc,
         |    nc - length(regexp_replace(text, '[0-9]', '', 'g'))::BIGINT
         |      AS ndig
         |  FROM d),
         |flags AS (
         |  SELECT source,
         |    CASE WHEN nw < 15 THEN 1 ELSE 0 END AS f_short,
         |    CASE WHEN nw > 80 THEN 1 ELSE 0 END AS f_long,
         |    CASE WHEN sum_len < 3 * nw OR sum_len > 8 * nw
         |      THEN 1 ELSE 0 END AS f_wordlen,
         |    CASE WHEN 2 * nd < nw THEN 1 ELSE 0 END AS f_repeat,
         |    CASE WHEN 5 * ndig > nc THEN 1 ELSE 0 END AS f_digit
         |  FROM f),
         |agg AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(f_short) AS BIGINT) AS s1,
         |    CAST(sum(f_long) AS BIGINT) AS s2,
         |    CAST(sum(f_wordlen) AS BIGINT) AS s3,
         |    CAST(sum(f_repeat) AS BIGINT) AS s4,
         |    CAST(sum(f_digit) AS BIGINT) AS s5
         |  FROM flags GROUP BY source),
         |u AS (
         |  SELECT source, n_docs, 'short' AS rule, s1 AS n_fail FROM agg
         |  UNION ALL SELECT source, n_docs, 'long', s2 FROM agg
         |  UNION ALL SELECT source, n_docs, 'wordlen', s3 FROM agg
         |  UNION ALL SELECT source, n_docs, 'repeat', s4 FROM agg
         |  UNION ALL SELECT source, n_docs, 'digit', s5 FROM agg)
         |SELECT source, rule, n_docs, n_fail,
         |  (round(CAST(n_fail AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) + 0.0)
         |    AS fail_rate
         |FROM u""".stripMargin)
}
