package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The remaining TPC-H shapes expressible on this schema (no partsupp /
  * shipmode / phone columns in the driver's tables): Q8 market share,
  * Q13 order-count distribution, Q15 top supplier, Q17 small-quantity
  * revenue, Q22 idle customers.
  *
  * Scale notes: the only big⋈big join in the family is Q8's
  * lineitem⋈orders, which shuffles each side once on l_orderkey /
  * o_orderkey; every dimension (customer, supplier, nation, region,
  * part) and every tiny post-aggregate (Q15's max, Q17's per-part
  * thresholds, Q22's scalar average) is broadcast. Monetary sums cross
  * shuffles as exact 1e-4-unit longs (prices are cent-exact, discounts
  * hundredths — see FIXTURES.md), so no double summation order can
  * flip a bit; divisions happen once, on the aggregated integers, with
  * the expression text mirrored in the oracle.
  */
object Tpch2Queries {

  private val r4 = Rounding.r4 _
  private val r6 = Rounding.r6 _

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** revenue l_extendedprice*(1-l_discount) in exact 1e-4 units. */
  private def rev4: org.apache.spark.sql.Column = {
    val ep = round(col("l_extendedprice") * lit(100.0)).cast("long")
    val dc = round(col("l_discount") * lit(100.0)).cast("long")
    ep * lit(100L) - ep * dc
  }

  private val rev4Sql =
    """(CAST(round(l_extendedprice * 100.0) AS BIGINT) * 100
      | - CAST(round(l_extendedprice * 100.0) AS BIGINT)
      |   * CAST(round(l_discount * 100.0) AS BIGINT))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q8 shape: per-order-year market share of each supplier
    // nation within the ASIA customer region. lineitem⋈orders is the
    // one big shuffle join; customer/supplier/nation/region broadcast;
    // the per-year total rides a window over the tiny aggregate.
    "q8_market_share" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val cust = t(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supNat = t(s, dir, "supplier")
        .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val byNation = t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"), col("supp_nation"))
        // DECIMAL(38,0) accumulator: per-line rev4 is ~5e8 in 1e-4
        // units, so a LONG per-year total sits within ~1.4× of
        // Long.MaxValue around 1e10 matching rows — real 100 TB
        // territory. The decimal sum is exact to 1e38 (mirrors
        // DuckDB's HUGEINT sum) and converts to the identical double
        // downstream, so the hash is unchanged at every SF.
        .agg(sum(rev4.cast("decimal(38,0)")).as("rev4"),
          count(lit(1)).as("n_items"))
      byNation
        .withColumn("tot4", sum(col("rev4"))
          .over(Window.partitionBy(col("o_year"))))
        .select(col("o_year"), col("supp_nation"), col("n_items"),
          r4(col("rev4").cast("double") / lit(10000.0)).as("revenue"),
          r6(col("rev4").cast("double") / col("tot4").cast("double"))
            .as("mkt_share"))
    }),

    // TPC-H Q13 shape: distribution of per-customer order counts,
    // including zero-order customers (left join). Integer-only output:
    // two key shuffles (o_custkey rollup, count histogram), customer
    // side exchange-aligned with the rollup.
    "q13_order_dist" -> ((s, dir) => {
      val counts = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count"))
      t(s, dir, "customer")
        .join(counts, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    // quarter. The per-supplier rollup is tiny (|supplier| rows): the
    // max rides a window over it, supplier broadcast on top.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        // decimal(38,0) for the same Long-headroom reason as q8
        .agg(sum(rev4.cast("decimal(38,0)")).as("rev4"))
        .localCheckpoint() // |suppliers| rows; one lineitem scan
      rev
        .crossJoin(broadcast(rev.agg(max(col("rev4")).as("max4"))))
        .filter(col("rev4") === col("max4"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          r4(col("rev4").cast("double") / lit(10000.0)).as("total_revenue"))
    }),

    // TPC-H Q17 shape: yearly revenue loss if small-quantity orders
    // for one brand stopped. The threshold compare is exact-integer:
    // qty < 0.2·avg(qty)  ⟺  5·qc·n < sum_qc  (qty is cent-exact).
    // Per-part thresholds broadcast back into the brand-filtered probe.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("qc", round(col("l_quantity") * lit(100.0)).cast("long"))
        .withColumn("ec", round(col("l_extendedprice") * lit(100.0))
          .cast("long"))
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("qc")).as("sum_qc"), count(lit(1)).as("n_li"))
      li.join(broadcast(thr), col("l_partkey") === col("t_partkey"))
        .filter(col("qc") * lit(5L) * col("n_li") < col("sum_qc"))
        .groupBy(lit(true).as("_g"))
        .agg(sum(col("ec")).as("sum_ec"), count(lit(1)).as("n_small"))
        .select(
          r4(col("sum_ec").cast("double") / lit(100.0) / lit(7.0))
            .as("avg_yearly"),
          col("n_small"))
    }),

    // TPC-H Q22 shape: "idle" customers — account balance above the
    // average positive balance, no orders in the recent window — by
    // market segment (stand-in for the phone-prefix cut; the driver
    // schema has no c_phone). Scalar average broadcast; the anti-join
    // shuffles on custkey, which is the correct 100 TB shape (order
    // custkeys are fact-sized, not broadcastable).
    "q22_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .withColumn("bc", round(col("c_acctbal") * lit(100.0)).cast("long"))
      val avgPos = cust.filter(col("bc") > 0L)
        .groupBy(lit(true).as("_g"))
        .agg(sum(col("bc")).as("s"), count(lit(1)).as("n"))
        .select((col("s").cast("double") / col("n").cast("double"))
          .as("avg_bc"))
      cust
        .crossJoin(broadcast(avgPos))
        .filter(col("bc").cast("double") > col("avg_bc"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          r4(sum(col("bc")).cast("double") / lit(100.0)).as("totacctbal"))
    }))

  val oracles: Map[String, String] = Map(

    "q8_market_share" ->
      s"""WITH cust AS (
         |  SELECT c_custkey FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'),
         |ord AS (
         |  SELECT o_orderkey, EXTRACT(year FROM o_orderdate) AS o_year
         |  FROM orders JOIN cust ON o_custkey = c_custkey
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
         |bynat AS (
         |  SELECT o_year, n_name AS supp_nation,
         |    sum($rev4Sql) AS rev4,
         |    count(*) AS n_items
         |  FROM lineitem
         |  JOIN ord ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY 1, 2)
         |SELECT o_year, supp_nation, n_items,
         |  (round(CAST(rev4 AS DOUBLE) / 10000.0, 4) + 0.0) AS revenue,
         |  (round(CAST(rev4 AS DOUBLE)
         |    / CAST(sum(rev4) OVER (PARTITION BY o_year) AS DOUBLE), 6) + 0.0)
         |    AS mkt_share
         |FROM bynat""".stripMargin,

    "q13_order_dist" ->
      """WITH counts AS (
        |  SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY 1)
        |SELECT coalesce(c_count, 0) AS c_count, count(*) AS custdist
        |FROM customer LEFT JOIN counts ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($rev4Sql) AS rev4
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name,
         |  (round(CAST(rev4 AS DOUBLE) / 10000.0, 4) + 0.0) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev4 = (SELECT max(rev4) FROM rev)""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(round(l_quantity * 100.0) AS BIGINT) AS qc,
        |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS ec
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |thr AS (
        |  SELECT l_partkey AS t_partkey, CAST(sum(qc) AS BIGINT) AS sum_qc,
        |    count(*) AS n_li
        |  FROM li GROUP BY 1)
        |SELECT
        |  (round(CAST(sum(ec) AS DOUBLE) / 100.0 / 7.0, 4) + 0.0)
        |    AS avg_yearly,
        |  count(*) AS n_small
        |FROM li JOIN thr ON l_partkey = t_partkey
        |WHERE qc * 5 * n_li < sum_qc
        |GROUP BY (1 = 1)""".stripMargin,

    "q22_idle_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100.0) AS BIGINT) AS bc
        |  FROM customer),
        |avgpos AS (
        |  SELECT CAST(sum(bc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bc
        |  FROM cust WHERE bc > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  (round(CAST(sum(bc) AS DOUBLE) / 100.0, 4) + 0.0) AS totacctbal
        |FROM cust, avgpos
        |WHERE CAST(bc AS DOUBLE) > avg_bc
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1""".stripMargin)
}
