package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The remaining TPC-H shapes expressed on this schema (no partsupp /
  * shipmode / phone / commit-receipt columns in the driver's tables;
  * where TPC-H needs one, the nearest present column stands in and the
  * header of each query names the substitution): Q2 min-cost supplier,
  * Q4 priority returns, Q8 market share, Q9 product profit, Q11
  * important stock, Q12 late shipments, Q13 order-count distribution,
  * Q15 top supplier, Q16 supplier counts, Q17 small-quantity revenue,
  * Q19 disjunctive revenue, Q20 heavy shippers, Q21 waiting supplier,
  * Q22 idle customers.
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
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val byNation = t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supNat, col("l_suppkey") === col("s_suppkey"))
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
        .join(t(s, dir, "supplier"),
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
        .join(t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23"),
          col("l_partkey") === col("p_partkey"))
        .withColumn("qc", round(col("l_quantity") * lit(100.0)).cast("long"))
        .withColumn("ec", round(col("l_extendedprice") * lit(100.0))
          .cast("long"))
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("qc")).as("sum_qc"), count(lit(1)).as("n_li"))
      li.join(thr, col("l_partkey") === col("t_partkey"))
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
    }),

    // TPC-H Q2 shape: the cheapest EUROPE supplier per SMALL part. No
    // partsupp in this schema, so the offer table is lineitem's
    // (part, supplier) min-price rollup — ONE fact exchange,
    // materialized once; part and supplier⋈nation⋈region dims
    // broadcast into it, and the per-part min broadcasts back
    // (|parts|-bounded). Prices compare as exact cents.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val supEur = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val pt = t(s, dir, "part").filter(col("p_type") === "SMALL")
        .select(col("p_partkey"), col("p_name"))
      val offers = t(s, dir, "lineitem")
        .withColumn("pc", round(col("l_extendedprice") * lit(100.0))
          .cast("long"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("pc")).as("cost_c"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(supEur, col("l_suppkey") === col("s_suppkey"))
        .localCheckpoint()
      val minPer = offers.groupBy(col("p_partkey").as("m_partkey"))
        .agg(min(col("cost_c")).as("min_c"))
      offers.join(minPer,
          col("p_partkey") === col("m_partkey")
            && col("cost_c") === col("min_c"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          r4(col("cost_c").cast("double") / lit(100.0)).as("min_price"))
    }),

    // TPC-H Q4 shape: order-priority counts over quarter orders with
    // ≥1 RETURNED lineitem (returnflag stands in for the schema's
    // missing commit/receipt dates). Orderkey semi-join — each side
    // shuffles once; the priority rollup is 5 rows.
    "q4_priority_returns" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))),

    // TPC-H Q9 shape: per-nation per-year profit on 'gear' parts;
    // profit = revenue − retailprice·qty, per-line in exact 1e-4
    // longs, accumulated in DECIMAL(38,0) (the Q8 headroom posture).
    // lineitem⋈orders is the one big join; part and supplier⋈nation
    // broadcast.
    "q9_product_profit" -> ((s, dir) => {
      val pt = t(s, dir, "part").filter(col("p_name").like("%gear%"))
        .withColumn("rp2", round(col("p_retailprice") * lit(100.0))
          .cast("long"))
        .select(col("p_partkey"), col("rp2"))
      val supNat = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      t(s, dir, "lineitem")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(supNat, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("qc2", round(col("l_quantity") * lit(100.0))
          .cast("long"))
        .withColumn("profit4", rev4 - col("rp2") * col("qc2"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(col("profit4").cast("decimal(38,0)")).as("p4"),
          count(lit(1)).as("n_items"))
        .select(col("n_name"), col("o_year"), col("n_items"),
          r4(col("p4").cast("double") / lit(10000.0)).as("amount"))
    }),

    // TPC-H Q11 shape: "important stock" — per-part shipped value from
    // NATION_7's suppliers, keeping parts above 0.1% of the nation
    // total. Value sums decimal-exact; the scalar total broadcasts
    // over the |parts|-bounded rollup (materialized once).
    "q11_important_parts" -> ((s, dir) => {
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = t(s, dir, "lineitem")
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(rev4.cast("decimal(38,0)")).as("v4"))
        .localCheckpoint()
      val tot = perPart.groupBy(lit(true).as("_g"))
        .agg(sum(col("v4")).as("t4")).select(col("t4"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("v4").cast("double") > col("t4").cast("double")
          * lit(0.001))
        .select(col("l_partkey"),
          r4(col("v4").cast("double") / lit(10000.0)).as("part_value"))
    }),

    // TPC-H Q12 shape: late shipments (> 60 days after order date) by
    // returnflag class with the high/low priority split — returnflag
    // stands in for the schema's missing shipmode. One orderkey join;
    // integer counts only.
    "q12_late_shipments" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate")
          > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1))).as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1))).as("low_line_count"))),

    // TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    // size) from lineitem's distinct offer pairs (no partsupp);
    // negative-balance suppliers excluded (the complaints stand-in),
    // one brand and the ECONOMY type cut. One (part, supplier)
    // distinct exchange; dims broadcast; count-distinct two-phase.
    "q16_supplier_cnt" -> ((s, dir) => {
      val pt = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "ECONOMY"
          && col("p_size") <= 25)
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      val okSup = t(s, dir, "supplier").filter(col("s_acctbal") >= 0.0)
        .select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(okSup, col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q19 shape: the three-way disjunctive brand/size/quantity
    // predicate against the broadcast part dim; one exact revenue sum
    // (constant-group keeps empty-in → empty-out).
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10)
          && col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 20)
            && col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 30)
            && col("l_quantity").between(20.0, 30.0))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .groupBy(lit(true).as("_g"))
        .agg(sum(rev4.cast("decimal(38,0)")).as("r4s"),
          count(lit(1)).as("n_items"))
        .select(r4(col("r4s").cast("double") / lit(10000.0)).as("revenue"),
          col("n_items"))
    }),

    // TPC-H Q20 shape: heavy shippers of 'bolt' parts in 1997 —
    // suppliers whose shipped quantity tops 1.5× the mean over
    // shipping suppliers (the availqty stand-in). Per-supplier rollup
    // is |suppliers|-bounded and materializes once; the mean and the
    // name dims broadcast.
    "q20_heavy_shippers" -> ((s, dir) => {
      val perSup = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "part")
          .filter(col("p_name").like("%bolt%")).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("qc2", round(col("l_quantity") * lit(100.0))
          .cast("long"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("qc2")).as("q2s"))
        .localCheckpoint()
      val avg2 = perSup.groupBy(lit(true).as("_g"))
        .agg(sum(col("q2s")).as("s"), count(lit(1)).as("n"))
        .select((col("s").cast("double") / col("n").cast("double"))
          .as("avg2"))
      perSup.crossJoin(broadcast(avg2))
        .filter(col("q2s").cast("double") > col("avg2") * lit(1.5))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"),
          r4(col("q2s").cast("double") / lit(100.0)).as("qty_shipped"))
    }),

    // TPC-H Q21 shape: the LONE returned supplier per multi-supplier
    // finished order (returnflag ≙ the missing receipt/commit lag).
    // ONE orderkey-grouped pass computes the distinct-supplier counts
    // and the unique returned supplier — replacing the reference
    // query's exists/not-exists join pair with aggregates that
    // collapse map-side; name resolution broadcasts.
    "q21_waiting_supplier" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
      li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("n_ret"),
          max(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("ret_supp"))
        .filter(col("n_supp") >= 2L && col("n_ret") === 1L)
        .groupBy(col("ret_supp"))
        .agg(count(lit(1)).as("numwait"))
        .join(t(s, dir, "supplier"),
          col("ret_supp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
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
        |GROUP BY 1""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH supeur AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY 1, 2),
        |el AS (
        |  SELECT cost_c, p_partkey, p_name,
        |    s_suppkey, s_name, s_acctbal, n_name
        |  FROM offers
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'SMALL'
        |  JOIN supeur ON l_suppkey = s_suppkey),
        |m AS (SELECT p_partkey AS m_partkey, min(cost_c) AS min_c
        |  FROM el GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  (round(CAST(cost_c AS DOUBLE) / 100.0, 4) + 0.0) AS min_price
        |FROM el JOIN m ON p_partkey = m_partkey AND cost_c = min_c""".stripMargin,

    "q4_priority_returns" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    "q9_product_profit" ->
      s"""WITH pt AS (
         |  SELECT p_partkey,
         |    CAST(round(p_retailprice * 100.0) AS BIGINT) AS rp2
         |  FROM part WHERE p_name LIKE '%gear%')
         |SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
         |  count(*) AS n_items,
         |  (round(CAST(sum($rev4Sql
         |    - rp2 * CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE)
         |    / 10000.0, 4) + 0.0) AS amount
         |FROM lineitem
         |JOIN pt ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      s"""WITH supn AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7'),
         |pp AS (
         |  SELECT l_partkey, sum($rev4Sql) AS v4
         |  FROM lineitem JOIN supn ON l_suppkey = s_suppkey
         |  GROUP BY 1),
         |tot AS (SELECT sum(v4) AS t4 FROM pp)
         |SELECT l_partkey,
         |  (round(CAST(v4 AS DOUBLE) / 10000.0, 4) + 0.0) AS part_value
         |FROM pp, tot
         |WHERE CAST(v4 AS DOUBLE) > CAST(t4 AS DOUBLE) * 0.001""".stripMargin,

    "q12_late_shipments" ->
      """SELECT l_returnflag,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,

    "q16_supplier_cnt" ->
      """WITH offers AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM offers
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY' AND p_size <= 25
        |  AND EXISTS (SELECT 1 FROM supplier
        |    WHERE s_suppkey = l_suppkey AND s_acctbal >= 0.0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q19_disjunctive_revenue" ->
      s"""SELECT
         |  (round(CAST(sum($rev4Sql) AS DOUBLE) / 10000.0, 4) + 0.0)
         |    AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 1.0 AND 11.0)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
         |    AND l_quantity BETWEEN 10.0 AND 20.0)
         |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
         |    AND l_quantity BETWEEN 20.0 AND 30.0)
         |HAVING count(*) > 0""".stripMargin,

    "q20_heavy_shippers" ->
      """WITH persup AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS q2s
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1),
        |a AS (SELECT CAST(sum(q2s) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS avg2 FROM persup)
        |SELECT s_name, n_name,
        |  (round(CAST(q2s AS DOUBLE) / 100.0, 4) + 0.0) AS qty_shipped
        |FROM persup
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |CROSS JOIN a
        |WHERE CAST(q2s AS DOUBLE) > avg2 * 1.5""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
        |  WHERE EXISTS (SELECT 1 FROM orders
        |    WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')),
        |per AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_returnflag = 'R'
        |      THEN l_suppkey END) AS n_ret,
        |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
        |      AS ret_supp
        |  FROM f GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM per JOIN supplier ON ret_supp = s_suppkey
        |WHERE n_supp >= 2 AND n_ret = 1
        |GROUP BY 1""".stripMargin)
}
