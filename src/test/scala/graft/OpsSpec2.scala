package graft

import org.apache.spark.sql.functions._

/** Round-4 batch-2 operator specs: EMA kernel recursion, KS statistic
  * cross-check, Markov row-stochasticity, quartile/decile balance,
  * BM25 hit gating, PSI non-negativity, triangle-census bounds.
  */
class OpsSpec2 extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("graft_ema3_w matches the hand EMA/EMA²/EMA³ recursion exactly") {
    graft.functions.GraftFunctions.register(spark)
    val xs = (1 to 60).map(i => 100.0 + 9.0 * math.sin(i * 0.7))
    val p = 12; val a = 2.0 / (p + 1); val b = 1.0 - a
    var e1 = xs.head; var e2 = xs.head; var e3 = xs.head
    val want = xs.zipWithIndex.map { case (x, i) =>
      if (i > 0) { e1 = a * x + b * e1; e2 = a * e1 + b * e2; e3 = a * e2 + b * e3 }
      (e1, e2, e3)
    }
    import spark.implicits._
    val got = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("t", "close")
      .selectExpr("'T' AS ticker", "t AS event_id", "t", "close")
      .selectExpr("graft_ema3_w(close, 12) OVER " +
        "(PARTITION BY ticker ORDER BY t, event_id) AS e")
      .selectExpr("e.e1", "e.e2", "e.e3").collect()
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((r, (w1, w2, w3)), i) =>
      assert(r.getDouble(0) == w1 && r.getDouble(1) == w2
        && r.getDouble(2) == w3, s"row $i")
    }
  }

  test("drift_ks equals a driver-side two-sample ECDF sweep") {
    val row = graft.queries.Ts2Queries.queries("drift_ks")(spark, sf)
      .collect()(0)
    val ev = graft.queries.EventBars.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
    val as = ev.filter(_.getString(0) == "click").map(_.getDouble(1))
    val bs = ev.filter(_.getString(0) == "view").map(_.getDouble(1))
    val pts = (as ++ bs).distinct.sorted
    val d = pts.map { v =>
      math.abs(as.count(_ <= v).toDouble / as.length
        - bs.count(_ <= v).toDouble / bs.length)
    }.max
    assert(row.getAs[Long]("n_a") == as.length)
    assert(row.getAs[Long]("n_b") == bs.length)
    assert(math.abs(row.getAs[Double]("ks_d") - d) < 1e-6)
  }

  test("behav_markov rows are a stochastic matrix: each row sums to 1") {
    val bad = graft.queries.BehaviorQueries.queries("behav_markov")(spark, sf)
      .groupBy("event_type").agg(sum("p").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  test("seg_rfm quartiles are balanced within 1 and scores in 1..4") {
    val df = graft.queries.BehaviorQueries.queries("seg_rfm")(spark, sf).cache()
    try {
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val sizes = df.groupBy(c).count().collect().map(_.getLong(1))
        assert(sizes.length == 4, c)
        assert(sizes.max - sizes.min <= 1, s"$c sizes: ${sizes.toList}")
      }
      assert(df.filter(col("rfm") < 111 || col("rfm") > 444).count() == 0)
    } finally df.unpersist()
  }

  test("bin_equidepth deciles are balanced within 1 and cover min..max") {
    val rows = graft.queries.BehaviorQueries.queries("bin_equidepth")(spark, sf)
      .orderBy("bin").collect()
    assert(rows.length == 10)
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("max_price") <= hi.getAs[Double]("min_price"))
    }
  }

  test("text_bm25 only scores docs that hit a term, positively") {
    val df = graft.queries.BehaviorQueries.queries("text_bm25")(spark, sf)
    assert(df.filter(col("n_terms_hit") < 1 || col("bm25") <= 0.0).count() == 0)
  }

  test("drift_psi: contributions are non-negative, total is their sum") {
    val rows = graft.queries.Ts2Queries.queries("drift_psi")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val tot = rows.map(_.getAs[Double]("psi_bin")).sum
    rows.foreach { r =>
      assert(r.getAs[Double]("psi_bin") >= -1e-12)
      assert(math.abs(r.getAs[Double]("psi_total") - tot) < 1e-4)
    }
  }

  test("graph_triangles: 3·triangles never exceeds the wedge count") {
    graft.queries.BehaviorQueries.queries("graph_triangles")(spark, sf)
      .collect().foreach { r =>
        assert(3 * r.getAs[Long]("n_triangles") <= r.getAs[Long]("n_wedges"))
      }
  }

  test("ts_twap stays inside each day's [min close, max close]") {
    val tw = graft.queries.Ts2Queries.queries("ts_twap")(spark, sf)
    val bounds = graft.queries.EventBars.bars(spark, sf)
      .withColumn("day", expr("t div 86400000000"))
      .groupBy("ticker", "day")
      .agg(min("close").as("lo"), max("close").as("hi"))
    val bad = tw.join(bounds, Seq("ticker", "day"))
      .filter(col("twap") < col("lo") - 1e-6 || col("twap") > col("hi") + 1e-6)
      .count()
    assert(bad == 0)
  }
}
