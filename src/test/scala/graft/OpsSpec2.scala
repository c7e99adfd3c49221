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

  test("graft_kalman_w matches the hand Kalman recursion exactly") {
    graft.functions.GraftFunctions.register(spark)
    val xs = (1 to 50).map(i => 50.0 + 20.0 * math.sin(i * 0.3) + (i % 7))
    var x = 0.0; var p = 0.0
    val want = xs.zipWithIndex.map { case (z, i) =>
      if (i == 0) { x = z; p = 1.0 }
      else {
        val pp = p + 0.001; val k = pp / (pp + 0.01)
        x = x + k * (z - x); p = (1.0 - k) * pp
      }
      x
    }
    import spark.implicits._
    val got = xs.zipWithIndex.map { case (z, i) => (i.toLong, z) }
      .toDF("t", "close")
      .selectExpr("'T' AS ticker", "t AS event_id", "t", "close")
      .selectExpr("graft_kalman_w(close) OVER " +
        "(PARTITION BY ticker ORDER BY t, event_id) AS x")
      .collect().map(_.getDouble(0))
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: $g != $w")
    }
  }

  test("graft_sar_w matches the hand SAR recursion, including reversals") {
    graft.functions.GraftFunctions.register(spark)
    // an up-leg then a sharp down-leg then recovery — forces at least
    // one long→short and one short→long reversal
    val closes = Seq(100.0, 101.0, 102.5, 104.0, 103.5, 99.0, 95.0,
      94.0, 96.5, 99.5, 103.0, 104.5, 104.0, 105.5)
    val hs = closes.map(_ + 1.0); val ls = closes.map(_ - 1.0)
    // hand recursion (single-bar clamp variant, matching SarWindow)
    var lng = false; var sar = 0.0; var ep = 0.0; var af = 0.0
    val want = closes.indices.map { i =>
      if (i == 0) None
      else if (i == 1) {
        lng = closes(1) >= closes(0)
        sar = if (lng) ls(0) else hs(0)
        ep = if (lng) hs(1) else ls(1)
        af = 0.02
        Some((sar, if (lng) 1L else -1L))
      } else {
        val raw = sar + af * (ep - sar)
        if (lng) {
          val sn = math.min(raw, ls(i - 1))
          if (ls(i) < sn) { lng = false; sar = ep; ep = ls(i); af = 0.02 }
          else {
            sar = sn
            if (hs(i) > ep) { af = math.min(af + 0.02, 0.2); ep = hs(i) }
          }
        } else {
          val sn = math.max(raw, hs(i - 1))
          if (hs(i) > sn) { lng = true; sar = ep; ep = hs(i); af = 0.02 }
          else {
            sar = sn
            if (ls(i) < ep) { af = math.min(af + 0.02, 0.2); ep = ls(i) }
          }
        }
        Some((sar, if (lng) 1L else -1L))
      }
    }
    // the fixture must actually exercise both reversal directions
    assert(want.flatten.map(_._2).distinct.size == 2)
    import spark.implicits._
    val got = closes.indices.map(i => (i.toLong, hs(i), ls(i), closes(i)))
      .toDF("t", "high", "low", "close")
      .selectExpr("'T' AS ticker", "t AS event_id", "t", "high", "low", "close")
      .selectExpr("graft_sar_w(high, low, close) OVER " +
        "(PARTITION BY ticker ORDER BY t, event_id) AS x")
      .selectExpr("x.sar", "x.dir").collect()
    got.zip(want).zipWithIndex.foreach {
      case ((r, None), i) => assert(r.isNullAt(0) && r.isNullAt(1), s"row $i")
      case ((r, Some((ws, wd))), i) =>
        assert(r.getDouble(0) == ws && r.getLong(1) == wd, s"row $i")
    }
  }

  test("ind_kama matches the hand Kaufman recursion") {
    val rows = graft.queries.Ts2Queries.queries("ind_kama")(spark, sf)
      .filter(col("ticker") === "7").orderBy("t", "event_id")
      .select("kama").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val closes = graft.queries.EventBars.bars(spark, sf)
      .filter(col("ticker") === "7").orderBy("t", "event_id")
      .select("close").collect().map(_.getDouble(0)).toSeq
    assert(closes.length >= 12)
    val fast = 2.0 / 3.0; val slow = 2.0 / 31.0
    var kama = 0.0
    val want = closes.indices.map { i =>
      if (i < 10) None
      else {
        val vol = (i - 9 to i).map(j =>
          math.abs(closes(j) - closes(j - 1))).sum
        val er = if (vol == 0.0) 0.0
          else math.abs(closes(i) - closes(i - 10)) / vol
        val sc0 = er * (fast - slow) + slow
        val sc = sc0 * sc0
        kama = if (i == 10) closes(i) else kama + sc * (closes(i) - kama)
        Some(kama)
      }
    }
    rows.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      (g, w) match {
        case (None, None) =>
        case (Some(gv), Some(wv)) =>
          // engine output is r6-rounded; hand value is not
          assert(math.abs(gv - wv) < 2e-6, s"row $i: $gv vs $wv")
        case other => fail(s"row $i: $other")
      }
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

  test("ts_volume_bars partitions the volume exactly; bars cap at 10k+max") {
    val bars = graft.queries.Ts2Queries.queries("ts_volume_bars")(spark, sf)
      .collect()
    val total = graft.queries.EventBars.bars(spark, sf)
      .agg(sum("volume")).collect()(0).getDouble(0).toLong
    assert(bars.map(_.getAs[Long]("bar_volume")).sum == total)
    // a bar overshoots 10k by at most one event's volume (< 197)
    bars.foreach { r =>
      assert(r.getAs[Long]("bar_volume") < 10000 + 197)
      assert(r.getAs[Long]("t_open") <= r.getAs[Long]("t_close"))
    }
  }

  test("text_entropy is bounded by log2(distinct chars)") {
    graft.queries.ExtQueries.queries("text_entropy")(spark, sf)
      .collect().foreach { r =>
        val h = r.getAs[Double]("entropy")
        val d = r.getAs[Long]("n_distinct").toDouble
        assert(h >= -1e-9 && h <= math.log(d) / math.log(2.0) + 1e-6)
      }
  }

  test("agg_mode picks a true argmax of the per-user type counts") {
    val got = graft.queries.BehaviorQueries.queries("agg_mode")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("mode_type"), r.getAs[Long]("n_mode"))).toMap
    val counts = graft.queries.EventBars.events(spark, sf)
      .groupBy(col("user_id").cast("long").as("u"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[Long]("u"))
    counts.foreach { case (u, rows) =>
      val best = rows.map(_.getAs[Long]("n")).max
      assert(got(u)._2 == best, s"user $u")
    }
  }

  test("emb_pca1 projection variance dominates every coordinate axis") {
    // PC1 maximizes variance over unit directions, so (up to the
    // micro-quantization of the iterate) its projection variance must
    // beat the best single coordinate's variance.
    val pc = graft.queries.ExtQueries.queries("emb_pca1")(spark, sf)
      .collect().map(_.getAs[Double]("pc1"))
    assert(pc.nonEmpty)
    val pcVar = {
      val m = pc.sum / pc.length
      pc.map(x => (x - m) * (x - m)).sum / pc.length
    }
    val axisVar = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("posexplode(CAST(embedding AS ARRAY<DOUBLE>)) AS (dim, x)")
      .groupBy("dim")
      .agg((avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))).as("v"))
      .agg(max(col("v"))).collect()(0).getDouble(0)
    assert(pcVar >= axisVar * 0.999,
      s"pc1 var $pcVar < best axis var $axisVar")
  }

  test("SQL Hilbert key: bijection on the 256×256 grid, unit-step curve") {
    // The two properties that make layout_hilbert a layout key: every
    // cell gets a distinct d in [0, 65536) (sorted order partitions
    // evenly), and consecutive d's are GRID NEIGHBORS (|Δx|+|Δy| = 1)
    // — the locality Z-order lacks at its jump discontinuities.
    import spark.implicits._
    var df = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x0", "y0")
      .withColumn("d0", lit(0L))
    for (k <- 0 until 8) {
      val (xe, ye, de) = graft.queries.ScaleQueries.hilbertLevel(
        7 - k, s"x$k", s"y$k", s"d$k")
      df = df.withColumn(s"x${k + 1}", expr(xe))
        .withColumn(s"y${k + 1}", expr(ye))
        .withColumn(s"d${k + 1}", expr(de))
    }
    val cells = df.select(col("d8"), col("x0"), col("y0")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(cells.length == 65536)
    val byD = cells.toMap
    assert(byD.size == 65536 && byD.keys.min == 0L && byD.keys.max == 65535L)
    (0L until 65535L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("ts_binseg finds a planted mean shift; entropy zero on monotone") {
    // Mechanism pin beyond oracle parity (engines agreeing doesn't
    // prove the answer is right): ticker 7 is 30 points at 10.0 then
    // 30 at 20.0 — the root split must land exactly at k=30 with the
    // two segment means recovered; ticker 8 is strictly increasing —
    // one ordinal pattern, permutation entropy exactly 0.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("binseg").toString
    val base = java.sql.Timestamp.valueOf("2024-03-05 10:00:00")
    def t(i: Int) = new java.sql.Timestamp(base.getTime + i * 60000L)
    val shift = (0 until 60).map(i =>
      (i.toLong, t(i), 7L, if (i < 30) 10.0 else 20.0))
    val mono = (0 until 60).map(i =>
      (100L + i, t(i), 8L, 10.0 + i))
    (shift ++ mono).toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val seg = graft.queries.Ts2Queries.queries("ts_binseg")(spark, dir)
      .filter(col("ticker") === "7" && col("seg") === "root")
      .collect()
    assert(seg.length == 1)
    val r = seg(0)
    assert(r.getAs[Long]("k") == 30L, r)
    assert(r.getAs[Double]("mean_l") == 10.0 && r.getAs[Double]("mean_r") == 20.0, r)
    val pe = graft.queries.Ts2Queries.queries("ts_perm_entropy")(spark, dir)
      .filter(col("ticker") === "8").collect()(0)
    assert(pe.getAs[Long]("n_patterns") == 1L &&
      pe.getAs[Double]("perm_entropy") == 0.0, pe)
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

  test("ab_power/ab_hte: extreme values winsorize, squared sums never wrap") {
    // r13 verdict hardening: a |value| of 1e12 quantizes to c = 1e14
    // cents raw; 24 such rows push sum(c*c) to 2.4e29 — far past
    // Long.MaxValue, where a LongType accumulator wraps silently
    // (DuckDB promotes to HUGEINT, so the gate would diverge only at
    // extreme data). The winsorize (|c| capped at 1e9) plus the
    // decimal(38,0) accumulator keep both engines exact: with 12
    // rows/arm of c = ±1e9, ssa = 1.2e19 > Long.MaxValue — a wrapped
    // sum turns the variance negative and se_diff NaN.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("abx").toString
    val rows = (0 until 24).map { i =>
      val v = if ((i / 4) % 2 == 0) 1e12 else -1e12 // winsorize binds: c -> ±1e9; signs balance per user
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"),
        (i % 4).toLong, "buy", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val pw = graft.queries.Behavior2Queries.queries("ab_power")(spark, dir)
      .collect()
    assert(pw.length == 1)
    assert(pw(0).getAs[Double]("mean_a") == 0.0) // +1e9/-1e9 cancel
    val se = pw(0).getAs[Double]("se_diff")
    // exact closed form through the same arithmetic: ssa = 12 * (1e9)^2
    // accumulated exactly; va = (ssa/1e4 - 0)/(n-1); se2 = va/6
    val va = 12.0 * 1e18 / 1e4 / 11.0
    val want = math.round(math.sqrt(va / 6.0) * 1e6) / 1e6
    assert(!se.isNaN && math.abs(se - want) < 1e-6,
      s"squared sum wrapped or diverged: se_diff=$se want=$want")

    val ht = graft.queries.Behavior2Queries.queries("ab_hte")(spark, dir)
      .collect()
    assert(ht.length == 1) // all events in daypart 0
    assert(ht(0).getAs[Double]("diff") == 0.0)
    assert(ht(0).getAs[Double]("t_welch") == 0.0, // NaN/null if wrapped
      s"t_welch=${ht(0).getAs[Double]("t_welch")}")
  }

  test("sim_ivf_served: at-rest index round-trips to in-memory answers") {
    // The serving read must be lossless: the cell-partitioned parquet
    // index (ids only, payloads re-attached by id) answers EXACTLY
    // what the in-memory sim_ivf_kmeans chain answers, and the
    // on-disk layout is the Hive cell=N/ directory tree a one-cell
    // probe can prune to a single directory listing.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Long]("rank"), r.getAs[Double]("sim"))
    val served = graft.queries.SimSearchQueries.queries("sim_ivf_served")(
      spark, sf).collect().map(key).toSet
    val mem = graft.queries.SimQueries.queries("sim_ivf_kmeans")(
      spark, sf).collect().map(key).toSet
    assert(served == mem, s"served=${served.size} mem=${mem.size}")
    val idx = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_ivf_index_" + sf.replaceAll("[^A-Za-z0-9._-]", "_"))
    val cells = new java.io.File(idx, "assign").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cells.length > 1, s"expected Hive cell=N dirs, got ${cells.length}")
    assert(new java.io.File(idx, "centroids").exists())
  }

  test("filtered search: post-filter starves at planted 5% selectivity") {
    // Mechanism pin for the pre-vs-post receipt: 1800 near-parallel
    // cluster-A vectors (all land in centroid-0's cell — ids 1..199
    // are anti-parallel decoy centroids, so every cluster-A vector's
    // argmax-cosine cell is 0), 5% carrying the rare label. A rare
    // query's 'pre' search ranks ONLY its ~90 same-label cell mates —
    // always 3 answers; 'post' keeps the unfiltered top-8 first, which
    // is ~95% majority-label, and starves after the predicate.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fsel").toString
    val rows = (0 until 2000).map { i =>
      val emb: Array[Float] =
        if (i >= 1 && i < 200)
          Array(-1.0f, (0.3 * math.sin(i * 2.3)).toFloat, 0.2f, -0.1f,
            (0.3 * math.cos(i * 1.1)).toFloat, 0f, 0f, 0f)
        else
          Array(1.0f) ++ (1 to 7).map(k =>
            (0.05 * math.sin(i * 1.7 * k + k)).toFloat).toArray
      (i.toLong, emb, if (i % 20 == 0) 1 else 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.SimSearchQueries.queries("sim_filtered_search")(
      spark, dir).collect()
    val rareQs = (200 to 1900 by 100).map(_.toLong).toSet // rare ∩ cluster A
    val pre = out.count(r => r.getAs[String]("mode") == "pre" &&
      rareQs(r.getAs[Long]("q_id")))
    val post = out.count(r => r.getAs[String]("mode") == "post" &&
      rareQs(r.getAs[Long]("q_id")))
    assert(pre == 3 * rareQs.size, s"pre=$pre (expected full top-3s)")
    assert(post * 2 < pre, s"post=$post did not starve vs pre=$pre")
  }

  test("served IVF index: a one-cell probe partition-prunes the at-rest read") {
    // The point of the cell=N/ Hive layout: a probe of one cell must
    // push a PartitionFilter into the scan (listing one directory at
    // 100 TB), not read the index and filter rows.
    graft.queries.SimSearchQueries.queries("sim_ivf_served")(spark, sf)
      .count() // (re)writes the at-rest index for this sf
    val idx = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_ivf_index_" + sf.replaceAll("[^A-Za-z0-9._-]", "_")).getPath
    val at = spark.read.schema("vec_id BIGINT, cell BIGINT")
      .parquet(s"$idx/assign")
    val firstCell = at.agg(min("cell")).collect()(0).getLong(0)
    val sel = at.filter(col("cell") === firstCell)
    val p = sel.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(cell"), p)
    // attribute prints with an expression id: (cell#123L = 0)
    assert(s"\\(cell#\\d+L? = $firstCell\\)".r.findFirstIn(p).isDefined, p)
    assert(sel.count() > 0 && sel.count() < at.count())
  }
}
