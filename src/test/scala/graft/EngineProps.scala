package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.etl.{Densify, Interpolate, Sessionize}
import graft.ind.{FrameIndicators, RecursiveIndicators}

/** Property-based invariants (SURVEY.md §5.2): island structure, the
  * exact-60s-grid post-condition the reference meant to enforce, scaled
  * indicator bounds, and monotone-series identities — over generated
  * gap patterns and prices.
  */
object EngineProps extends Properties("engine") {

  // Spark-backed properties are expensive; cap cases.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  private val Step = 60L
  private val Allowed = Seq(60L, 120L, 180L)

  private val schema = StructType(Seq(
    StructField("ticker", StringType),
    StructField("ws", LongType),
    StructField("close", DoubleType)))

  /** Per-ticker series: random inter-bar gaps from a mixed pool (legal
    * and island-breaking), random-ish prices. */
  private val seriesGen: Gen[Seq[(String, Long, Double)]] = for {
    n <- Gen.choose(5, 60)
    gaps <- Gen.listOfN(n, Gen.oneOf(60L, 60L, 60L, 120L, 180L, 240L, 600L))
    p0 <- Gen.choose(50.0, 150.0)
  } yield {
    var t = 0L
    gaps.zipWithIndex.map { case (g, i) =>
      t += g
      ("T", t, p0 + math.sin(i * 0.9) * 5 + (i % 5))
    }
  }

  private def df(rows: Seq[(String, Long, Double)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)

  property("sessionize: islands have >=2 rows and only allowed internal gaps") =
    Prop.forAll(seriesGen) { rows =>
      val out = Sessionize(df(rows), "ticker", "ws", Allowed)
        .select("island", "ws").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
      val byIsland = out.groupBy(_._1).values
      byIsland.forall(_.length >= 2) &&
        byIsland.forall { g =>
          g.map(_._2).sorted.sliding(2).filter(_.length == 2)
            .forall(p => Allowed.contains(p(1) - p(0)))
        }
    }

  property("densify: every within-island diff is exactly one step") =
    Prop.forAll(seriesGen) { rows =>
      val sz = Sessionize(df(rows), "ticker", "ws", Allowed)
      val dz = Densify(sz, Seq("ticker", "island", "sub_ticker"), "ws", Step)
        .select("island", "ws").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      dz.groupBy(_._1).values.forall { g =>
        g.map(_._2).sorted.sliding(2).filter(_.length == 2)
          .forall(p => p(1) - p(0) == Step)
      }
    }

  property("interpolate leaves no nulls in fill columns") =
    Prop.forAll(seriesGen) { rows =>
      val sz = Sessionize(df(rows), "ticker", "ws", Allowed)
      val dz = Densify(sz, Seq("ticker", "island", "sub_ticker"), "ws", Step)
      val ip = Interpolate(dz, Seq("ticker", "island"), "ws", Seq("close"))
      ip.filter(ip("close").isNull).count() == 0
    }

  property("frame indicator bounds: mfi,sok,ultosc in [0,1]; osc hists in [-1,1]") =
    Prop.forAll(seriesGen) { rows =>
      val d0 = df(rows)
      val base = d0
        .withColumn("high", d0("close") + 1.0)
        .withColumn("low", d0("close") - 1.0)
        .withColumn("volume", org.apache.spark.sql.functions.lit(100.0))
      val fi = FrameIndicators.addAll(base, Seq("ticker"), Seq("ws"))
        .select("mfi", "ultosc", "sok", "sok_hist", "aroonosc").collect()
      fi.forall { r =>
        def ok01(i: Int) = r.isNullAt(i) || (r.getDouble(i) >= 0 && r.getDouble(i) <= 1)
        def ok11(i: Int) = r.isNullAt(i) || (r.getDouble(i) >= -1 && r.getDouble(i) <= 1)
        ok01(0) && ok01(1) && ok01(2) && ok11(3) && ok11(4)
      }
    }

  property("monotone rise pins rsi=1, aroonosc=+1 (pure scan)") =
    Prop.forAll(Gen.choose(40, 200)) { n =>
      val price = Array.tabulate(n)(i => 100.0 + i)
      val out = RecursiveIndicators.scan(price, price.map(_ + 1), price.map(_ - 1), price)
      (30 until n).forall(i => out(i)(0).asInstanceOf[Double] == 1.0)
    }

  /** The block-pair decomposition behind emb_neardup/sim_topk: x rows
    * replicated to (b(x), j) and y rows to (i, b(y)) meet on an
    * equi-key in exactly ONE group per ordered pair — so a join on the
    * block-pair key + (idx < idy) enumerates each unordered pair once.
    */
  property("block-pair join enumerates every unordered pair exactly once") =
    Prop.forAll(Gen.choose(2, 40), Gen.choose(1, 8)) { (n, b) =>
      import org.apache.spark.sql.functions._
      val ids = spark.range(n.toLong).select(col("id"))
      val x = ids.withColumn("bi", expr(s"CAST(id % $b AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${b - 1})")))
      val y = ids.withColumn("bj", expr(s"CAST(id % $b AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${b - 1})")))
      val pairs = x.as("x").join(y.as("y"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      pairs.length == n * (n - 1) / 2 && pairs.distinct.length == pairs.length
    }

  /** sketch_quantile's mergeability claim, pinned: the bottom-K-by-
    * hash sample is PARTITIONING-invariant. Any partition layout is a
    * different partial-sketch merge tree, so equal samples across
    * layouts ⟺ merge(S1, S2) = bottomK(S1 ∪ S2) is order-independent
    * — the property a KLL coin-flip compactor does NOT have, and the
    * reason the engine's mergeable quantile sketch is hash-selected.
    */
  property("bottom-K sketch sample is partitioning-invariant") =
    Prop.forAll(Gen.choose(1, 60), Gen.choose(1, 8),
        Gen.choose(2, 9)) { (n, k, p) =>
      import org.apache.spark.sql.functions._
      val base = spark.range(n.toLong)
        .select(col("id"), expr("CAST(id % 3 AS STRING)").as("g"),
          expr("(id * 2654435761L) % 1000000007L").as("h"),
          expr("CAST(id % 13 AS DOUBLE)").as("v"))
      def sample(parts: Int): Set[(String, Long, Int)] =
        graft.queries.KMin.smallestBy(base.repartition(parts),
          Seq("g"), Seq("h", "id"), k, "rk")
          .select("g", "id", "rk").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      sample(1) == sample(p)
    }

  /** Bloom bitmap (join_bloom's packed-word form) admits every build
    * key — no false negatives, ever — on random key sets, so the
    * pre-filter can never change the exact join's result.
    */
  property("bloom bitmap has no false negatives") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))) { keys =>
      import org.apache.spark.sql.functions._
      // the PRODUCTION builders from join_bloom, not a local replica
      import graft.queries.ScaleQueries.{bloomBits, bloomProbe}
      val ks = spark.createDataset(keys)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("k")
      val admitted = ks.crossJoin(broadcast(bloomBits(ks, "k")))
        .filter(expr(bloomProbe("k")))
        .count()
      admitted == keys.length.toLong
    }

  /** Count-min estimates can only OVERcount: for every key, the min
    * over its d cells is >= the key's exact frequency.
    */
  property("count-min sketch never undercounts") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 50L))) { keys =>
      val P = graft.ext.TextOps.P
      val (d, w) = (3, 64) // small width → plenty of collisions
      def cells(h: Long): Seq[(Int, Long)] =
        (0 until d).map(j => j -> ((h * (2 * j + 1) + j * 7919L + 1) % P) % w)
      val sketch = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
      keys.foreach(h => cells(h).foreach(c =>
        sketch(c) = sketch.getOrElse(c, 0L) + 1))
      val exact = keys.groupBy(identity).view.mapValues(_.length.toLong)
      exact.forall { case (h, n) =>
        cells(h).map(sketch).min >= n
      }
    }

  /** Native per-row simhash ≡ the explode → ±1-vote-sum → groupBy
    * aggregation formulation it replaced.
    */
  property("graft_simhash equals the aggregation formulation") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L))) { hs =>
      graft.functions.GraftFunctions.register(spark)
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val d = Seq((1L, hs)).toDF("doc_id", "wh")
      val native = d.select(expr("graft_simhash(wh, 16)")).collect()(0).getLong(0)
      val ex = d.select(col("doc_id"), explode(col("wh")).as("h"))
      val sums = (0 until 16).map(bt =>
        sum(expr(s"CASE WHEN (shiftright(h, $bt) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$bt"))
      val bits = (0 until 16).map(bt =>
        expr(s"CASE WHEN s$bt >= 0 THEN CAST(${1L << bt} AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
      val agg = ex.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(bits.reduce(_ + _)).collect()(0).getLong(0)
      native == agg
    }

  /** Distributed connected components ≡ sequential union-find on random
    * graphs — random edge sets exercise cluster shapes (cliques, chains,
    * crossing merges) the fixed fixtures can't enumerate.
    */
  property("connected components match sequential union-find") =
    Prop.forAll(for {
      n <- Gen.choose(1, 40)
      m <- Gen.choose(0, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n.toLong, es.filter(e => e._1 != e._2))) { case (n, es) =>
      import spark.implicits._
      // driverMaxEdges = 0: keep the property on the distributed loop
      // (the driver-side cutover IS this reference union-find)
      val got = graft.ext.ConnectedComponents(
        spark.range(n).toDF("id"), es.toDF("src", "dst"), 25, 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: path-compressed union-find, min id as root label
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = (0 until n.toInt).map(i => i.toLong -> find(i).toLong).toMap
      got == want
    }

  /** DistRank ≡ the unpartitioned window forms on random data — small
    * key domains flood the range buckets with ties, negatives exercise
    * the bound arithmetic, and random k covers the ntile remainder
    * space beyond DistRankSpec's fixed fixture.
    */
  property("distRank ≡ single-partition row_number/ntile/running sum") =
    Prop.forAll(for {
      n <- Gen.choose(0, 90)
      ks <- Gen.listOfN(n, Gen.choose(-5L, 5L))
      vs <- Gen.listOfN(n, Gen.choose(-100L, 100L))
      k <- Gen.choose(1, 9)
    } yield (ks.zip(vs).zipWithIndex.map { case ((key, v), i) =>
      (key, i.toLong, v) }, k)) { case (rows, k) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
        StructType(Seq(StructField("k", LongType),
          StructField("id", LongType), StructField("v", LongType))))
      val r = graft.queries.DistRank.rowNumber(df, "rk", col("k"),
        Seq(col("k"), col("id")), runSumCols = Seq("v"))
      val got = r.df
        .withColumn("b", graft.queries.DistRank.ntileOf(col("rk"), r.n, k))
        .select("id", "rk", "run_v", "b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
        .sortBy(_._1).toSeq
      val w = Window.orderBy(col("k"), col("id"))
      val want = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("run_v", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("b", ntile(k).over(w))
        .select("id", "rk", "run_v", "b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
        .sortBy(_._1).toSeq
      r.n == rows.length && got == want
    }

  /** Random-shape equivalence for the round-7 grouped exact quantile:
    * the range-bucketed grouped() must match the whole-group-window
    * groupedLocal() bit-for-bit on arbitrary group counts/sizes, heavy
    * value duplication (few distinct values flood the bucket bounds),
    * and NULL values (nulls-first rank arithmetic). */
  property("grouped exact quantiles match the whole-group window form") =
    Prop.forAll(
      Gen.choose(1, 120),
      Gen.choose(1, 6),
      Gen.choose(2, 9)) { (n, gCard, vCard) =>
      import org.apache.spark.sql.functions.col
      val rows = (0 until n).map { i =>
        val v: java.lang.Double =
          if (i % 11 == 10) null
          else java.lang.Double.valueOf(((i * 7) % vCard).toDouble)
        Row(s"g${i % gCard}", v)
      }
      val d = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("g", StringType),
          StructField("v", DoubleType)))).repartition(3)
      val ps = Seq(0.1 -> "a", 0.5 -> "b", 0.9 -> "c")
      def toMap(df0: org.apache.spark.sql.DataFrame) =
        df0.collect().map(r => r.getString(0) ->
          (1 to 3).map(i => Option(r.get(i)))).toMap
      toMap(graft.queries.ExactQuantile.grouped(d, "g", "v", ps,
        checkpoint = false)) ==
        toMap(graft.queries.ExactQuantile.groupedLocal(d, "g", "v", ps))
    }
  property("graft_ha_w equals the sequential Heikin-Ashi fold, bit-for-bit") =
    Prop.forAll(Gen.choose(1, 80), Gen.choose(10.0, 200.0)) { (n, base) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rows = (0 until n).map { i =>
        val o = base + math.sin(i * 1.3) * 7
        val c = base + math.cos(i * 0.7) * 5
        val h = math.max(o, c) + (i % 3)
        val l = math.min(o, c) - (i % 5)
        Row("T", i.toLong, o, h, l, c)
      }
      val d = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("ticker", StringType),
          StructField("t", LongType), StructField("o", DoubleType),
          StructField("h", DoubleType), StructField("l", DoubleType),
          StructField("c", DoubleType)))).repartition(3)
      graft.functions.GraftFunctions.register(spark)
      val w = Window.partitionBy("ticker").orderBy("t")
      val got = d.withColumn("ha", expr("graft_ha_w(o, h, l, c)").over(w))
        .select(col("t"), col("ha.hao"), col("ha.hac"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      // sequential reference fold with the identical op order
      var hao = 0.0; var hac = 0.0
      val want = rows.zipWithIndex.map { case (r, i) =>
        val (o, h, l, c) = (r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))
        val haoN = if (i == 0) (o + c) / 2.0 else (hao + hac) / 2.0
        val hacN = (((o + h) + l) + c) / 4.0
        hao = haoN; hac = hacN
        i.toLong -> ((haoN, hacN))
      }.toMap
      got == want
    }

  property("jaccardJoinExact equals the brute-force threshold join") =
    Prop.forAll(Gen.choose(0, 40), Gen.choose(2, 30),
      Gen.choose(0L, 1000L)) { (nDocs, alpha, seed) =>
      import org.apache.spark.sql.functions._
      // random shingle sets plus GENUINE near-copies (identical, one
      // element added, or one removed) of earlier docs — the
      // engineered high-overlap regime prefix filtering must not lose
      val rnd = new scala.util.Random(seed)
      val sets = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      (0 until nDocs).foreach { i =>
        val shd: Seq[Long] =
          if (i > 0 && rnd.nextBoolean()) {
            val src = sets(rnd.nextInt(i))
            rnd.nextInt(3) match {
              case 0 => src
              case 1 => (src :+ (rnd.nextInt(alpha) + 1).toLong)
                .distinct.sorted
              case _ =>
                if (src.size > 1) src.patch(rnd.nextInt(src.size), Nil, 1)
                else src
            }
          } else {
            val sz = 1 + rnd.nextInt(20)
            (0 until sz).map(_ => (rnd.nextInt(alpha) + 1).toLong)
              .distinct.sorted
          }
        sets += shd
      }
      val rows = sets.toSeq.zipWithIndex.map { case (s0, i) =>
        Row(i.toLong, s0)
      }
      val d = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("shd", ArrayType(LongType))))).repartition(3)
      val got = graft.queries.ExtCommon.jaccardJoinExact(d, 4, 5)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val byId = rows.map(r => r.getLong(0) ->
        r.getSeq[Long](1).toSet).toMap
      val want = (for {
        a <- byId.keys; b <- byId.keys; if a < b
        inter = (byId(a) & byId(b)).size
        union = (byId(a) | byId(b)).size
        if union > 0 && inter.toDouble / union >= 0.8
      } yield (a, b)).toSet
      got == want
    }

  property("assignCells ≡ window-argmax cell assignment (ties, zero norms)") =
    Prop.forAll(
      Gen.choose(4, 24).flatMap { n =>
        Gen.listOfN(n * 3, Gen.oneOf(-1.0, 0.0, 0.0, 1.0, 2.0))
      }) { xs =>
      import org.apache.spark.sql.functions._
      // Integer-ish coordinates force cosine TIES (scaled copies of
      // the same direction) and zero vectors (NULL cosine on the
      // try_divide path) — exactly where the aggregate form could
      // silently diverge from the window ordering.
      val vecs = xs.grouped(3).toSeq.zipWithIndex
        .map { case (v, i) => Row(i.toLong, v) }
      val schema = StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType))))
      graft.functions.GraftFunctions.register(spark)
      val e = spark.createDataFrame(
          java.util.Arrays.asList(vecs: _*), schema)
        .repartition(3)
        .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      val cents = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("c_id"), col("v").as("cv"),
          col("nrm").as("cnrm"))
      val got = graft.queries.ExtCommon.assignCells(e, cents)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = e.crossJoin(org.apache.spark.sql.functions.broadcast(cents))
        .withColumn("csim", expr("try_divide(graft_dot(v, cv), nrm * cnrm)"))
        .withColumn("crank", expr("row_number() OVER (" +
          "PARTITION BY vec_id ORDER BY csim DESC, c_id)"))
        .filter(col("crank") === 1)
        .select("vec_id", "c_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }

  property("graft_st_w equals the sequential Supertrend fold, bit-for-bit") =
    Prop.forAll(Gen.choose(1, 80), Gen.choose(10.0, 200.0)) { (n, base) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rows = (0 until n).map { i =>
        val c = base + math.sin(i * 0.9) * 11
        val h = c + 1.0 + (i % 4)
        val l = c - 1.0 - (i % 3)
        Row("T", i.toLong, h, l, c)
      }
      val d = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("ticker", StringType),
          StructField("t", LongType), StructField("h", DoubleType),
          StructField("l", DoubleType), StructField("c", DoubleType))))
        .repartition(3)
      graft.functions.GraftFunctions.register(spark)
      val w = Window.partitionBy("ticker").orderBy("t")
      val got = d.withColumn("x", expr("graft_st_w(h, l, c)").over(w))
        .select(col("t"), col("x.atr"), col("x.ub"), col("x.lb"),
          col("x.dir"), col("x.st"))
        .collect().map(r => r.getLong(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
            r.getLong(4), r.getDouble(5))))
        .toMap
      // sequential reference fold with the identical op order
      var cp = 0.0; var atr = 0.0; var ub = 0.0; var lb = 0.0
      var dir = -1L
      val want = rows.zipWithIndex.map { case (r, i) =>
        val (h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
        val tr = if (i == 0) h - l
          else math.max(h - l, math.max(math.abs(h - cp), math.abs(l - cp)))
        val atrN = if (i == 0) tr else (atr * 9.0 + tr) / 10.0
        val mid = (h + l) / 2.0
        val ubB = mid + 3.0 * atrN
        val lbB = mid - 3.0 * atrN
        val ubN = if (i == 0) ubB else if (ubB < ub || cp > ub) ubB else ub
        val lbN = if (i == 0) lbB else if (lbB > lb || cp < lb) lbB else lb
        val dirN =
          if (i == 0) { if (c > ubB) 1L else -1L }
          else if (dir == -1L) { if (c > ubN) 1L else -1L }
          else { if (c < lbN) -1L else 1L }
        cp = c; atr = atrN; ub = ubN; lb = lbN; dir = dirN
        i.toLong -> ((atrN, ubN, lbN, dirN,
          if (dirN == 1L) lbN else ubN))
      }.toMap
      got == want
    }

}
