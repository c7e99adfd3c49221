package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.ConnectedComponents

/** Round-3 operators: connected-components dedup clustering, the
  * bucketed range join, funnel ordering, grouping sets. */
class ClusterRangeSpec extends SparkSpec {

  private def ccOf(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    // driverMaxEdges = 0 forces the distributed propagation loop —
    // small fixtures would otherwise exercise only the driver-side
    // union-find cutover
    ConnectedComponents(n, e, 25, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("adaptive driver-side solve ≡ distributed loop") {
    import spark.implicits._
    val nodes = (1L to 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("src", "dst")
    val driver = ConnectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents(nodes, edges, 25, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist)
  }

  test("connected components: transitivity along a path, isolated node") {
    // Path 1-2-3-4-5 has diameter 4 — labels must still all reach 1
    // (pins that propagation iterates to the fixpoint, not one round).
    val cc = ccOf(Seq(1L, 2L, 3L, 4L, 5L, 6L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 6L))
  }

  test("connected components: separate components keep separate labels") {
    val cc = ccOf(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (3L, 4L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("connected components: no edges → identity; no nodes → empty") {
    assert(ccOf(Seq(7L, 8L), Seq.empty) == Map(7L -> 7L, 8L -> 8L))
    assert(ccOf(Seq.empty, Seq.empty).isEmpty)
  }

  test("dedup_cluster: consistent with the pair graph and dedup_keep") {
    val sf = "/root/testdata/sf0.01"
    val cluster = SparkEntry.queries("dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .filter(col("jaccard") >= 0.8).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    // every near-dup pair lands in one cluster
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // the label IS the min member of its cluster
    cluster.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl: min is ${members.keys.min}")
    }
    // greedy keep-lowest-id (dedup_keep) only ever drops non-representatives
    val kept = SparkEntry.queries("dedup_keep")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    cluster.foreach { case (doc, lbl) =>
      if (!kept.contains(doc))
        assert(lbl < doc, s"dropped doc $doc should have a smaller-id rep")
    }
  }

  test("join_range_points: half-open [lo, hi) bounds across bucket lines") {
    val dir = java.nio.file.Files.createTempDirectory("rj").toString
    val mnt = 60000000L
    val base = 100L * mnt // spike-minute start
    // minute 100 floods (8 events) vs 1/minute elsewhere → the only
    // spike; window = [base-90s, base+150s), crossing 5 minute buckets
    val inside = (0 until 8).map(i => base + i * 1000000L)
    val background = (90 until 100).map(m => m * mnt + 30000000L)
    val boundary = Seq(
      base - 90000000L,      // == lo → IN
      base - 90000001L,      // lo-1 → OUT
      base + 150000000L - 1, // hi-1 → IN
      base + 150000000L)     // == hi → OUT
    val ts = inside ++ background ++ boundary
    spark.createDataFrame(
      java.util.Arrays.asList(ts.zipWithIndex.map { case (t, i) =>
        Row(i.toLong, new java.sql.Timestamp(t / 1000L), 1L, "view", 1.0, "")
      }: _*),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .write.parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("join_range_points")(spark, dir)
    // The scalar mean-count attach is a 1-row broadcast (fine); the
    // points↔intervals join itself must be an EQUI-join on the minute
    // bucket, never a nested loop over the events side.
    val p = out.queryExecution.executedPlan.toString
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[bkt".r
      .findFirstIn(p).nonEmpty, s"points join not bucketed:\n$p")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // expected = every event with lo <= t < hi: the 8 flood events, the
    // minute-98/99 background events (ids 16, 17), and the lo / hi-1
    // boundary probes (ids 18, 20); lo-1 (19) and hi (21) stay out.
    val expectIds = ts.zipWithIndex.collect {
      case (t, i) if t >= base - 90000000L && t < base + 150000000L => i.toLong
    }.toSet
    assert(expectIds == (inside.indices.map(_.toLong).toSet ++ Set(16L, 17L, 18L, 20L)))
    assert(got == expectIds.map(id => (id, base)),
      s"got ${got.toSeq.sorted}, want ids ${expectIds.toSeq.sorted}")
  }

  test("agg_funnel: steps only count at-or-after the previous step") {
    val dir = java.nio.file.Files.createTempDirectory("fn").toString
    val rows = Seq(
      // u1: clean view→click→purchase
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // u2: purchase BEFORE the first click never counts
      (4L, 5000L, 2L, "view"), (5L, 4000L, 2L, "purchase"), (6L, 6000L, 2L, "click"),
      // u3: no view → not in the funnel at all
      (7L, 1000L, 3L, "click"),
      // u4: view only
      (8L, 1000L, 4L, "view"),
      // u5: click ties the view timestamp (at-or-after is inclusive)
      (9L, 7000L, 5L, "view"), (10L, 7000L, 5L, "click"))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, tMs, u, et) =>
        Row(id, new java.sql.Timestamp(tMs), u, et, 1.0, "")
      }: _*),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .write.parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("agg_funnel")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("salted join: survives a user _salt column and unhashable non-key types") {
    // Regression (round-3 advisor): the shard column must not clobber
    // pre-existing user data, and the per-row shard hash must not touch
    // non-key columns (a MapType column fails analysis inside hash()).
    val big = spark.range(0, 1000)
      .select(col("id"), (col("id") % 3).cast("string").as("k"),
        lit(7).as("_salt"),
        map(lit("a"), col("id")).as("props"))
    val small = spark.createDataFrame(java.util.Arrays.asList(
        Row("0", 10L), Row("1", 20L), Row("2", 30L)),
      StructType(Seq(StructField("k", StringType),
        StructField("w", LongType))))
    val out = ext.SaltedJoin(big, small, Seq("k"), salt = 4)
    assert(out.columns.contains("_salt"), "user _salt column dropped")
    assert(out.count() == 1000)
    assert(out.filter(col("_salt") =!= 7).count() == 0,
      "user _salt values clobbered by the shard column")
    // set ops reject MapType — compare on the scalar columns (the map
    // column's survival is covered by the count/clobber checks above)
    val cmp = Seq("id", "k", "_salt", "w").map(col)
    val plain = big.join(small, "k").select(cmp: _*)
    assert(out.select(cmp: _*).exceptAll(plain).isEmpty)
  }

  test("salted join: identical rows to the plain join, exchange on the salted key") {
    val sf = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("join_skew_salted")(spark, sf)
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\([^)]*_salt".r.findFirstIn(p).nonEmpty,
      s"big-side exchange not keyed on the salt:\n$p")
    val ev = queries.EventBars.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        queries.Rounding.r6(col("value")).as("value"))
    val dim = queries.EventBars.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n_type"))
    val plain = ev.join(dim, "event_type")
      .select(out.columns.map(col).toIndexedSeq: _*)
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
  }

  test("agg_grouping_sets ≡ union of its three grouping levels") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def agg(keys: Seq[String]) = li.groupBy(keys.map(col): _*)
      .agg(queries.Rounding.r4(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n"))
    val manual = agg(Seq("l_returnflag", "l_linestatus"))
      .unionByName(agg(Seq("l_returnflag"))
        .withColumn("l_linestatus", lit(null).cast("string")), allowMissingColumns = true)
      .unionByName(agg(Seq.empty)
        .withColumn("l_returnflag", lit(null).cast("string"))
        .withColumn("l_linestatus", lit(null).cast("string")), allowMissingColumns = true)
      .select("l_returnflag", "l_linestatus", "sum_qty", "n")
    val gs = SparkEntry.queries("agg_grouping_sets")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "n")
    assert(gs.exceptAll(manual).isEmpty && manual.exceptAll(gs).isEmpty)
  }
}
