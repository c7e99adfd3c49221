package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Graph-structure batch 2 + seasonal decomposition: k-core peeling and
  * a component-size census over the embedding near-dup graph, and an
  * STL-style trend/seasonal/residual split of the bar series.
  *
  * Scale notes: the 2-core peel is a FIXED number of exchange-aligned
  * semi-join rounds over a once-checkpointed symmetric edge list (each
  * round is degree-count + two semi-joins on the same key; bounded
  * rounds ⇒ bounded lineage — the same posture as the PageRank loop);
  * the census aggregates the CC labels twice (labels only, never
  * vectors). The STL split is one ticker exchange for the centered-MA
  * window plus a broadcast join of the O(tickers×24) seasonal means.
  *
  * Float parity: peeling is pure integer degree logic; the census is
  * integer counts; STL's seasonal means cross the shuffle as
  * micro-quantized longs, and the residual is assembled with the same
  * textual expression on both engines.
  */
object GraphStlQueries {

  private val r6 = Rounding.r6 _

  /** Peel-round CAP — matches the oracle's fixed 6 rounds. The engine
    * exits as soon as a round removes no edges (peeling is monotone,
    * so a no-op round proves the fixpoint and every further round is
    * the identity — output provably equal to the always-6 unroll);
    * the cap only binds on graphs whose peel chains outlast it, where
    * both engines stop at the same partially-peeled state. */
  private val PeelRounds = 6

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 2-core of the embedding near-dup graph: drop degree-<2 nodes,
    // re-count, repeat until no edge drops (or the round cap). Each
    // kept round materializes via localCheckpoint (bounded lineage —
    // the PageRank posture); its count() is a near-free scan of the
    // checkpointed blocks and doubles as the fixpoint test, so a
    // converged graph pays ONE extra no-op round, not six
    // checkpointed ones.
    "graph_kcore" -> ((s, dir) => {
      val pairs = ExtQueries.queries("emb_neardup_lsh")(s, dir)
        .select(col("a"), col("b"))
      var e = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      var n = e.count()
      var round = 0
      var converged = n == 0L
      while (!converged && round < PeelRounds) {
        val good = e.groupBy("a").agg(count(lit(1)).as("d"))
          .filter(col("d") >= 2).select(col("a"))
        val next = e.join(good, Seq("a"), "left_semi")
          .join(good.select(col("a").as("b")), Seq("b"), "left_semi")
          .localCheckpoint()
        val m = next.count()
        converged = m == n
        e = next
        n = m
        round += 1
      }
      e.groupBy(col("a").as("vec_id"))
        .agg(count(lit(1)).as("core_degree"))
    }),

    // Label-propagation communities (3 synchronous rounds) over the
    // embedding near-dup graph: init label(v) = v; per round every
    // node adopts its neighbors' most frequent label (ties → smallest
    // label), isolated nodes keep their own. Unlike connected
    // components, LPA splits bridge-joined clumps — the community
    // view of the duplicate graph. Deterministic by construction:
    // integer counts, total tie order, synchronous rounds.
    //
    // Scale shape: each round is ONE shuffle of (node, neighbor-label)
    // longs — the argmax runs as a map-side-combinable count +
    // min-of-struct aggregate (never a window over the edge list);
    // labels re-attach by id left-join; bounded rounds with
    // localCheckpoint lineage (the PageRank posture). Vectors never
    // move: the edge list is the only input.
    "graph_lpa" -> ((s, dir) => {
      val pairs = ExtQueries.queries("emb_neardup_lsh")(s, dir)
        .select(col("a"), col("b"))
      val edges = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      var lbl = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("id"),
          col("vec_id").cast("long").as("lbl"))
      for (_ <- 1 to 3) {
        val nb = edges
          .join(lbl.select(col("id").as("b"), col("lbl").as("nlbl")), Seq("b"))
          .groupBy("a", "nlbl").agg(count(lit(1)).as("c"))
          .groupBy("a")
          .agg(min(struct(negate(col("c")).as("nc"), col("nlbl"))).as("m"))
          .select(col("a").as("id"), col("m.nlbl").as("newlbl"))
        lbl = lbl.join(nb, Seq("id"), "left")
          .select(col("id"), coalesce(col("newlbl"), col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      lbl.select(col("id").as("vec_id"), col("lbl").as("label"))
    }),

    // Strongly connected components of the DIRECTED containment graph:
    // edge a→b when ≥90% of a's shingles appear in b (the asymmetric
    // relation dedup_containment measures) — SCCs are groups of
    // MUTUALLY containing docs (true near-identical content), while
    // one-way quote/superset chains stay separate, which undirected CC
    // cannot distinguish. Candidates come from the same band index as
    // every dedup query; the 0.9 threshold compares exact integers
    // (ia·10 ≥ na·9), no float boundary. The component solve is
    // [[graft.ext.StronglyConnectedComponents]]: Tarjan under the
    // 100k-edge cutover, min-label forward/backward peeling above it.
    "graph_scc" -> ((s, dir) => {
      val m = ExtCommon.minhashPairs(s, dir)
        .withColumn("ia", expr("CAST(size(array_intersect(" +
          "array_distinct(sha), array_distinct(shb))) AS BIGINT)"))
        .withColumn("na", expr("CAST(size(array_distinct(sha)) AS BIGINT)"))
        .withColumn("nb", expr("CAST(size(array_distinct(shb)) AS BIGINT)"))
        .select(col("a"), col("b"), col("ia"), col("na"), col("nb"))
        .localCheckpoint()
      val e = m.filter(col("ia") * 10 >= col("na") * 9)
        .select(col("a").as("src"), col("b").as("dst"))
        .unionAll(m.filter(col("ia") * 10 >= col("nb") * 9)
          .select(col("b").as("src"), col("a").as("dst")))
      val nodes = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("id"))
      graft.ext.StronglyConnectedComponents(nodes, e)
        .select(col("id").as("doc_id"), col("scc_id"))
    }),

    // Multi-source BFS over the embedding near-dup graph: every node
    // with vec_id ≡ 0 (mod 8) seeds at distance 0, and 3 synchronous
    // frontier rounds propagate (dist, seed) — each round ONE
    // equi-join of the state against the checkpointed edge list plus
    // a map-side-combinable min-of-struct argmin (no windows): the
    // bounded-round BSP traversal (Pregel's shape) that costs R
    // key-partitioned shuffles at ANY graph size. Keeping the full
    // state in the union makes dist monotone, so 3 rounds ≡ hop
    // distances capped at 3. Output: every reached node, its hop
    // distance, and the nearest seed (lowest seed id on ties).
    "graph_bfs" -> ((s, dir) => {
      val pairs = ExtQueries.queries("emb_neardup_lsh")(s, dir)
        .select(col("a"), col("b"))
      val edges = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      var state = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("id"))
        .filter(col("id") % 8 === 0)
        .select(col("id"), lit(0L).as("dist"), col("id").as("seed"))
        .localCheckpoint()
      for (_ <- 1 to 3) {
        val cand = edges
          .join(state.select(col("id").as("a"), col("dist"), col("seed")),
            Seq("a"))
          .select(col("b").as("id"), (col("dist") + 1).as("dist"), col("seed"))
        state = state.union(cand)
          .groupBy("id")
          .agg(min(struct(col("dist"), col("seed"))).as("m"))
          .select(col("id"), col("m.dist").as("dist"), col("m.seed").as("seed"))
          .localCheckpoint()
      }
      state.select(col("id").as("vec_id"), col("dist"), col("seed"))
    }),

    // Component-size census of the semantic-dup clusters: how many
    // components of each size (plus the singleton mass) — the shape of
    // the duplicate graph at a glance. Label arithmetic only.
    "graph_cc_hist" -> ((s, dir) => {
      val sizes = ScaleQueries.queries("dedup_semantic")(s, dir)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      sizes.groupBy(col("sz").as("component_size"))
        .agg(count(lit(1)).as("n_components"))
    }),

    // STL-style decomposition: trend = 25-bar centered MA (frame sums
    // — engines agree bit-for-bit), seasonal = hour-of-day mean of the
    // micro-quantized detrended series (exact long sums, broadcast
    // back), residual = detrended − seasonal.
    "ts_stl" -> ((s, dir) => {
      val w = Window.partitionBy("ticker").orderBy("t", "event_id")
      val b = EventBars.bars(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("ticker")))
        .withColumn("trend",
          when(col("rn") >= 13 && col("rn") <= col("n") - 12,
            avg(col("close")).over(w.rowsBetween(-12, 12))))
        .withColumn("detr", col("close") - col("trend"))
        .withColumn("hr", expr("(t div 3600000000) % 24"))
        .withColumn("dq",
          when(col("detr").isNotNull,
            round(col("detr") * lit(1e6)).cast("long")))
      val seas = b.filter(col("dq").isNotNull)
        .groupBy("ticker", "hr")
        .agg((sum(col("dq")).cast("double")
          / count(lit(1)).cast("double") / lit(1e6)).as("seasonal_raw"))
      b.join(broadcast(seas), Seq("ticker", "hr"), "left")
        .select(col("ticker"), col("t"), col("event_id"),
          r6(col("trend")).as("trend"),
          r6(when(col("trend").isNotNull, col("seasonal_raw"))).as("seasonal"),
          r6(when(col("trend").isNotNull,
            col("detr") - col("seasonal_raw"))).as("resid"))
    }))

  private def kcoreRoundsDuck: String =
    (1 to PeelRounds).map { i =>
      val prev = s"e${i - 1}"
      s"""d$i AS (SELECT a, count(*) AS c FROM $prev GROUP BY a),
         |e$i AS (SELECT e.a, e.b FROM $prev e
         |  JOIN d$i x ON x.a = e.a AND x.c >= 2
         |  JOIN d$i y ON y.a = e.b AND y.c >= 2)""".stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(

    "graph_kcore" ->
      s"""WITH ${ExtCommon.embPairsDuck},
         |e0 AS (SELECT a, b FROM epr UNION ALL SELECT b, a FROM epr),
         |$kcoreRoundsDuck
         |SELECT a AS vec_id, count(*) AS core_degree
         |FROM e$PeelRounds GROUP BY a""".stripMargin,

    "graph_scc" ->
      s"""WITH RECURSIVE ${ExtCommon.candPairsDuck},
         |m AS (SELECT a, b,
         |    len(list_distinct(list_intersect(list_distinct(sha),
         |      list_distinct(shb))))::BIGINT AS ia,
         |    len(list_distinct(sha))::BIGINT AS na,
         |    len(list_distinct(shb))::BIGINT AS nb
         |  FROM cp),
         |e AS (SELECT a AS src, b AS dst FROM m WHERE ia * 10 >= na * 9
         |  UNION SELECT b, a FROM m WHERE ia * 10 >= nb * 9),
         |reach(ra, rb) AS (
         |  SELECT doc_id::BIGINT, doc_id::BIGINT FROM documents
         |  UNION
         |  SELECT r.ra, e.dst FROM reach r JOIN e ON e.src = r.rb)
         |SELECT x.ra AS doc_id, min(x.rb) AS scc_id
         |FROM reach x JOIN reach y ON y.ra = x.rb AND y.rb = x.ra
         |GROUP BY 1""".stripMargin,

    "graph_lpa" -> {
      def layer(k: Int): String = {
        val (prev, n, b, next) = (s"l${k - 1}", s"n$k", s"b$k", s"l$k")
        s"""$n AS (SELECT e.a, l.lbl AS nlbl, count(*)::BIGINT AS c
           |  FROM e JOIN $prev l ON l.id = e.b GROUP BY 1, 2),
           |$b AS (SELECT a AS id, nlbl AS newlbl FROM (
           |    SELECT *, row_number() OVER (PARTITION BY a ORDER BY c DESC, nlbl) AS rk
           |    FROM $n) WHERE rk = 1),
           |$next AS MATERIALIZED (SELECT l.id, coalesce(b.newlbl, l.lbl) AS lbl
           |  FROM $prev l LEFT JOIN $b b USING (id))""".stripMargin
      }
      s"""WITH ${ExtCommon.embPairsDuck},
         |e AS MATERIALIZED (SELECT a, b FROM epr UNION ALL SELECT b, a FROM epr),
         |l0 AS MATERIALIZED (SELECT vec_id::BIGINT AS id, vec_id::BIGINT AS lbl
         |  FROM embeddings),
         |${layer(1)},
         |${layer(2)},
         |${layer(3)}
         |SELECT id AS vec_id, lbl AS label FROM l3""".stripMargin
    },

    "graph_bfs" -> {
      def hop(k: Int): String = {
        val (prev, c, u, next) = (s"s${k - 1}", s"c$k", s"u$k", s"s$k")
        s"""$c AS (SELECT e.b AS id, s.dist + 1 AS dist, s.seed
           |  FROM e JOIN $prev s ON s.id = e.a),
           |$u AS (SELECT * FROM $prev UNION ALL SELECT * FROM $c),
           |$next AS MATERIALIZED (SELECT id, dist, seed FROM (
           |    SELECT *, row_number() OVER (PARTITION BY id
           |      ORDER BY dist, seed) AS rk FROM $u) WHERE rk = 1)""".stripMargin
      }
      s"""WITH ${ExtCommon.embPairsDuck},
         |e AS MATERIALIZED (SELECT a, b FROM epr UNION ALL SELECT b, a FROM epr),
         |s0 AS MATERIALIZED (SELECT vec_id::BIGINT AS id, 0::BIGINT AS dist,
         |    vec_id::BIGINT AS seed FROM embeddings WHERE vec_id % 8 = 0),
         |${hop(1)},
         |${hop(2)},
         |${hop(3)}
         |SELECT id AS vec_id, dist::BIGINT AS dist, seed FROM s3""".stripMargin
    },

    "graph_cc_hist" ->
      s"""WITH RECURSIVE ${ExtCommon.embPairsDuck},
         |e AS (SELECT a, b FROM epr UNION SELECT b, a FROM epr),
         |reach(id, lbl) AS (
         |  SELECT vec_id::BIGINT, vec_id::BIGINT FROM embeddings
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         |cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |sizes AS (SELECT cluster_id, count(*) AS sz FROM cc
         |  GROUP BY cluster_id)
         |SELECT sz AS component_size, count(*) AS n_components
         |FROM sizes GROUP BY sz""".stripMargin,

    "ts_stl" ->
      s"""WITH bars AS (${EventBars.sqlBars}),
         |f AS (
         |  SELECT ticker, t, event_id, close,
         |    row_number() OVER (PARTITION BY ticker ORDER BY t, event_id)
         |      AS rn,
         |    count(*) OVER (PARTITION BY ticker) AS n,
         |    avg(close) OVER (PARTITION BY ticker ORDER BY t, event_id
         |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS ma
         |  FROM bars),
         |g AS (
         |  SELECT *,
         |    CASE WHEN rn >= 13 AND rn <= n - 12 THEN ma END AS trend,
         |    (t // 3600000000) % 24 AS hr
         |  FROM f),
         |h AS (
         |  SELECT *, close - trend AS detr,
         |    CASE WHEN close - trend IS NOT NULL
         |      THEN CAST(round((close - trend) * 1e6) AS BIGINT) END AS dq
         |  FROM g),
         |seas AS (
         |  SELECT ticker, hr,
         |    CAST(sum(dq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
         |      AS seasonal_raw
         |  FROM h WHERE dq IS NOT NULL GROUP BY ticker, hr)
         |SELECT h.ticker, h.t, h.event_id,
         |  (round(trend, 6) + 0.0) AS trend,
         |  (round(CASE WHEN trend IS NOT NULL THEN seasonal_raw END, 6) + 0.0)
         |    AS seasonal,
         |  (round(CASE WHEN trend IS NOT NULL THEN detr - seasonal_raw END, 6)
         |    + 0.0) AS resid
         |FROM h LEFT JOIN seas ON h.ticker = seas.ticker AND h.hr = seas.hr"""
        .stripMargin)
}
