package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, ConnectedComponents, Multimodal, TextOps}
import graft.functions.GraftFunctions

import TextOps._
import ExtCommon._

/** Deduplication family (SURVEY.md §7.4; split out of ExtQueries r11):
  * exact hash-dedup, MinHash/LSH near-dup with banded posting joins,
  * SimHash, prefix-filtered exact jaccard verification, pointer-jumping
  * cluster resolution, and the KMV distinct sketch. Shared LSH/shingle
  * machinery lives in [[ExtCommon]]; `ExtQueries.queries` re-exports
  * every entry, so the driver registry is unchanged. */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EXACT all-pairs jaccard ≥ 0.8 similarity join over the whole
    // corpus — prefix-filtered (see jaccardJoinExact), NOT the block
    // all-pairs: the oracle verifies the pair set nested-loop, the
    // engine never materializes O(n²) comparisons.
    "dedup_allpairs" -> ((s, dir) =>
      jaccardJoinExact(shingleSets(s, dir), 4, 5)
        .select(col("a"), col("b"), Rounding.r6(col("jac")).as("jaccard"))),

    // Threshold-sensitivity sweep for near-dup removal: exact pair and
    // affected-doc counts at jaccard ≥ 0.7 / 0.8 / 0.9, all read off
    // ONE prefix-filtered exact join at the loosest threshold — the
    // table a curation run consults before committing to a cutoff.
    // Taus with zero pairs drop out (groupBy-on-constant keeps the
    // empty-in → empty-out law).
    "dedup_threshold_sweep" -> ((s, dir) => {
      val pp = jaccardJoinExact(shingleSets(s, dir), 7, 10)
        .select(col("a"), col("b"), col("jac"))
        .localCheckpoint()
      Seq(0.7, 0.8, 0.9).map { tau =>
        val f = pp.filter(col("jac") >= tau)
        val a1 = f.groupBy(lit(true).as("_g"))
          .agg(count(lit(1)).as("n_pairs"))
        val a2 = f.select(explode(array(col("a"), col("b"))).as("d"))
          .groupBy(lit(true).as("_g"))
          .agg(countDistinct(col("d")).as("n_docs"))
        a1.join(a2, "_g")
          .select(lit(tau).as("tau"), col("n_pairs"), col("n_docs"))
      }.reduce(_ unionAll _)
    }),

    // LSH band-plan tuning curve: for every (bands, rows) split of the
    // 12 minhashes, the EXPECTED recall the banding would achieve on
    // the TRUE near-dup pair set — E[1 − (1 − s^r)^b] over exact
    // jaccard s ≥ 0.8 pairs. The table a curation run consults before
    // picking its banding (more bands = more recall, more candidate
    // mass); the engine's operating point (4, 3) sits in the sweep.
    // Powers expand to literal multiplication chains (pow() can differ
    // by an ulp across libms); per-pair probabilities micro-quantize
    // to longs before the cross-partition sum (a double sum across a
    // shuffle is summation-order-nondeterministic).
    "dedup_band_sweep" -> ((s, dir) => {
      val pp = jaccardJoinExact(shingleSets(s, dir), 4, 5)
        .select(col("jac")).localCheckpoint()
      Seq((2, 6), (3, 4), (4, 3), (6, 2), (12, 1)).map { case (b, r) =>
        pp.select(expr(s"CAST(round((${bandDetectP(b, r)}) * 1000000.0)" +
            " AS BIGINT)").as("pi"))
          .groupBy(lit(true).as("_g"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("pi")).as("sp"))
          .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
            col("n_pairs"),
            Rounding.r6(expr("CAST(sp AS DOUBLE) / CAST(n_pairs AS DOUBLE)" +
              " / 1000000.0")).as("expected_recall"))
      }.reduce(_ unionAll _)
    }),

    "dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .select(expr("md5(encode(text, 'utf-8'))").as("h"), col("doc_id").cast("long").as("doc_id"))
        .groupBy("h")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical"))),

    // Pure projection — the majority-vote fold runs per row in the
    // native graft_simhash expression, so there is no explode, no
    // 16-sum groupBy, and NO shuffle at all. (The explode→groupBy
    // formulation shuffled one row per token.) Docs with no tokens are
    // excluded exactly like explode of an empty array excluded them.
    "dedup_simhash" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(whS))
        .filter(expr("size(wh) > 0"))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(s"graft_simhash(wh, $SimBits)").as("simhash"))),

    "dedup_minhash_lsh" -> ((s, dir) =>
      minhashPairs(s, dir).select(col("a"), col("b"),
        Rounding.r6(expr("graft_minhash_est(mha, mhb)")).as("est_sim"),
        Rounding.r6(jaccardExpr).as("jaccard"))),

    // INCREMENTAL near-dup — dedup a NEW shard (doc_id ≡ 3 mod 20, a
    // daily ingest ~5% of the corpus) against the EXISTING corpus
    // without re-pairing the corpus with itself: only the shard's
    // banded rows probe the persisted band index (the checkpointed
    // capped band table both LSH paths share), so the candidate join's
    // left side — and with it the per-day pair-generation work — is
    // proportional to the INGEST, not the corpus. least/greatest
    // normalization + pair dedup collapse the twice-generated
    // new↔new pairs; the result is EXACTLY the full-corpus jaccard
    // ≥ 0.8 pair set restricted to pairs touching the shard (the cap
    // window still counts the full band table, so no pair appears or
    // disappears vs the batch run — property-pinned in ExtDedupSpec).
    // Reference analog: the per-day incremental Airflow runs
    // (airflow_dag.py:22-26) re-process one day against history.
    "dedup_incremental" -> ((s, dir) => {
      val (sigs, banded) = lshTables(s, dir)
      val probe = banded.filter(col("doc_id") % 20 === 3)
      val pairs = probe.as("x").hint("shuffle_hash")
        .join(banded.as("y").hint("shuffle_hash"),
          col("x.bk") === col("y.bk") && col("x.doc_id") =!= col("y.doc_id"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
        .dropDuplicates("a", "b")
      attachSigs(pairs, sigs)
        .filter(jaccardExpr >= 0.8)
        .select(col("a"), col("b"), Rounding.r6(jaccardExpr).as("jaccard"))
    }),

    // Recall measurement for the banded MinHash-LSH path — the text
    // analog of sim_recall, turning the family's recall caveat into a
    // queryable number: exact jaccard ≥ 0.8 pairs anchored on a 10%
    // query split (smaller id ≡ 0 mod 10) vs the pairs the banded
    // candidate join actually surfaced. The exact side rides the
    // prefix-filtered similarity join (jaccardJoinExact) with the
    // query split pushed into the candidate stage — no O(n²) block
    // pass anywhere in the plan.
    "dedup_lsh_recall" -> ((s, dir) => {
      val exact = jaccardJoinExact(shingleSets(s, dir), 4, 5,
        queryPred = Some(col("doc_id") % 10 === 0))
        .select(col("a"), col("b"))
      val cand = minhashPairs(s, dir)
        .filter(jaccardExpr >= 0.8)
        .filter(col("a") % 10 === 0)
        .select(col("a"), col("b"), lit(1).as("hit"))
      exact.join(cand, Seq("a", "b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_found"))
        .filter(col("n_exact") > 0)
        .select(col("n_exact"), col("n_found"),
          Rounding.r6(col("n_found").cast("double")
            / col("n_exact").cast("double")).as("recall"))
    }),

    // The silent-cap REPORT next to the banded LSH family: how many
    // band buckets exceed [[MaxBandBucket]] (their rows are dropped
    // from candidate pairing as exact-dup-shaped floods) and how many
    // banded rows that removes. One row — zeros on a healthy corpus —
    // so the cap is never invisible: pipelines gate on n_rows_dropped
    // before trusting dedup_minhash_lsh's recall. (Constant-group so
    // an EMPTY corpus keeps the suite's empty-in → empty-out law.)
    "dedup_lsh_skipped" -> ((s, dir) => {
      val sizes = docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(whS))
        .withColumn("sh", expr(shS))
        .filter(expr("size(sh) > 0"))
        .withColumn("mh", expr(mhS))
        .withColumn("bands", expr(bandsS))
        .select(explode(expr(bkS)).as("bk"))
        .groupBy("bk").agg(count(lit(1)).as("n"))
      sizes.groupBy(lit(true).as("_g")).agg(
        sum(col("n")).as("n_rows_total"),
        count(when(col("n") > MaxBandBucket, lit(1)))
          .as("n_buckets_capped"),
        sum(when(col("n") > MaxBandBucket, col("n"))
          .otherwise(lit(0L))).as("n_rows_dropped"))
        .select(col("n_rows_total"), col("n_buckets_capped"),
          col("n_rows_dropped"))
    }),

    // The kept corpus — what a pipeline actually materializes after
    // near-dup detection: greedy keep-lowest-id (every pair's higher id
    // is dropped when jaccard clears the threshold; the `a < b` pair
    // orientation makes the survivor deterministic). Anti-join on the
    // loser set — docs shuffle only their ids.
    "dedup_keep" -> ((s, dir) => {
      val losers = minhashPairs(s, dir)
        .filter(jaccardExpr >= 0.8)
        .select(col("b").as("doc_id")).distinct()
      // No broadcast hint on purpose: when the near-dup fraction is
      // small AQE converts this to a broadcast anti-join at runtime
      // (it knows the post-shuffle size), but a boilerplate-heavy
      // corpus can make the loser set a large fraction of the ids —
      // a forced broadcast would OOM there, the adaptive choice won't.
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("n_chars"))
        .join(losers, Seq("doc_id"), "left_anti")
    }),

    // The before/after dedup summary a curation run publishes: corpus
    // size, exact-unique count (distinct content hash), docs surviving
    // near-dup removal, and the two retention ratios. Three bounded
    // scalar aggregates composed by a 1-row join — constant-group so
    // an empty corpus yields zero rows, like every report here.
    "corpus_dedup_stats" -> ((s, dir) => {
      val tot = docs(s, dir)
        .groupBy(lit(true).as("_g"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_exact_unique"))
      val kept = ExtQueries.queries("dedup_keep")(s, dir)
        .groupBy(lit(true).as("_g"))
        .agg(count(lit(1)).as("n_near_kept"))
      tot.join(broadcast(kept), Seq("_g"))
        .select(col("n_docs"), col("n_exact_unique"), col("n_near_kept"),
          Rounding.r6(col("n_exact_unique").cast("double")
            / col("n_docs").cast("double")).as("exact_ratio"),
          Rounding.r6(col("n_near_kept").cast("double")
            / col("n_docs").cast("double")).as("near_ratio"))
    }),

    // Near-dup CLUSTERS, not just pairs: connected components over the
    // jaccard ≥ 0.8 candidate graph (A≈B, B≈C ⇒ one {A,B,C} cluster
    // even when LSH never emitted A≈C). cluster_id = min doc_id in the
    // component; singletons keep their own id, so this is the full
    // doc → dedup-group assignment a pipeline partitions on when
    // choosing one representative per group. The oracle walks the same
    // edges with a recursive CTE.
    "dedup_cluster" -> ((s, dir) => {
      val edges = minhashPairs(s, dir)
        .filter(jaccardExpr >= 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = docs(s, dir).select(col("doc_id").cast("long").as("id"))
      ConnectedComponents(nodes, edges)
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
    }),

    // Leakage-safe train/valid/test split: corpus_split hashes
    // doc_id, so two near-duplicate documents can land in train AND
    // test — the eval contamination dedup exists to prevent. Here the
    // split hashes the near-dup CLUSTER id instead, so a whole
    // duplicate cluster moves as one unit and no near-dup pair ever
    // straddles a split boundary (OpsSpec pins the property on the
    // edge set). Same distributed CC as dedup_cluster; the hash/split
    // assignment is a per-row map over its output — no extra shuffle.
    "corpus_split_leakage" -> ((s, dir) => {
      val edges = minhashPairs(s, dir)
        .filter(jaccardExpr >= 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = docs(s, dir).select(col("doc_id").cast("long").as("id"))
      ConnectedComponents(nodes, edges)
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .withColumn("bucket",
          expr(s"(((cluster_id % ${P}L) * 2654435761L) % ${P}L) % 10"))
        .select(col("doc_id"), col("cluster_id"),
          when(col("bucket") < 8, lit("train"))
            .when(col("bucket") === 8, lit("valid"))
            .otherwise(lit("test")).as("split"))
    }),

    // Incremental CLUSTER MAINTENANCE: when the daily shard
    // (doc_id ≡ 3 mod 20) lands, update the near-dup clusters WITHOUT
    // re-running connected components over the full corpus graph.
    // Yesterday's labels (CC over corpus-only edges — what a daily
    // batch has persisted) contract each old component to its label
    // supernode; the new CC runs on the CONTRACTED graph of shard ids
    // ∪ old labels with only the shard-touching edges — at scale that
    // graph is |shard| + |touched components|, not |corpus|. Because
    // old labels ARE their components' min doc_ids, min-label over
    // the contracted groups reproduces the full-graph labels exactly:
    // output ≡ dedup_cluster (same oracle), every doc relabeled by
    // one label-to-label broadcast-sized join.
    "dedup_cluster_incremental" -> ((s, dir) => {
      val isShard = (c: Column) => c % 20 === 3
      val pairs = minhashPairs(s, dir).filter(jaccardExpr >= 0.8)
        .select(col("a"), col("b")).localCheckpoint()
      val ids = docs(s, dir).select(col("doc_id").cast("long").as("id"))
      val old = ConnectedComponents(
        ids.filter(!isShard(col("id"))),
        pairs.filter(!isShard(col("a")) && !isShard(col("b")))
          .select(col("a").as("src"), col("b").as("dst")))
        .localCheckpoint()
      val contracted = pairs
        .filter(isShard(col("a")) || isShard(col("b")))
        .join(old.select(col("id").as("a"), col("lbl").as("la")), Seq("a"), "left")
        .join(old.select(col("id").as("b"), col("lbl").as("lb")), Seq("b"), "left")
        .select(coalesce(col("la"), col("a")).as("src"),
          coalesce(col("lb"), col("b")).as("dst"))
      val merged = ConnectedComponents(
        ids.filter(isShard(col("id")))
          .union(old.select(col("lbl").as("id")).distinct()),
        contracted)
        .select(col("id").as("node"), col("lbl").as("new_lbl"))
        .localCheckpoint()
      val corpusFinal = old
        .join(merged, col("lbl") === col("node"))
        .select(col("id").as("doc_id"), col("new_lbl").as("cluster_id"))
      val shardFinal = merged.filter(isShard(col("node")))
        .select(col("node").as("doc_id"), col("new_lbl").as("cluster_id"))
      corpusFinal.union(shardFinal)
    }),

    // Modularity of the SOURCE partition over the near-dup graph —
    // "do near-dups concentrate within sources, or leak across
    // them?". Per source c: within-edge count e_c, cross-edge count,
    // degree mass d_c, and the Newman modularity contribution
    // q_c = e_c/m − (d_c/2m)² (Σ q_c is the partition's Q; a large
    // cross mass means templated text is shared across sources and a
    // per-source dedup would miss it). Every mass is an exact integer
    // aggregate; each q_c divides once at the end — no double ever
    // sums across a shuffle. Sources outside the edge set carry no
    // information here and are omitted (deterministic on both
    // engines).
    "graph_source_modularity" -> ((s, dir) => {
      val src = docs(s, dir)
        .select(col("doc_id").cast("long").as("id"), col("source"))
      val e = minhashPairs(s, dir)
        .filter(jaccardExpr >= 0.8)
        .select(col("a"), col("b"))
        .join(broadcast(src.select(col("id").as("a"),
          col("source").as("sa"))), Seq("a"))
        .join(broadcast(src.select(col("id").as("b"),
          col("source").as("sb"))), Seq("b"))
        .localCheckpoint()
      val tot = e.agg(count(lit(1)).as("m"))
      val ends = e.select(col("sa").as("source"), col("sb"))
        .select(explode(array(col("source"), col("sb"))).as("source"))
      val deg = ends.groupBy("source").agg(count(lit(1)).as("dc"))
      val within = e.filter(col("sa") === col("sb"))
        .groupBy(col("sa").as("source")).agg(count(lit(1)).as("ec"))
      val crossE = e.filter(col("sa") =!= col("sb"))
        .select(explode(array(col("sa"), col("sb"))).as("source"))
        .groupBy("source").agg(count(lit(1)).as("xc"))
      deg.join(within, Seq("source"), "left")
        .join(crossE, Seq("source"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"),
          col("dc").as("degree_mass"),
          coalesce(col("ec"), lit(0L)).as("e_within"),
          coalesce(col("xc"), lit(0L)).as("e_cross"),
          Rounding.r6(expr(
            "CAST(coalesce(ec, 0) AS DOUBLE) / CAST(m AS DOUBLE)" +
              " - (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))" +
              " * (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))"))
            .as("q_contrib"))
    }),

    // What the pipeline materializes from the clusters: ONE
    // representative per near-dup group — longest doc wins, lowest id
    // breaks ties. A single groupBy with an argmax struct (no
    // per-cluster sort, no window): max(struct(n_chars, −doc_id))
    // carries the winner through the partial aggregates, so the shuffle
    // moves one candidate per cluster per map task, never the docs.
    "dedup_cluster_keep" -> ((s, dir) => {
      val edges = minhashPairs(s, dir)
        .filter(jaccardExpr >= 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = docs(s, dir).select(col("doc_id").cast("long").as("id"))
      val cluster = ConnectedComponents(nodes, edges)
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      cluster
        .join(docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
          col("n_chars")), "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("w"))
        .select(col("cluster_id"), (-col("w.neg_id")).as("rep_doc_id"),
          col("w.n_chars").as("rep_n_chars"), col("n_members"))
    }),

    // KMV (k-minimum-values) distinct sketch — a deterministic sketch
    // both engines compute identically: est = (k-1)·P / h_(k), exact
    // fallback when the group has fewer than k distinct hashes. The
    // k-th hash comes from the two-phase KMin (per-partition k-minima
    // → ≤ k·P-row per-group window), never a whole-group sort.
    "sketch_kmv" -> ((s, dir) => {
      val k = 64
      val h = s"((user_id % ${P}L) * 2654435761L) % ${P}L"
      val hashes = EventBars.events(s, dir)
        .select(col("event_type"), expr(h).as("h")).distinct()
      val exact = hashes.groupBy("event_type")
        .agg(count(lit(1)).as("n_exact"))
      val kth = KMin.kth(hashes, Seq("event_type"), "h", k, "hk")
      exact.join(kth, Seq("event_type"), "left")
        .select(col("event_type"), col("n_exact"),
          Rounding.r4(when(col("hk").isNotNull,
            lit((k - 1).toDouble) * lit(P.toDouble) / col("hk").cast("double"))
            .otherwise(col("n_exact").cast("double"))).as("est_distinct"))
    }),

    // Cross-source near-dup matrix — the syndication/contamination
    // readout of the verified LSH pairs: how many near-dup edges stay
    // WITHIN a source (boilerplate, re-posts) vs CROSS source
    // boundaries (mirrored content — the pairs that silently leak one
    // source's held-out split into another's train split). Pure
    // composition over the oracle-gated pair machinery: two id-keyed
    // joins attach sources (no hint — the source map is corpus-sized,
    // AQE decides), the (lo, hi) canonicalization makes each
    // unordered source pair one row. Output rows are bounded by
    // |sources|², whatever the corpus size.
    "dedup_cross_source" -> ((s, dir) => {
      val src = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"))
      minhashPairs(s, dir).filter(jaccardExpr >= 0.8)
        .select(col("a"), col("b"))
        .join(src.select(col("doc_id").as("a"),
          col("source").as("src_a")), "a")
        .join(src.select(col("doc_id").as("b"),
          col("source").as("src_b")), "b")
        .select(least(col("src_a"), col("src_b")).as("source_lo"),
          greatest(col("src_a"), col("src_b")).as("source_hi"))
        .groupBy("source_lo", "source_hi")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cross_source", col("source_lo") =!= col("source_hi"))
    }))

  val oracles: Map[String, String] = Map(

    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*)::BIGINT AS n_docs,
        |  min(doc_id::BIGINT) AS canonical
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $docToks,
         |dh AS (SELECT doc_id, $whD AS wh FROM dt),
         |ex AS (SELECT doc_id, unnest(wh) AS h FROM dh),
         |sm AS (SELECT doc_id,
         |  ${(0 until SimBits).map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n  ")}
         |  FROM ex GROUP BY doc_id)
         |SELECT doc_id,
         |  (${(0 until SimBits).map(b => s"(CASE WHEN s$b >= 0 THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)").mkString(" + ")}) AS simhash
         |FROM sm""".stripMargin,

    "dedup_threshold_sweep" ->
      s"""WITH $docHashes,
         |dff AS (SELECT * FROM ds WHERE len(sh) > 0),
         |shq AS (SELECT doc_id, list_distinct(sh) AS shd FROM dff),
         |pj AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |    len(list_distinct(list_intersect(x.shd, y.shd)))::DOUBLE
         |      / len(list_distinct(list_concat(x.shd, y.shd)))::DOUBLE AS jac
         |  FROM shq x JOIN shq y ON x.doc_id < y.doc_id),
         |t7 AS (SELECT count(*)::BIGINT AS n_pairs FROM pj
         |  WHERE jac >= 0.7 HAVING count(*) > 0),
         |d7 AS (SELECT count(DISTINCT d)::BIGINT AS n_docs FROM
         |  (SELECT unnest([a, b]) AS d FROM pj WHERE jac >= 0.7) u
         |  HAVING count(*) > 0),
         |t8 AS (SELECT count(*)::BIGINT AS n_pairs FROM pj
         |  WHERE jac >= 0.8 HAVING count(*) > 0),
         |d8 AS (SELECT count(DISTINCT d)::BIGINT AS n_docs FROM
         |  (SELECT unnest([a, b]) AS d FROM pj WHERE jac >= 0.8) u
         |  HAVING count(*) > 0),
         |t9 AS (SELECT count(*)::BIGINT AS n_pairs FROM pj
         |  WHERE jac >= 0.9 HAVING count(*) > 0),
         |d9 AS (SELECT count(DISTINCT d)::BIGINT AS n_docs FROM
         |  (SELECT unnest([a, b]) AS d FROM pj WHERE jac >= 0.9) u
         |  HAVING count(*) > 0)
         |SELECT 0.7::DOUBLE AS tau, n_pairs, n_docs FROM t7, d7
         |UNION ALL SELECT 0.8::DOUBLE, n_pairs, n_docs FROM t8, d8
         |UNION ALL SELECT 0.9::DOUBLE, n_pairs, n_docs FROM t9, d9""".stripMargin,

    "dedup_band_sweep" -> {
      def cfg(b: Int, r: Int): String =
        s"""c${b}_$r AS (SELECT count(*)::BIGINT AS n_pairs,
           |    sum(CAST(round((${bandDetectP(b, r)}) * 1000000.0) AS BIGINT))::BIGINT AS sp
           |  FROM pr HAVING count(*) > 0)""".stripMargin
      def row(b: Int, r: Int): String =
        s"SELECT $b::BIGINT AS bands, $r::BIGINT AS rows_per_band, n_pairs," +
          s" (round(CAST(sp AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 1000000.0, 6) + 0.0)" +
          s" AS expected_recall FROM c${b}_$r"
      val cs = Seq((2, 6), (3, 4), (4, 3), (6, 2), (12, 1))
      s"""WITH $docHashes,
         |dff AS (SELECT * FROM ds WHERE len(sh) > 0),
         |shq AS (SELECT doc_id, list_distinct(sh) AS shd FROM dff),
         |pj AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |    len(list_distinct(list_intersect(x.shd, y.shd)))::DOUBLE
         |      / len(list_distinct(list_concat(x.shd, y.shd)))::DOUBLE AS jac
         |  FROM shq x JOIN shq y ON x.doc_id < y.doc_id),
         |pr AS MATERIALIZED (SELECT jac FROM pj WHERE jac >= 0.8),
         |${cs.map { case (b, r) => cfg(b, r) }.mkString(",\n")}
         |${cs.map { case (b, r) => row(b, r) }.mkString("\nUNION ALL ")}""".stripMargin
    },

    "dedup_allpairs" ->
      s"""WITH $docHashes,
         |dff AS (SELECT * FROM ds WHERE len(sh) > 0),
         |shq AS (SELECT doc_id, list_distinct(sh) AS shd FROM dff),
         |pj AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |    len(list_distinct(list_intersect(x.shd, y.shd)))::DOUBLE
         |      / len(list_distinct(list_concat(x.shd, y.shd)))::DOUBLE AS jac
         |  FROM shq x JOIN shq y ON x.doc_id < y.doc_id)
         |SELECT a, b, (round(jac, 6) + 0.0) AS jaccard
         |FROM pj WHERE jac >= 0.8""".stripMargin,

    "dedup_lsh_recall" ->
      s"""WITH $lshPairsDuck,
         |shq AS (SELECT doc_id, list_distinct(sh) AS shd FROM df),
         |ex AS (SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM shq x JOIN shq y
         |    ON x.doc_id < y.doc_id AND x.doc_id % 10 = 0
         |  WHERE len(list_distinct(list_intersect(x.shd, y.shd)))::DOUBLE
         |      / len(list_distinct(list_concat(x.shd, y.shd)))::DOUBLE >= 0.8),
         |cd AS (SELECT a, b FROM pr WHERE a % 10 = 0)
         |SELECT count(*)::BIGINT AS n_exact,
         |  sum(CASE WHEN cd.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_found,
         |  (round(sum(CASE WHEN cd.a IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM ex LEFT JOIN cd ON ex.a = cd.a AND ex.b = cd.b
         |HAVING count(*) > 0""".stripMargin,

    "dedup_lsh_skipped" ->
      s"""WITH $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, unnest($bkD) AS bk FROM db),
         |g AS (SELECT bk, count(*)::BIGINT AS n FROM dk0 GROUP BY 1)
         |SELECT sum(n)::BIGINT AS n_rows_total,
         |  count(CASE WHEN n > $MaxBandBucket THEN 1 END)::BIGINT
         |    AS n_buckets_capped,
         |  coalesce(sum(CASE WHEN n > $MaxBandBucket THEN n END), 0)::BIGINT
         |    AS n_rows_dropped
         |FROM g HAVING count(*) > 0""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket)
         |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |  (round(len(list_filter(generate_series(1, $NumHash), i -> x.mh[i] = y.mh[i]))::DOUBLE / $NumHash.0, 6) + 0.0) AS est_sim,
         |  (round(len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE, 6) + 0.0) AS jaccard
         |FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id""".stripMargin,

    // The BATCH candidate chain restricted to pairs touching the
    // shard — the incremental run must reproduce it bit-for-bit.
    "dedup_incremental" ->
      s"""WITH $candPairsDuck,
         |jc AS (SELECT a, b,
         |    len(list_distinct(list_intersect(list_distinct(sha), list_distinct(shb))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(sha), list_distinct(shb))))::DOUBLE AS jac
         |  FROM cp WHERE a % 20 = 3 OR b % 20 = 3)
         |SELECT a, b, (round(jac, 6) + 0.0) AS jaccard
         |FROM jc WHERE jac >= 0.8""".stripMargin,

    "dedup_keep" ->
      s"""WITH $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
         |losers AS (SELECT DISTINCT y.doc_id
         |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8)
         |SELECT d.doc_id::BIGINT AS doc_id, d.n_chars FROM documents d
         |WHERE d.doc_id::BIGINT NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    "corpus_dedup_stats" ->
      s"""WITH $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
         |losers AS (SELECT DISTINCT y.doc_id
         |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8),
         |k AS (SELECT count(*)::BIGINT AS n_near_kept FROM documents d
         |  WHERE d.doc_id::BIGINT NOT IN (SELECT doc_id FROM losers)),
         |t AS (SELECT count(*)::BIGINT AS n_docs,
         |    count(DISTINCT md5(text))::BIGINT AS n_exact_unique
         |  FROM documents HAVING count(*) > 0)
         |SELECT n_docs, n_exact_unique, n_near_kept,
         |  (round(CAST(n_exact_unique AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         |    + 0.0) AS exact_ratio,
         |  (round(CAST(n_near_kept AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         |    + 0.0) AS near_ratio
         |FROM t, k""".stripMargin,

    "dedup_cluster" ->
      s"""WITH RECURSIVE $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
         |pr AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8),
         |e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
         |reach(id, lbl) AS (
         |  SELECT doc_id::BIGINT, doc_id::BIGINT FROM documents
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id)
         |SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id""".stripMargin,

    "corpus_split_leakage" ->
      s"""WITH RECURSIVE $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
         |pr AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8),
         |e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
         |reach(id, lbl) AS (
         |  SELECT doc_id::BIGINT, doc_id::BIGINT FROM documents
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         |cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |bu AS (SELECT doc_id, cluster_id,
         |    (((cluster_id % $P) * 2654435761) % $P) % 10 AS bucket FROM cl)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bucket < 8 THEN 'train'
         |       WHEN bucket = 8 THEN 'valid'
         |       ELSE 'test' END AS split FROM bu""".stripMargin,

    // The incremental path must reproduce the full-graph clustering
    // exactly — its oracle IS the full-graph CC.
    "dedup_cluster_incremental" ->
      s"""WITH RECURSIVE $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
         |pr AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8),
         |e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
         |reach(id, lbl) AS (
         |  SELECT doc_id::BIGINT, doc_id::BIGINT FROM documents
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id)
         |SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id""".stripMargin,

    "graph_source_modularity" ->
      s"""WITH $lshPairsDuck,
         |sr AS (SELECT doc_id::BIGINT AS id, source FROM documents),
         |ee AS (SELECT pr.a, pr.b, x.source AS sa, y.source AS sb
         |  FROM pr JOIN sr x ON x.id = pr.a JOIN sr y ON y.id = pr.b),
         |tot AS (SELECT count(*)::BIGINT AS m FROM ee),
         |dg AS (SELECT source, count(*)::BIGINT AS dc FROM (
         |    SELECT sa AS source FROM ee
         |    UNION ALL SELECT sb AS source FROM ee) u GROUP BY 1),
         |wi AS (SELECT sa AS source, count(*)::BIGINT AS ec FROM ee
         |  WHERE sa = sb GROUP BY 1),
         |xr AS (SELECT source, count(*)::BIGINT AS xc FROM (
         |    SELECT sa AS source FROM ee WHERE sa <> sb
         |    UNION ALL SELECT sb AS source FROM ee WHERE sa <> sb) u
         |  GROUP BY 1)
         |SELECT dg.source, dg.dc AS degree_mass,
         |  coalesce(wi.ec, 0)::BIGINT AS e_within,
         |  coalesce(xr.xc, 0)::BIGINT AS e_cross,
         |  (round(coalesce(wi.ec, 0)::DOUBLE / tot.m::DOUBLE
         |    - (dg.dc::DOUBLE / (2.0 * tot.m::DOUBLE))
         |    * (dg.dc::DOUBLE / (2.0 * tot.m::DOUBLE)), 6) + 0.0)
         |    AS q_contrib
         |FROM dg LEFT JOIN wi ON wi.source = dg.source
         |LEFT JOIN xr ON xr.source = dg.source
         |CROSS JOIN tot""".stripMargin,

    "dedup_cluster_keep" ->
      s"""WITH RECURSIVE $docHashes,
         |df AS (SELECT * FROM ds WHERE len(sh) > 0),
         |dm AS (SELECT *, $mhD AS mh FROM df),
         |db AS (SELECT *, $bandsD AS mbands FROM dm),
         |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
         |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
         |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
         |pr AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
         |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8),
         |e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
         |reach(id, lbl) AS (
         |  SELECT doc_id::BIGINT, doc_id::BIGINT FROM documents
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         |cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |jm AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY d.n_chars DESC, cl.doc_id) AS rk,
         |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
         |  FROM cl JOIN documents d ON d.doc_id::BIGINT = cl.doc_id)
         |SELECT cluster_id, doc_id AS rep_doc_id, n_chars AS rep_n_chars,
         |  n_members FROM jm WHERE rk = 1""".stripMargin,

    "sketch_kmv" ->
      s"""WITH hashes AS (
         |  SELECT DISTINCT event_type, ((user_id % $P) * 2654435761) % $P AS h
         |  FROM events),
         |exact AS (SELECT event_type, count(*)::BIGINT AS n_exact
         |  FROM hashes GROUP BY 1),
         |ranked AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM hashes),
         |kth AS (SELECT event_type, h AS hk FROM ranked WHERE rn = 64)
         |SELECT e.event_type, e.n_exact,
         |  (round(CASE WHEN k.hk IS NOT NULL
         |    THEN 63.0 * ${P}.0 / k.hk::DOUBLE
         |    ELSE e.n_exact::DOUBLE END, 4) + 0.0) AS est_distinct
         |FROM exact e LEFT JOIN kth k ON e.event_type = k.event_type""".stripMargin,

    "dedup_cross_source" ->
      s"""WITH $lshPairsDuck,
         |csd AS (SELECT doc_id::BIGINT AS doc_id, source FROM documents),
         |cse AS (SELECT least(xa.source, xb.source) AS source_lo,
         |    greatest(xa.source, xb.source) AS source_hi
         |  FROM pr JOIN csd xa ON xa.doc_id = pr.a
         |  JOIN csd xb ON xb.doc_id = pr.b)
         |SELECT source_lo, source_hi, count(*)::BIGINT AS n_pairs,
         |  source_lo <> source_hi AS cross_source
         |FROM cse GROUP BY 1, 2""".stripMargin)
}
