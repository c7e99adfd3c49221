package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ExtCommon._

/** Query-time ANN graph search (r12 verdict task 1): the beam walk
  * HNSW/DiskANN-style retrieval actually executes per query at scale,
  * run over the NN-descent-refined kNN graph the suite already builds
  * ([[SimQueries]] `sim_nndescent`). The suite previously BUILT every
  * modern index (IVF/PQ/OPQ, LSH, kNN graph) but never SEARCHED the
  * graph — this is that missing retrieval operator, with its recall
  * twin against the exact ground truth.
  *
  * Walk semantics (fixed so the DuckDB oracle can mirror it move for
  * move): entry points = the members of the query's own IVF cell (the
  * probe-1 candidate set of `sim_ivf`, i.e. "IVF-centroid-nearest"
  * seeding — the SPANN/DiskANN-style cluster-then-graph hybrid); then
  * [[GraphHops]] rounds of {expand the beam over the UNDIRECTED edge
  * set, re-score candidates against the query exactly, keep
  * top-[[GraphBeam]] deterministically (sim DESC, node id)}; final
  * answer = top-3 of the last beam, self-matches excluded. Because
  * every round's candidates include the carried-over beam and scoring
  * is exact, any all-time top-3 node can never be trimmed (at most two
  * nodes outrank it, beam ≫ 3), so the final top-3 is the top-3 of
  * EVERYTHING the walk scored — recall is lower-bounded by probe-1's
  * and the hops add the graph's contribution on top.
  *
  * Scale shape: the adjacency is ≤ 2·3n id pairs (no payloads); each
  * hop's candidate set is ≤ beam·(maxdeg+1) per query, re-attached to
  * vectors by id-keyed joins. Per-query cost = one cell (~n/nlist ≈
  * √n, the same coarse stage every IVF probe pays) + hops·beam·deg
  * CONSTANT graph work — the walk converts IVF's recall knob
  * ("probe more cells", each ~√n candidates) into fixed-budget graph
  * traversal, which is the point of graph retrieval at 100 TB. */
object SimSearchQueries {

  /** Beam width and hop budget of the graph walk — shared by the Spark
    * builder and the interpolated oracle SQL. */
  private[queries] val GraphBeam = 8
  private[queries] val GraphHops = 2

  /** HNSW-style layer parameters (`sim_hnsw`), shared by the Spark
    * builder and the interpolated oracle SQL: 1-in-[[HnswLevelMod]] of
    * the corpus (vec_id ≡ 1) forms the sparse upper layer; its
    * navigable kNN graph (seed-bucket mates ∪ ring escapes, one
    * friend-of-friend round) keeps [[HnswM]] out-edges per node; the
    * upper-layer walk carries [[HnswL1Beam]] candidates for
    * [[HnswL1Hops]] rounds before dropping to [[HnswL0Hops]]
    * base-layer rounds at width [[GraphBeam]]. [[HnswSeedShift]]
    * coarsens the adaptive hyperplane signature for SEEDING only
    * (entry buckets 2^shift× larger than the ANN-join buckets), so
    * the query's entry bucket holds ~2^shift·64/LevelMod upper-layer
    * mates — non-empty at the gate SFs (which sit at the annBits
    * floor) and CONSTANT-sized at 100 TB by the same adaptive formula
    * that bounds the ANN buckets. */
  /** Binary-quantization search (`sim_bq_rerank`): sign-bit code width
    * (62, not d — DuckDB's BIGINT `<<` range-checks at 63) and the
    * Hamming prefilter pool reranked exactly per query. */
  private[queries] val BqBits = 62
  private[queries] val BqCand = 32

  /** Within-cell Hamming pool of the composed `sim_ivf_bq` stack —
    * smaller than [[BqCand]] because the coarse quantizer already cut
    * the corpus to ~n/nlist candidates. */
  private[queries] val BqCellCand = 16

  /** The sign-bit code over a `v` ARRAY<DOUBLE> column — ONE BIGINT;
    * shared by `sim_bq_rerank` and `sim_ivf_bq` on each engine. */
  private[queries] val bqCodeS: String =
    s"aggregate(sequence(1, least($BqBits, size(v))), " +
      "CAST(0 AS BIGINT), (a, i) -> a ^ IF(element_at(v, i) >= 0, " +
      "shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))"
  private[queries] val bqCodeD: String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |      list_transform(generate_series(1, least($BqBits, len(v))),
       |        i -> CASE WHEN v[i] >= 0 THEN (1::BIGINT << (i - 1))
       |          ELSE 0::BIGINT END)),
       |      (a, b) -> xor(a, b))""".stripMargin

  private[queries] val HnswLevelMod = 8
  private[queries] val HnswM = 3
  private[queries] val HnswL1Beam = 8
  private[queries] val HnswL1Hops = 2
  private[queries] val HnswL0Hops = 4
  private[queries] val HnswSeedShift = 5

  /** Post-filter pool width of `sim_filtered_search`: the unfiltered
    * top-K kept before the metadata predicate applies. */
  private[queries] val FilteredPostK = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_graph_search" -> ((s, dir) => graphSearch(s, dir, materialize = true)),

    // Binary-quantization rerank search (the RaBitQ/FAISS-BQ serving
    // posture): each vector compresses to a 62-dim sign-bit code in
    // ONE BIGINT; the first stage ranks the corpus by Hamming distance
    // (xor + popcount — ~8 bytes/vector of index I/O, the 64×-smaller
    // scan that makes brute-force candidate generation feasible at
    // 100 TB), the second stage re-scores only the top-[[BqCand]]
    // Hamming pool with exact cosine. The Hamming pass reuses the
    // block-partitioned equi-join shape of sim_topk (per-task work
    // (n/B)², shuffle B·n CODE rows — 2 longs wide, not d doubles);
    // the rerank touches [[BqCand]] full vectors per query via two
    // id-keyed hash joins. Ties at equal Hamming break by n_id —
    // deterministic, mirrored in the oracle.
    "sim_bq_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
        .withColumn("code", expr(bqCodeS))
        .localCheckpoint()
      val codes = e.select(col("vec_id"), col("code"))
      val q = codes.filter(col("vec_id") % TopkSplit === 0)
        .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = codes.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val cand = q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          expr("CAST(bit_count(x.code ^ y.code) AS BIGINT)").as("ham"))
        .withColumn("hrank", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY ham, n_id)"))
        .filter(col("hrank") <= BqCand)
        .select(col("q_id"), col("n_id"), col("ham"))
      cand
        .join(e.select(col("vec_id").as("n_id"), col("v").as("nv"),
          col("nrm").as("nn")), "n_id")
        .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn")), "q_id")
        .withColumn("sim",
          expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT)"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), col("rank"), col("ham"),
          Rounding.r6(col("sim")).as("sim"))
    }),

    // The composed serving stack — coarse quantizer, then binary
    // codes, then exact rerank (the FAISS "IVF + quantized scan +
    // refine" layout every production vector store ships): queries
    // probe their own IVF cell, the ~n/nlist cell members rank by
    // 62-bit Hamming (8 bytes/candidate of scan I/O), and only the
    // top-[[BqCellCand]] pool is re-scored exactly. Per-query cost =
    // one nlist-broadcast assignment + a √n-ish cell scan of CODES +
    // [[BqCellCand]] full-vector touches — each stage strictly
    // cheaper than the one it feeds, which is the whole point of the
    // composition at 100 TB. Equi-joins on cell and id throughout.
    "sim_ivf_bq" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val asg = assignCells(e, ivfInitCents(e))
        .withColumn("code", expr(bqCodeS))
        .localCheckpoint()
      val qs = asg.filter(col("vec_id") % IvfQuerySplit === 0)
        .select(col("vec_id").as("q_id"), col("cell"),
          col("code").as("qcode"), col("v").as("qv"), col("nrm").as("qn"))
      val cand = qs.select(col("q_id"), col("cell"), col("qcode"))
        .join(asg.select(col("vec_id").as("n_id"), col("cell"),
          col("code")), "cell")
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("ham", expr("CAST(bit_count(qcode ^ code) AS BIGINT)"))
        .withColumn("hrank", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY ham, n_id)"))
        .filter(col("hrank") <= BqCellCand)
        .select(col("q_id"), col("n_id"), col("ham"))
      cand
        .join(asg.select(col("vec_id").as("n_id"), col("v").as("nv"),
          col("nrm").as("nn")), "n_id")
        .join(qs.select(col("q_id"), col("qv"), col("qn")), "q_id")
        .withColumn("sim",
          expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), col("rank"), col("ham"),
          Rounding.r6(col("sim")).as("sim"))
    }),

    // Recall@3 of the composed stack vs the exact ground truth on the
    // shared % 50 split — read against sim_ivf_recall's probe1 row:
    // the additional loss 1-bit codes cost INSIDE the cell, priced
    // next to the scan bytes they save.
    "sim_ivf_bq_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_ivf_bq", s, dir)(queries("sim_ivf_bq")(s, dir))
        .filter(col("q_id") % TopkSplit === 0)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // Recall@3 of the binary-code rerank vs the exact ground truth on
    // the shared q_id % 10 split — read next to sim_recall (LSH) and
    // sim_graph_search_recall: what 1 bit/dim keeps of the ranking.
    "sim_bq_rerank_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_bq_rerank", s, dir)(queries("sim_bq_rerank")(s, dir))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // HNSW-style hierarchical search (Malkov & Yashunin, TPAMI'18
    // posture, two layers): entry by coarse-LSH bucket into a sparse
    // upper layer, greedy beam refinement over the upper layer's kNN
    // graph, then the standard base-layer beam walk over the
    // NN-descent graph. The structural difference from
    // `sim_graph_search`: NO coarse quantizer at query time — where
    // the IVF-seeded walk pays a ~n/nlist ≈ √n cell scan per query,
    // this pays |seed bucket| + hops·beam·deg, ALL constant-bounded by
    // the adaptive signature formula — the per-query cost profile
    // hierarchical graph retrieval exists to deliver at 100 TB.
    "sim_hnsw" -> ((s, dir) => hnswSearch(s, dir, materialize = true)),

    // Recall@3 vs the exact ground truth on the shared q_id % 10
    // split — read next to sim_graph_search_recall: the price of
    // dropping the IVF coarse stage, measured.
    "sim_hnsw_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_hnsw", s, dir)(queries("sim_hnsw")(s, dir))
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // Incremental IVF maintenance (r12 verdict task 7): the
    // daily-crawl append path — an 80% "base" corpus (vec_id % 5 ≠ 4)
    // trains the one-Lloyd coarse quantizer; the 20% "delta" arrives
    // later and is assigned to the FROZEN centroids (no retrain, no
    // base re-scan — the Spark plan unions the stored base assignment
    // with a delta-only broadcast pass); cells whose merged occupancy
    // crosses 2× the mean are re-SPLIT by one deterministic hyperplane
    // bit keyed on the cell id (the same mod-23 weight family as
    // [[ExtCommon.annBits]]'s planes), so a hot cell's candidate list
    // halves without touching any other cell. Queries (the
    // % IvfQuerySplit split) probe their own post-split cell key.
    // Output: the ANN result shape of sim_ivf_kmeans; the recall twin
    // below is read against sim_ivf_kmeans_recall — "within noise of
    // the full retrain" is the acceptance bar for a delta-merge path.
    "sim_ivf_incremental" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val base = e.filter(col("vec_id") % 5 =!= 4)
      val delta = e.filter(col("vec_id") % 5 === 4)
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      // Frozen quantizer + the at-rest base assignment (built once).
      val (cents, baseAsg) = ivfKmeansIndex(base)
      // Delta merge: ONLY the delta rides the broadcast assignment.
      val merged = baseAsg.unionByName(assignCells(delta, cents))
        .localCheckpoint()
      // Cells crossing 2× the mean occupancy split on one
      // cell-id-keyed hyperplane bit; everyone else keeps key cell·2.
      val occ = merged.groupBy("cell").agg(count(lit(1)).as("cn"))
      val tot = occ.agg(sum(col("cn")).as("nv"),
        count(lit(1)).as("ncells"))
      val big = occ.crossJoin(broadcast(tot))
        .filter(col("cn") * col("ncells") > col("nv") * 2)
        .select(col("cell"), lit(1L).as("split"))
      val sbit = "IF(aggregate(transform(sequence(1, size(v)), d -> " +
        "element_at(v, d) * CAST(((cell * 131 + (d - 1) * 31) % 23) " +
        "- 11 AS DOUBLE)), 0D, (a, x) -> a + x) >= 0D, 1L, 0L)"
      val keyed = merged.join(broadcast(big), Seq("cell"), "left")
        .withColumn("ck", when(col("split").isNotNull,
          col("cell") * 2 + expr(sbit)).otherwise(col("cell") * 2))
        .select(col("vec_id"), col("v"), col("nrm"), col("ck"))
        .localCheckpoint()
      val qs = keyed.filter(col("vec_id") % IvfQuerySplit === 0)
      qs.as("x").join(keyed.as("y"),
          col("x.ck") === col("y.ck") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim",
          expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // Recall@3 of the delta-merged index vs the SAME exact ground
    // truth and query split as sim_ivf_kmeans_recall — the pair of
    // rows that turns "append without retrain costs nothing" into a
    // measured number at every gate SF.
    "sim_ivf_incremental_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_ivf_incremental", s, dir)(queries("sim_ivf_incremental")(s, dir))
        .filter(col("q_id") % TopkSplit === 0)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // Recall@3 of the graph walk vs the exact ground truth on the
    // shared q_id % 10 split — read next to sim_recall (LSH),
    // sim_ivf_recall (probe1/probe2), and sim_nndescent_recall (the
    // graph's own edge recall) for the full index-quality ladder.
    "sim_graph_search_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_graph_search", s, dir)(queries("sim_graph_search")(s, dir))
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // Filtered ANN search (r13 verdict task 4): the "vector +
    // metadata predicate" query every production vector store serves.
    // Predicate = label equality (embeddings.label; per-query
    // selectivity ≈ 1/|labels|, varied across labels). Two strategies
    // over the SAME trained-IVF probe-1 candidate set, tagged `mode`:
    //  - 'pre'  — the predicate cuts the cell candidates BEFORE the
    //    rank window (filter pushed inside the index scan; the top-3
    //    ranks over every matching cell member — never starves);
    //  - 'post' — rank the unfiltered cell, keep
    //    top-[[FilteredPostK]], THEN apply the predicate (the naive
    //    compose-with-WHERE plan: at selectivity s it keeps ~s·K
    //    matches — the starvation the recall twin prices).
    // Scale shape: identical to sim_ivf_kmeans — one broadcast
    // assignment pass, cell equi-join, per-query cost ~|cell|. 'pre'
    // is strictly cheaper (the predicate prunes before ranking).
    "sim_filtered_search" -> ((s, dir) => {
      val lbl = emb(s, dir).select(col("vec_id").cast("long").as("vec_id"),
        col("label").cast("long").as("label"))
      val a = ivfKmeansAssigned(s, dir).join(lbl, "vec_id").localCheckpoint()
      val qs = a.filter(col("vec_id") % IvfQuerySplit === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"), col("label").as("qlbl"))
      val base = qs.join(
          a.select(col("vec_id").as("n_id"), col("v").as("nv"),
            col("nrm").as("nn"), col("cell"), col("label").as("nlbl")),
          Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)"))
      val pre = base.filter(col("qlbl") === col("nlbl"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(lit("pre").as("mode"), col("q_id"), col("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
      val post = base
        .withColumn("r0", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)"))
        .filter(col("r0") <= FilteredPostK && col("qlbl") === col("nlbl"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(lit("post").as("mode"), col("q_id"), col("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
      pre.unionByName(post)
    }),

    // Recall-vs-selectivity of filtered search. The exact filtered
    // ground truth is the top-3 SAME-LABEL neighbors per query —
    // label equality makes the exact all-pairs an equi-join ON THE
    // LABEL (per-task pairs ~n²/|labels|, the measurement analogue of
    // sim_topk's block join, keyed by a real column). One row per
    // (mode, label): micro-averaged recall@3 beside the label's
    // corpus selectivity — the receipt that 'pre' holds recall while
    // 'post' starves as selectivity drops.
    "sim_filtered_recall" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"),
          col("label").cast("long").as("label"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val qx = e.filter(col("vec_id") % IvfQuerySplit === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("label"))
      val truth = qx.join(
          e.select(col("vec_id").as("n_id"), col("v").as("nv"),
            col("nrm").as("nn"), col("label")),
          Seq("label"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)"))
        .withColumn("rank", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)"))
        .filter(col("rank") <= 3)
        .select(col("label"), col("q_id"), col("n_id"))
        .localCheckpoint()
      val ann = ExtCommon.cachedAnn("sim_filtered_search", s, dir)(queries("sim_filtered_search")(s, dir))
        .select(col("mode"), col("q_id"), col("n_id"), lit(1L).as("hit"))
      val perQ = Seq("pre", "post").map { m =>
        truth.join(ann.filter(col("mode") === m).drop("mode"),
            Seq("q_id", "n_id"), "left")
          .groupBy(col("label"), col("q_id"))
          .agg(count(lit(1)).as("k"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .select(lit(m).as("mode"), col("label"), col("k"), col("n_hits"))
      }.reduce(_ unionByName _)
      val cnt = e.groupBy("label").agg(count(lit(1)).as("n_lbl"))
      val tot = e.groupBy(lit(true).as("_g"))
        .agg(count(lit(1)).as("n_all")).select(col("n_all"))
      perQ.groupBy("mode", "label")
        .agg(count(lit(1)).as("n_q"),
          sum(col("n_hits")).as("hits"), sum(col("k")).as("ks"))
        .join(cnt, Seq("label"))
        .crossJoin(broadcast(tot))
        .select(col("mode"), col("label"), col("n_q"),
          Rounding.r6(expr("CAST(n_lbl AS DOUBLE) / CAST(n_all AS DOUBLE)"))
            .as("selectivity"),
          Rounding.r6(expr("CAST(hits AS DOUBLE) / CAST(ks AS DOUBLE)"))
            .as("recall"))
    }),

    // Index persistence + serving (r13 verdict task 5): the trained
    // IVF index leaves the session — assignments land AT REST as a
    // cell-partitioned parquet layout (Hive `cell=N/` directories; a
    // serving read of one probed cell lists ONE directory — the same
    // lakehouse pruning `layout_prune_compare` prices) plus the
    // ≤nlist centroid table; the search then runs ENTIRELY from the
    // at-rest copy (ids only — vector payloads re-attach from the
    // corpus by an id-keyed equi-join, the "index stores ids" serving
    // layout). Answers are pinned byte-identical to the in-memory
    // sim_ivf_kmeans (OpsSpec2 round-trip) — build once, serve any
    // number of sessions without re-training.
    "sim_ivf_served" -> ((s, dir) => {
      val (cents, assigned) = ivfKmeansIndex(emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v")))
      val idx = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_ivf_index_" + dir.replaceAll("[^A-Za-z0-9._-]", "_")).getPath
      val toWrite = assigned.select(col("vec_id"), col("cell"))
      toWrite.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$idx/assign")
      cents.write.mode("overwrite").parquet(s"$idx/centroids")
      // explicit schema: an empty corpus writes no cell=* directory,
      // and schema-less parquet reads of it cannot infer one
      val atRest = s.read.schema(toWrite.schema).parquet(s"$idx/assign")
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val served = atRest.join(e, "vec_id")
      val qs = served.filter(col("vec_id") % IvfQuerySplit === 0)
        .select(col("vec_id").as("q_id"), col("cell"),
          col("v").as("qv"), col("nrm").as("qn"))
      qs.join(served.select(col("vec_id").as("n_id"), col("cell"),
          col("v").as("nv"), col("nrm").as("nn")), Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), col("rank"),
          Rounding.r6(col("sim")).as("sim"))
    }),

    // Tombstoned serving — the DELETE path beside r13's incremental
    // ADD (`sim_ivf_incremental`): 10% of the corpus (vec_id % 10 = 3)
    // is deleted AFTER the trained-IVF index was built. Centroids and
    // assignments stay FROZEN (no retrain, no base re-scan); the
    // tombstone mask applies at serve time on both the query and the
    // candidate side — exactly how production vector stores take
    // deletes (a filter against the at-rest index until the next
    // compaction). The recall twin below reads against
    // sim_ivf_kmeans_recall: deletion must cost nothing beyond the
    // corpus shrinkage itself.
    "sim_ivf_deleted" -> ((s, dir) => {
      val live = ivfKmeansAssigned(s, dir)
        .filter(col("vec_id") % 10 =!= 3)
        .localCheckpoint()
      val qs = live.filter(col("vec_id") % IvfQuerySplit === 0)
      qs.as("x").join(live.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // Recall@3 of tombstoned serving vs the exact ground truth over
    // the LIVE corpus (the truth itself must exclude tombstones — a
    // deleted vector is not a valid answer). Exact truth rides
    // sim_topk's block-partitioned pair join over the masked corpus.
    "sim_ivf_deleted_recall" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
        .filter(col("vec_id") % 10 =!= 3)
      val q = e.filter(col("vec_id") % IvfQuerySplit === 0)
        .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val truth = q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim",
          expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"))
      val ann = ExtCommon.cachedAnn("sim_ivf_deleted", s, dir)(queries("sim_ivf_deleted")(s, dir))
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      truth.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // One evaluation table for the ANN serving ladder — NDCG@3 and
    // MRR (the ranking-quality metrics recall@k cannot see: WHERE in
    // the top-3 the true neighbors land) for the three cheap serving
    // faces — trained-IVF probe-1, BQ Hamming-rerank, and the
    // composed IVF→BQ stack — against the exact ground truth on the
    // shared q_id % HybridSplit split. Binary-relevance gain weights
    // 1/log2(rank+1) enter as PRE-QUANTIZED micro constants
    // (1000000/630930/500000) so no transcendental ever crosses an
    // engine; per-query NDCG/MRR quantize to micro-longs before the
    // cross-query mean (the suite's exact-summation rule).
    "sim_search_ndcg" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % HybridSplit === 0)
        .select(col("q_id"), col("n_id"))
        .localCheckpoint()
      val idcg = exact.groupBy("q_id").agg(count(lit(1)).as("nrel"))
        .withColumn("idcg_micro", expr("CASE nrel WHEN 1 THEN 1000000L " +
          "WHEN 2 THEN 1630930L ELSE 2130930L END"))
      def evalFam(name: String, ann: DataFrame): DataFrame = {
        val hits = ann
          .filter(col("q_id") % HybridSplit === 0 && col("rank") <= 3)
          .select(col("q_id"), col("n_id"), col("rank"))
          .join(exact, Seq("q_id", "n_id"))
          .groupBy("q_id")
          .agg(sum(expr("CASE rank WHEN 1 THEN 1000000L WHEN 2 THEN " +
            "630930L ELSE 500000L END")).as("dcg_micro"),
            min(col("rank")).as("first_hit"))
        idcg.join(hits, Seq("q_id"), "left")
          .select(lit(name).as("family"),
            expr("CAST(round(CAST(coalesce(dcg_micro, 0L) AS DOUBLE)" +
              " / CAST(idcg_micro AS DOUBLE) * 1000000.0) AS BIGINT)")
              .as("ndcg_micro"),
            expr("CASE coalesce(first_hit, 0L) WHEN 1 THEN 1000000L " +
              "WHEN 2 THEN 500000L WHEN 3 THEN 333333L ELSE 0L END")
              .as("mrr_micro"))
      }
      Seq(
        "ivf" -> ExtCommon.cachedAnn("sim_ivf_kmeans", s, dir)(
          SimQueries.queries("sim_ivf_kmeans")(s, dir)),
        "bq" -> ExtCommon.cachedAnn("sim_bq_rerank", s, dir)(
          queries("sim_bq_rerank")(s, dir)),
        "ivf_bq" -> ExtCommon.cachedAnn("sim_ivf_bq", s, dir)(
          queries("sim_ivf_bq")(s, dir)))
        .map { case (n, df) => evalFam(n, df) }
        .reduce(_ unionByName _)
        .groupBy("family")
        .agg(count(lit(1)).as("n_q"),
          Rounding.r6(expr("CAST(sum(ndcg_micro) AS DOUBLE)" +
            " / CAST(count(1) AS DOUBLE) / 1000000.0")).as("ndcg3"),
          Rounding.r6(expr("CAST(sum(mrr_micro) AS DOUBLE)" +
            " / CAST(count(1) AS DOUBLE) / 1000000.0")).as("mrr"))
    }),

    // Matryoshka-style truncation recall: how much of the exact
    // top-3 ranking survives keeping only the first half / quarter
    // of every embedding's dimensions — the MRL serving question
    // (truncated vectors mean proportionally smaller index scans and
    // memory residency at 100 TB; this prices the ranking loss that
    // buys). The exact truncated top-3 per query rides sim_topk's
    // block-partitioned pair join verbatim (per-task pairs (n/B)²,
    // shuffled-hash, never a nested loop); truncation is a zero-copy
    // slice() on the array column inside the scan task.
    "sim_mrl_recall" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"))
        .localCheckpoint()
      def lvl(name: String, kExpr: String): DataFrame = {
        val t = e.select(col("vec_id"),
          expr(s"slice(v, 1, $kExpr)").as("tv"))
          .withColumn("tn", expr(s"sqrt(${dotS("tv", "tv")})"))
        val q = t.filter(col("vec_id") % TopkSplit === 0)
          .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
          .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
        val y = t.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
          .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
        val ann = q.as("x").hint("shuffle_hash")
          .join(y.as("y").hint("shuffle_hash"),
            col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
              col("x.vec_id") =!= col("y.vec_id"))
          .withColumn("sim",
            expr(s"try_divide(${dotS("x.tv", "y.tv")}, x.tn * y.tn)"))
          .withColumn("rank", expr(
            "row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id)"))
          .filter(col("rank") <= 3)
          .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
            lit(1L).as("hit"))
        exact.join(ann, Seq("q_id", "n_id"), "left")
          .select(lit(name).as("level"),
            coalesce(col("hit"), lit(0L)).as("hit"))
      }
      lvl("half", "(size(v) + 1) DIV 2")
        .unionByName(lvl("quarter", "(size(v) + 3) DIV 4"))
        .groupBy("level")
        .agg(count(lit(1)).as("n_truth"), sum(col("hit")).as("n_hits"))
        .select(col("level"), col("n_truth"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE)"))
            .as("recall"))
    }))

  /** The walk itself. `materialize = true` localCheckpoints the
    * adjacency/assignment tables and each beam round (the production
    * shape — every hop re-reads the prior beam twice, and the
    * nndescent chain must never re-run); PlanSpec passes `false` to
    * audit the WHOLE un-truncated walk as one physical plan. */
  private[graft] def graphSearch(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e0 = emb(s, dir)
    val e = cp(e0
      .select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})")))
    // Undirected adjacency from the refined kNN graph — id pairs
    // only, checkpointed once, probed by every hop.
    val knn = SimQueries.queries("sim_nndescent")(s, dir)
      .select(col("q_id").as("a"), col("n_id").as("b"))
    val und = cp(knn
      .union(knn.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    val qs = cp(e.filter(col("vec_id") % TopkSplit === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")))
    // Entry points: every member of the query's own coarse-quantizer
    // cell (the sim_ivf probe-1 candidate set) — an equi-join on the
    // cell id over the id+cell assignment, no vector payloads.
    val assigned = cp(assignCells(e, ivfInitCents(e))
      .select(col("vec_id").as("node"), col("cell")))
    val entries = assigned.filter(col("node") % TopkSplit === 0)
      .select(col("node").as("q_id"), col("cell"))
      .join(assigned, "cell")
      .select(col("q_id"), col("node"))
    // Re-attach vectors by id and score a candidate set against its
    // query; candidates per query are beam·(deg+1)-bounded after the
    // entry round, so the array fan-out through the q_id join is a
    // constant per query.
    def score(cand: DataFrame): DataFrame = cand
      .join(e.select(col("vec_id").as("node"), col("v").as("nv"),
        col("nrm").as("nn")), "node")
      .join(qs, "q_id")
      .select(col("q_id"), col("node"),
        expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)").as("sim"))
    def trim(scored: DataFrame): DataFrame = scored
      .withColumn("brank", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, node)"))
      .filter(col("brank") <= GraphBeam)
      .select(col("q_id"), col("node"), col("sim"))
    var beam = cp(trim(score(entries)))
    for (_ <- 1 to GraphHops) {
      val cand = beam.select(col("q_id"), col("node"))
        .join(und, col("node") === col("a"))
        .select(col("q_id"), col("b").as("node"))
        .union(beam.select(col("q_id"), col("node")))
        .distinct()
      beam = cp(trim(score(cand)))
    }
    beam.filter(col("node") =!= col("q_id"))
      .withColumn("rank", expr(
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, node) AS BIGINT)"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("node").as("n_id"), col("rank"),
        Rounding.r6(col("sim")).as("sim"))
  }

  /** The two-layer HNSW-style walk. Same materialize contract as
    * [[graphSearch]]. Layer 1 = the vec_id ≡ 1 (mod [[HnswLevelMod]])
    * subsample with a within-seed-bucket top-[[HnswM]] kNN graph;
    * layer 0 = the NN-descent graph. Entry = the query's seed-bucket
    * mates on layer 1 (a query whose seed bucket holds no layer-1 node
    * emits nothing — mirrored exactly by the oracle, and scored as
    * zero recall by the twin). Every round re-scores exactly and trims
    * deterministically (sim DESC, node), so the final top-3 is the
    * top-3 of everything the walk scored. */
  private[graft] def hnswSearch(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e0 = emb(s, dir)
    val seedBits = math.max(1, annBits(e0) - HnswSeedShift)
    val e = cp(e0
      .select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      .withColumn("sig", expr(sigS(seedBits))))
    // Upper layer + a NAVIGABLE kNN graph over it. Within-bucket
    // edges alone would trap the layer-1 walk inside the entry bucket
    // (neighbors of a bucket member are bucket members — the same
    // fixed-point the NN-descent init documents), so the init is
    // bucket mates (rank-band-capped, the NndInitCap hot-bucket
    // guard) ∪ 3 deterministic ring escapes per node drawn in layer-1
    // INDEX space (dense-corpus-id assumption, as in sim_nndescent:
    // layer-1 ids are exactly {LevelMod·k + 1}), then ONE
    // friend-of-friend refinement round — small-world edges the
    // cross-bucket walk can actually traverse.
    val P = graft.ext.TextOps.P
    val n = math.max(1L, e.count())
    val mL1 = if (n < 2) 0L else (n - 2) / HnswLevelMod + 1
    val l1 = cp(e.filter(col("vec_id") % HnswLevelMod === 1)
      .withColumn("rn", expr(
        "CAST(row_number() OVER (PARTITION BY sig ORDER BY vec_id) AS BIGINT)")))
    val l1bp = l1.as("x").join(l1.as("y"),
        col("x.sig") === col("y.sig") && col("x.vec_id") =!= col("y.vec_id") &&
          abs(col("x.rn") - col("y.rn")) <= NndInitCap)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
    val l1ring = l1.select(col("vec_id").as("a"))
      .select(col("a"), explode(expr(
        s"transform(sequence(1, 3), j -> $HnswLevelMod * " +
          s"((((a DIV $HnswLevelMod) % $P) * (2*j + 1) + j * 7919 + 1) " +
          s"% $P % ${math.max(1L, mL1)}L) + 1)")).as("b"))
      .filter(col("a") =!= col("b"))
    def topM(cand: DataFrame): DataFrame = cand
      .join(e.select(col("vec_id").as("a"), col("v").as("va"),
        col("nrm").as("na")), "a")
      .join(e.select(col("vec_id").as("b"), col("v").as("vb"),
        col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        expr(s"try_divide(${dotS("va", "vb")}, na * nb)").as("sim"))
      .withColumn("r", expr(
        "row_number() OVER (PARTITION BY a ORDER BY sim DESC, b)"))
      .filter(col("r") <= HnswM)
      .select(col("a"), col("b"))
    val l1init = cp(topM(l1bp.union(l1ring).distinct()))
    val l1u0 = l1init
      .union(l1init.select(col("b").as("a"), col("a").as("b")))
    val l1fof = l1u0.as("p").join(l1u0.as("q"), col("p.b") === col("q.a"))
      .select(col("p.a").as("a"), col("q.b").as("b"))
      .filter(col("a") =!= col("b"))
      .union(l1init)
      .distinct()
    val l1g = cp(topM(l1fof))
    val l1und = cp(l1g
      .union(l1g.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    val qs = cp(e.filter(col("vec_id") % TopkSplit === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("sig").as("qsig")))
    def score(cand: DataFrame): DataFrame = cand
      .join(e.select(col("vec_id").as("node"), col("v").as("nv"),
        col("nrm").as("nn")), "node")
      .join(qs.select(col("q_id"), col("qv"), col("qn")), "q_id")
      .select(col("q_id"), col("node"),
        expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)").as("sim"))
    def trim(scored: DataFrame, width: Int): DataFrame = scored
      .withColumn("brank", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, node)"))
      .filter(col("brank") <= width)
      .select(col("q_id"), col("node"), col("sim"))
    // Entry: the query's seed-bucket mates on the upper layer.
    val entries = qs.select(col("q_id"), col("qsig"))
      .join(l1.select(col("vec_id").as("node"), col("sig").as("qsig")),
        "qsig")
      .select(col("q_id"), col("node"))
    var b1 = cp(trim(score(entries), HnswL1Beam))
    for (_ <- 1 to HnswL1Hops) {
      val cand = b1.select(col("q_id"), col("node"))
        .join(l1und, col("node") === col("a"))
        .select(col("q_id"), col("b").as("node"))
        .union(b1.select(col("q_id"), col("node")))
        .distinct()
      b1 = cp(trim(score(cand), HnswL1Beam))
    }
    // Drop to the base layer: the NN-descent undirected graph, walked
    // exactly like sim_graph_search but seeded by the layer-1 beam.
    val knn = SimQueries.queries("sim_nndescent")(s, dir)
      .select(col("q_id").as("a"), col("n_id").as("b"))
    val und = cp(knn
      .union(knn.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    var beam = b1
    for (_ <- 1 to HnswL0Hops) {
      val cand = beam.select(col("q_id"), col("node"))
        .join(und, col("node") === col("a"))
        .select(col("q_id"), col("b").as("node"))
        .union(beam.select(col("q_id"), col("node")))
        .distinct()
      beam = cp(trim(score(cand), GraphBeam))
    }
    beam.filter(col("node") =!= col("q_id"))
      .withColumn("rank", expr(
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, node) AS BIGINT)"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("node").as("n_id"), col("rank"),
        Rounding.r6(col("sim")).as("sim"))
  }

  /** Oracle chain: the NN-descent graph ([[SimQueries.nndescentChainDuck]]
    * ending in k2), the probe-1 cell entry set, then the beam walk
    * unrolled hop by hop — each hop a {expand, score, rank, trim} CTE
    * block mirroring the Spark rounds move for move — ending in
    * `gfin(q_id, n_id, rank, sim)`. */
  private val graphSearchChainDuck: String = {
    def hop(r: Int): String =
      s"""gc$r AS (SELECT p.q_id, u.b AS node FROM b${r - 1} p
         |    JOIN und u ON u.a = p.node
         |  UNION SELECT q_id, node FROM b${r - 1}),
         |gs$r AS (SELECT c.q_id, c.node,
         |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
         |  FROM gc$r c JOIN en e ON e.vec_id = c.node
         |  JOIN gq q ON q.q_id = c.q_id),
         |b$r AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM gs$r)
         |  WHERE brank <= $GraphBeam)""".stripMargin
    s"""${SimQueries.nndescentChainDuck},
       |und AS (SELECT a, b FROM k2 UNION SELECT b AS a, a AS b FROM k2),
       |gq AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM en
       |  WHERE vec_id % $TopkSplit = 0),
       |gcn AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en
       |  WHERE vec_id < $ivfNlistD),
       |gas0 AS (SELECT e.vec_id, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN gcn c),
       |gasg AS (SELECT vec_id AS node, c_id AS cell FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, c_id) AS crank FROM gas0)
       |  WHERE crank = 1),
       |ge AS (SELECT q.node AS q_id, y.node FROM gasg q
       |  JOIN gasg y ON q.cell = y.cell
       |  WHERE q.node % $TopkSplit = 0),
       |gs0 AS (SELECT g.q_id, g.node,
       |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
       |  FROM ge g JOIN en e ON e.vec_id = g.node
       |  JOIN gq q ON q.q_id = g.q_id),
       |b0 AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM gs0)
       |  WHERE brank <= $GraphBeam),
       |${(1 to GraphHops).map(hop).mkString(",\n")},
       |gfin AS (SELECT q_id, node AS n_id, rank, sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, node)::BIGINT AS rank
       |    FROM b$GraphHops WHERE node <> q_id)
       |  WHERE rank <= 3)""".stripMargin
  }

  /** Oracle chain for `sim_hnsw`: the NN-descent graph (k2) for the
    * base layer, the coarse-seed-signature upper layer and its
    * within-bucket top-[[HnswM]] kNN graph, the seed-bucket entry set,
    * then the two walks unrolled round by round — [[HnswL1Hops]]
    * upper-layer rounds at width [[HnswL1Beam]], [[GraphHops]]
    * base-layer rounds at width [[GraphBeam]] — each a {expand, score,
    * rank, trim} CTE block mirroring Spark move for move, ending in
    * `hfin(q_id, n_id, rank, sim)`. */
  private val hnswChainDuck: String = {
    val seedBitsD = s"greatest(1, ($annBitsD) - $HnswSeedShift)"
    def l1hop(r: Int): String =
      s"""hc$r AS (SELECT p.q_id, u.b AS node FROM hb${r - 1} p
         |    JOIN hlu u ON u.a = p.node
         |  UNION SELECT q_id, node FROM hb${r - 1}),
         |hx$r AS (SELECT c.q_id, c.node,
         |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
         |  FROM hc$r c JOIN hme e ON e.vec_id = c.node
         |  JOIN hq q ON q.q_id = c.q_id),
         |hb$r AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM hx$r)
         |  WHERE brank <= $HnswL1Beam)""".stripMargin
    def l0hop(r: Int): String = {
      val prev = if (r == 1) s"hb$HnswL1Hops" else s"hg${r - 1}"
      s"""hgc$r AS (SELECT p.q_id, u.b AS node FROM $prev p
         |    JOIN hund u ON u.a = p.node
         |  UNION SELECT q_id, node FROM $prev),
         |hgx$r AS (SELECT c.q_id, c.node,
         |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
         |  FROM hgc$r c JOIN hme e ON e.vec_id = c.node
         |  JOIN hq q ON q.q_id = c.q_id),
         |hg$r AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM hgx$r)
         |  WHERE brank <= $GraphBeam)""".stripMargin
    }
    s"""${SimQueries.nndescentChainDuck},
       |hund AS MATERIALIZED (SELECT a, b FROM k2
       |  UNION SELECT b AS a, a AS b FROM k2),
       |hme AS MATERIALIZED (SELECT vec_id, v, nrm FROM en),
       |hes AS MATERIALIZED (SELECT *, ${sigD(seedBitsD)} AS sig FROM hme),
       |hl1 AS MATERIALIZED (SELECT *, row_number() OVER (
       |    PARTITION BY sig ORDER BY vec_id)::BIGINT AS rn
       |  FROM hes WHERE vec_id % $HnswLevelMod = 1),
       |hm AS (SELECT greatest(1, CASE WHEN count(*) < 2 THEN 0
       |    ELSE (count(*) - 2) // $HnswLevelMod + 1 END) AS m
       |  FROM embeddings),
       |hbp AS (SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM hl1 x JOIN hl1 y ON x.sig = y.sig AND x.vec_id <> y.vec_id
       |    AND abs(x.rn - y.rn) <= $NndInitCap),
       |hrp AS (SELECT a, b FROM (
       |    SELECT vec_id AS a, $HnswLevelMod * ((((vec_id // $HnswLevelMod)
       |        % ${graft.ext.TextOps.P}) * (2*j + 1) + j * 7919 + 1)
       |      % ${graft.ext.TextOps.P} % (SELECT m FROM hm)) + 1 AS b
       |    FROM hl1, unnest(generate_series(1, 3)) AS u(j))
       |  WHERE a <> b),
       |hc0g AS (SELECT a, b FROM hbp UNION SELECT a, b FROM hrp),
       |hs0g AS (SELECT c.a, c.b,
       |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
       |  FROM hc0g c JOIN hme x ON x.vec_id = c.a
       |  JOIN hme y ON y.vec_id = c.b),
       |hk0g AS (SELECT a, b FROM (SELECT *, row_number() OVER (
       |    PARTITION BY a ORDER BY sim DESC, b) AS r FROM hs0g)
       |  WHERE r <= $HnswM),
       |hu0g AS (SELECT a, b FROM hk0g UNION SELECT b AS a, a AS b FROM hk0g),
       |hcfg AS (SELECT DISTINCT p.a, q.b FROM hu0g p
       |    JOIN hu0g q ON p.b = q.a WHERE p.a <> q.b
       |  UNION SELECT a, b FROM hk0g),
       |hsfg AS (SELECT c.a, c.b,
       |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
       |  FROM hcfg c JOIN hme x ON x.vec_id = c.a
       |  JOIN hme y ON y.vec_id = c.b),
       |hkg AS (SELECT a, b FROM (SELECT *, row_number() OVER (
       |    PARTITION BY a ORDER BY sim DESC, b) AS r FROM hsfg)
       |  WHERE r <= $HnswM),
       |hlu AS (SELECT a, b FROM hkg UNION SELECT b AS a, a AS b FROM hkg),
       |hq AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv, nrm AS qn, sig
       |  FROM hes WHERE vec_id % $TopkSplit = 0),
       |hen AS (SELECT q.q_id, y.vec_id AS node FROM hq q
       |  JOIN hl1 y ON q.sig = y.sig),
       |hx0 AS (SELECT c.q_id, c.node,
       |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
       |  FROM hen c JOIN hme e ON e.vec_id = c.node
       |  JOIN hq q ON q.q_id = c.q_id),
       |hb0 AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM hx0)
       |  WHERE brank <= $HnswL1Beam),
       |${(1 to HnswL1Hops).map(l1hop).mkString(",\n")},
       |${(1 to HnswL0Hops).map(l0hop).mkString(",\n")},
       |hfin AS (SELECT q_id, node AS n_id, rank, sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, node)::BIGINT AS rank
       |    FROM hg$HnswL0Hops WHERE node <> q_id)
       |  WHERE rank <= 3)""".stripMargin
  }

  /** Oracle chain for the delta-merged IVF index: base-trained frozen
    * centroids (the [[ExtCommon.ivfKmeansCentsDuck]] shape restricted
    * to the vec_id % 5 ≠ 4 base, nlist from the BASE count), merged
    * frozen-centroid assignment, 2×-mean occupancy split with the
    * cell-id-keyed hyperplane bit, post-split cell keys — ending in
    * `ikey(vec_id, v, nrm, ck)`. */
  private val ivfIncrementalChainDuck: String = {
    val sbitD = "CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, " +
      "list_transform(generate_series(1, len(a.v)), d -> a.v[d] * " +
      "(((a.cell * 131 + (d - 1) * 31) % 23) - 11)::DOUBLE)), " +
      "(x, y) -> x + y) >= 0 THEN 1 ELSE 0 END"
    s"""ib AS (SELECT * FROM en WHERE vec_id % 5 <> 4),
       |inl AS (SELECT least(4096, greatest(16, CAST(power(2,
       |    ceil(log2(greatest(1, floor(sqrt(count(*))))))) AS BIGINT)))
       |    AS nl FROM ib),
       |ic0 AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm
       |  FROM ib, inl WHERE vec_id < nl),
       |itr AS (SELECT * FROM ib WHERE vec_id % 4 = 0),
       |it0 AS (SELECT t.vec_id, t.v, c.c_id,
       |    ${dotD("t.v", "c.cv")} / (t.nrm * c.cnrm) AS csim
       |  FROM itr t CROSS JOIN ic0 c),
       |it1 AS (SELECT c_id AS cell, v FROM (SELECT *, row_number()
       |    OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank
       |  FROM it0) WHERE crank = 1),
       |ip1 AS (SELECT cell, generate_subscripts(v, 1) - 1 AS dim,
       |    unnest(v) AS x FROM it1),
       |is1 AS (SELECT cell, dim,
       |    sum(CAST(round(x * 1000000.0) AS BIGINT))::BIGINT AS sx,
       |    count(*)::BIGINT AS n FROM ip1 GROUP BY 1, 2),
       |ic1 AS (SELECT cell AS c_id,
       |    list(CAST(CAST(round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       |      AS BIGINT) AS DOUBLE) / 1000000.0 ORDER BY dim) AS cv
       |  FROM is1 GROUP BY 1),
       |icn AS (SELECT c_id, cv, sqrt(${dotD("cv", "cv")}) AS cnrm
       |  FROM ic1),
       |ia0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN icn c),
       |iasg AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, c_id) AS crank FROM ia0)
       |  WHERE crank = 1),
       |iocc AS (SELECT cell, count(*)::BIGINT AS cn FROM iasg GROUP BY 1),
       |itot AS (SELECT sum(cn)::BIGINT AS nv, count(*)::BIGINT AS ncells
       |  FROM iocc),
       |ibig AS (SELECT cell FROM iocc, itot WHERE cn * ncells > nv * 2),
       |ikey AS MATERIALIZED (SELECT a.vec_id, a.v, a.nrm,
       |    CASE WHEN b.cell IS NOT NULL
       |      THEN a.cell * 2 + ($sbitD)
       |      ELSE a.cell * 2 END AS ck
       |  FROM iasg a LEFT JOIN ibig b ON a.cell = b.cell)""".stripMargin
  }

  /** Oracle chain for the binary-quantization rerank: sign-bit codes,
    * Hamming prefilter, exact rerank — ending in
    * `brk(q_id, n_id, ham, sim, rank)`. */
  private val bqChainDuck: String =
    s"""bqc AS MATERIALIZED (SELECT vec_id, v, nrm,
       |    $bqCodeD AS code
       |  FROM en),
       |bq AS (SELECT * FROM bqc WHERE vec_id % $TopkSplit = 0),
       |bh AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
       |    bit_count(xor(x.code, y.code))::BIGINT AS ham
       |  FROM bq x JOIN bqc y ON x.vec_id <> y.vec_id),
       |bhr AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY ham, n_id) AS hrank FROM bh),
       |bcand AS (SELECT q_id, n_id, ham FROM bhr WHERE hrank <= $BqCand),
       |brr AS (SELECT c.q_id, c.n_id, c.ham,
       |    ${dotD("q.v", "y.v")} / (q.nrm * y.nrm) AS sim
       |  FROM bcand c JOIN bqc q ON q.vec_id = c.q_id
       |  JOIN bqc y ON y.vec_id = c.n_id),
       |brk AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM brr)""".stripMargin

  /** Oracle chain for the composed IVF→BQ→exact stack: untrained-init
    * cell assignment (the gasg pattern), per-row sign-bit codes,
    * within-cell Hamming pool, exact rerank — ending in
    * `vrk(q_id, n_id, ham, sim, rank)`. */
  private val ivfBqChainDuck: String =
    s"""vcn AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en
       |  WHERE vec_id < $ivfNlistD),
       |vas0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN vcn c),
       |vasg AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell,
       |    $bqCodeD AS code
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, c_id) AS crank FROM vas0)
       |  WHERE crank = 1),
       |vq AS (SELECT vec_id AS q_id, cell, code AS qcode, v AS qv,
       |    nrm AS qn FROM vasg WHERE vec_id % $IvfQuerySplit = 0),
       |vh AS (SELECT q.q_id, y.vec_id AS n_id,
       |    bit_count(xor(q.qcode, y.code))::BIGINT AS ham
       |  FROM vq q JOIN vasg y ON q.cell = y.cell AND q.q_id <> y.vec_id),
       |vhr AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY ham, n_id) AS hrank FROM vh),
       |vcd AS (SELECT q_id, n_id, ham FROM vhr WHERE hrank <= $BqCellCand),
       |vrr AS (SELECT c.q_id, c.n_id, c.ham,
       |    ${dotD("q.qv", "y.v")} / (q.qn * y.nrm) AS sim
       |  FROM vcd c JOIN vq q ON q.q_id = c.q_id
       |  JOIN vasg y ON y.vec_id = c.n_id),
       |vrk AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM vrr)""".stripMargin

  /** Oracle chain for filtered ANN search: trained-IVF assignment
    * joined to the label column, probe-1 candidates, then the 'pre'
    * (predicate before the rank window) and 'post' (unfiltered
    * top-[[FilteredPostK]], then predicate) strategies — ending in
    * `fpre` / `fpost`, both `(mode, q_id, n_id, rank, sim)`. Splice
    * after [[embBase]] + [[ivfKmeansCentsDuck]]. */
  private val filteredSearchDuck: String =
    s"""fel AS (SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label
       |  FROM embeddings),
       |fasg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN cn c),
       |fassigned AS MATERIALIZED (SELECT a.vec_id, a.v, a.nrm, a.cell,
       |    l.label
       |  FROM (SELECT vec_id, v, nrm, c_id AS cell FROM (
       |      SELECT *, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY csim DESC, c_id) AS crank FROM fasg0)
       |    WHERE crank = 1) a JOIN fel l ON l.vec_id = a.vec_id),
       |fqs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell,
       |    label AS qlbl FROM fassigned WHERE vec_id % $IvfQuerySplit = 0),
       |fbase AS (SELECT q.q_id, y.vec_id AS n_id, q.qlbl, y.label AS nlbl,
       |    ${dotD("q.qv", "y.v")} / (q.qn * y.nrm) AS sim
       |  FROM fqs q JOIN fassigned y
       |  ON q.cell = y.cell AND q.q_id <> y.vec_id),
       |fpre AS (SELECT 'pre' AS mode, q_id, n_id, rank, sim FROM (
       |    SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, n_id)::BIGINT AS rank
       |    FROM fbase WHERE qlbl = nlbl) WHERE rank <= 3),
       |fpk AS (SELECT q_id, n_id, sim, qlbl, nlbl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, n_id) AS r0 FROM fbase)
       |  WHERE r0 <= $FilteredPostK),
       |fpost AS (SELECT 'post' AS mode, q_id, n_id, rank, sim FROM (
       |    SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, n_id)::BIGINT AS rank
       |    FROM fpk WHERE qlbl = nlbl) WHERE rank <= 3)""".stripMargin

  /** Oracle chain for tombstoned serving: the trained-IVF assignment
    * with the vec_id % 10 = 3 tombstone mask applied at serve time —
    * ending in `drk(q_id, n_id, sim, rank)`. Splice after
    * [[embBase]] + [[ivfKmeansCentsDuck]]. */
  private val ivfDeletedChainDuck: String =
    s"""dasg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN cn c),
       |dassigned AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, c_id) AS crank FROM dasg0)
       |  WHERE crank = 1),
       |dlive AS (SELECT * FROM dassigned WHERE vec_id % 10 <> 3),
       |dqs AS (SELECT * FROM dlive WHERE vec_id % $IvfQuerySplit = 0),
       |dsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
       |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
       |  FROM dqs x JOIN dlive y
       |  ON x.cell = y.cell AND x.vec_id <> y.vec_id),
       |drk AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM dsims)""".stripMargin

  val oracles: Map[String, String] = Map(

    "sim_ivf_deleted" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |$ivfDeletedChainDuck
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM drk WHERE rank <= 3""".stripMargin,

    "sim_ivf_deleted_recall" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |$ivfDeletedChainDuck,
         |dexl AS (SELECT * FROM en WHERE vec_id % 10 <> 3),
         |dexq AS (SELECT * FROM dexl WHERE vec_id % $IvfQuerySplit = 0),
         |dexs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM dexq x JOIN dexl y ON x.vec_id <> y.vec_id),
         |dext AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS r FROM dexs)
         |  WHERE r <= 3),
         |dann AS (SELECT q_id, n_id FROM drk WHERE rank <= 3)
         |SELECT t.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) + 0.0) AS recall
         |FROM dext t LEFT JOIN dann a
         |  ON a.q_id = t.q_id AND a.n_id = t.n_id
         |GROUP BY t.q_id""".stripMargin,

    "sim_filtered_search" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |$filteredSearchDuck
         |SELECT mode, q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM (SELECT * FROM fpre UNION ALL SELECT * FROM fpost)""".stripMargin,

    "sim_filtered_recall" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |$filteredSearchDuck,
         |fre AS (SELECT en.vec_id, en.v, en.nrm, l.label
         |  FROM en JOIN fel l ON l.vec_id = en.vec_id),
         |frq AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, label
         |  FROM fre WHERE vec_id % $IvfQuerySplit = 0),
         |frs AS (SELECT q.label, q.q_id, y.vec_id AS n_id,
         |    ${dotD("q.qv", "y.v")} / (q.qn * y.nrm) AS sim
         |  FROM frq q JOIN fre y
         |  ON q.label = y.label AND q.q_id <> y.vec_id),
         |frt AS (SELECT label, q_id, n_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY sim DESC, n_id) AS rank FROM frs) WHERE rank <= 3),
         |fann AS (SELECT mode, q_id, n_id
         |  FROM (SELECT * FROM fpre UNION ALL SELECT * FROM fpost)),
         |fpq AS (SELECT m.mode, t.label, t.q_id,
         |    count(*)::BIGINT AS k,
         |    sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |      AS n_hits
         |  FROM (VALUES ('pre'), ('post')) m(mode)
         |  CROSS JOIN frt t
         |  LEFT JOIN fann a ON a.mode = m.mode AND a.q_id = t.q_id
         |    AND a.n_id = t.n_id
         |  GROUP BY 1, 2, 3),
         |fcnt AS (SELECT label, count(*)::BIGINT AS n_lbl FROM fre
         |  GROUP BY 1),
         |ftot AS (SELECT count(*)::BIGINT AS n_all FROM fre)
         |SELECT mode, label, count(*)::BIGINT AS n_q,
         |  (round(CAST(n_lbl AS DOUBLE) / CAST(n_all AS DOUBLE), 6) + 0.0)
         |    AS selectivity,
         |  (round(CAST(sum(n_hits) AS DOUBLE) / CAST(sum(k) AS DOUBLE), 6)
         |    + 0.0) AS recall
         |FROM fpq JOIN fcnt USING (label) CROSS JOIN ftot
         |GROUP BY mode, label, n_lbl, n_all""".stripMargin,

    // Round-trips through the at-rest cell-partitioned layout must be
    // lossless, so the served answers ARE sim_ivf_kmeans' answers —
    // one oracle text, two engines, three query names kept equal.
    "sim_ivf_served" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |sasg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cn c),
         |sassigned AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, c_id) AS crank FROM sasg0)
         |  WHERE crank = 1),
         |sqs AS (SELECT * FROM sassigned WHERE vec_id % $IvfQuerySplit = 0),
         |ssims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM sqs x JOIN sassigned y
         |  ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |srk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM ssims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM srk WHERE rank <= 3""".stripMargin,

    "sim_search_ndcg" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |$bqChainDuck,
         |$ivfBqChainDuck,
         |nasg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cn c),
         |nassigned AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, c_id) AS crank FROM nasg0)
         |  WHERE crank = 1),
         |nqs AS (SELECT * FROM nassigned WHERE vec_id % $IvfQuerySplit = 0),
         |nsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM nqs x JOIN nassigned y
         |  ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |nrk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM nsims),
         |xq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |xs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN en y ON x.vec_id <> y.vec_id),
         |xt AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS r FROM xs)
         |  WHERE r <= 3),
         |nidcg AS (SELECT q_id,
         |    CASE count(*) WHEN 1 THEN 1000000 WHEN 2 THEN 1630930
         |      ELSE 2130930 END AS idcg_micro
         |  FROM xt GROUP BY q_id),
         |fall AS (
         |  SELECT 'ivf' AS family, q_id, n_id, rank FROM nrk
         |    WHERE rank <= 3 AND q_id % $HybridSplit = 0
         |  UNION ALL
         |  SELECT 'bq', q_id, n_id, rank FROM brk
         |    WHERE rank <= 3 AND q_id % $HybridSplit = 0
         |  UNION ALL
         |  SELECT 'ivf_bq', q_id, n_id, rank FROM vrk
         |    WHERE rank <= 3 AND q_id % $HybridSplit = 0),
         |fh AS (SELECT f.family, f.q_id,
         |    sum(CASE f.rank WHEN 1 THEN 1000000 WHEN 2 THEN 630930
         |      ELSE 500000 END)::BIGINT AS dcg_micro,
         |    min(f.rank)::BIGINT AS first_hit
         |  FROM fall f JOIN xt t ON t.q_id = f.q_id AND t.n_id = f.n_id
         |  GROUP BY 1, 2),
         |fper AS (SELECT fam.family, i.q_id,
         |    CAST(round(CAST(coalesce(h.dcg_micro, 0) AS DOUBLE)
         |      / CAST(i.idcg_micro AS DOUBLE) * 1000000.0) AS BIGINT)
         |      AS ndcg_micro,
         |    CASE coalesce(h.first_hit, 0) WHEN 1 THEN 1000000
         |      WHEN 2 THEN 500000 WHEN 3 THEN 333333 ELSE 0 END
         |      AS mrr_micro
         |  FROM (VALUES ('ivf'), ('bq'), ('ivf_bq')) fam(family)
         |  CROSS JOIN nidcg i
         |  LEFT JOIN fh h ON h.family = fam.family AND h.q_id = i.q_id)
         |SELECT family, count(*)::BIGINT AS n_q,
         |  (round(CAST(sum(ndcg_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    / 1000000.0, 6) + 0.0) AS ndcg3,
         |  (round(CAST(sum(mrr_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    / 1000000.0, 6) + 0.0) AS mrr
         |FROM fper GROUP BY family""".stripMargin,

    "sim_mrl_recall" ->
      s"""WITH $embBase,
         |mxq AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |mxs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM mxq x JOIN en y ON x.vec_id <> y.vec_id),
         |mxt AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS r FROM mxs)
         |  WHERE r <= 3),
         |mh AS (SELECT vec_id, v[1:(len(v)+1)//2] AS tv FROM eb),
         |mhn AS (SELECT *, sqrt(${dotD("tv", "tv")}) AS tn FROM mh),
         |mhq AS (SELECT * FROM mhn WHERE vec_id % $TopkSplit = 0),
         |mhs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.tv", "y.tv")} / (x.tn * y.tn) AS sim
         |  FROM mhq x JOIN mhn y ON x.vec_id <> y.vec_id),
         |mha AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS r FROM mhs)
         |  WHERE r <= 3),
         |mq AS (SELECT vec_id, v[1:(len(v)+3)//4] AS tv FROM eb),
         |mqn AS (SELECT *, sqrt(${dotD("tv", "tv")}) AS tn FROM mq),
         |mqq AS (SELECT * FROM mqn WHERE vec_id % $TopkSplit = 0),
         |mqs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.tv", "y.tv")} / (x.tn * y.tn) AS sim
         |  FROM mqq x JOIN mqn y ON x.vec_id <> y.vec_id),
         |mqa AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS r FROM mqs)
         |  WHERE r <= 3),
         |mu AS (
         |  SELECT 'half' AS level,
         |    CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM mxt t LEFT JOIN mha a
         |    ON a.q_id = t.q_id AND a.n_id = t.n_id
         |  UNION ALL
         |  SELECT 'quarter',
         |    CASE WHEN b.n_id IS NOT NULL THEN 1 ELSE 0 END
         |  FROM mxt t LEFT JOIN mqa b
         |    ON b.q_id = t.q_id AND b.n_id = t.n_id)
         |SELECT level, count(*)::BIGINT AS n_truth,
         |  sum(hit)::BIGINT AS n_hits,
         |  (round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    + 0.0) AS recall
         |FROM mu GROUP BY level""".stripMargin,

    "sim_ivf_bq" ->
      s"""WITH $embBase,
         |$ivfBqChainDuck
         |SELECT q_id, n_id, rank, ham, (round(sim, 6) + 0.0) AS sim
         |FROM vrk WHERE rank <= 3""".stripMargin,

    "sim_ivf_bq_recall" ->
      s"""WITH $embBase,
         |$ivfBqChainDuck,
         |van AS (SELECT q_id, n_id FROM vrk
         |  WHERE rank <= 3 AND q_id % $TopkSplit = 0),
         |vxq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |vxs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM vxq x JOIN en y ON x.vec_id <> y.vec_id),
         |vxr AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM vxs),
         |vex AS (SELECT q_id, n_id FROM vxr WHERE rank <= 3)
         |SELECT vex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN van.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN van.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM vex LEFT JOIN van
         |  ON van.q_id = vex.q_id AND van.n_id = vex.n_id
         |GROUP BY vex.q_id""".stripMargin,

    "sim_bq_rerank" ->
      s"""WITH $embBase,
         |$bqChainDuck
         |SELECT q_id, n_id, rank, ham, (round(sim, 6) + 0.0) AS sim
         |FROM brk WHERE rank <= 5""".stripMargin,

    "sim_bq_rerank_recall" ->
      s"""WITH $embBase,
         |$bqChainDuck,
         |ban AS (SELECT q_id, n_id FROM brk WHERE rank <= 3),
         |bxs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM bq x JOIN en y ON x.vec_id <> y.vec_id),
         |bxr AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM bxs),
         |bex AS (SELECT q_id, n_id FROM bxr WHERE rank <= 3)
         |SELECT bex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN ban.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN ban.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM bex LEFT JOIN ban
         |  ON ban.q_id = bex.q_id AND ban.n_id = bex.n_id
         |GROUP BY bex.q_id""".stripMargin,

    "sim_ivf_incremental" ->
      s"""WITH $embBase,
         |$ivfIncrementalChainDuck,
         |iqs AS (SELECT * FROM ikey WHERE vec_id % $IvfQuerySplit = 0),
         |isim AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM iqs x JOIN ikey y
         |    ON x.ck = y.ck AND x.vec_id <> y.vec_id),
         |irk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM isim)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM irk WHERE rank <= 3""".stripMargin,

    "sim_ivf_incremental_recall" ->
      s"""WITH $embBase,
         |$ivfIncrementalChainDuck,
         |iqs AS (SELECT * FROM ikey WHERE vec_id % $IvfQuerySplit = 0),
         |isim AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM iqs x JOIN ikey y
         |    ON x.ck = y.ck AND x.vec_id <> y.vec_id),
         |irk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM isim),
         |ian AS (SELECT q_id, n_id FROM irk
         |  WHERE rank <= 3 AND q_id % $TopkSplit = 0),
         |ixq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |ixs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM ixq x JOIN en y ON x.vec_id <> y.vec_id),
         |ixr AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM ixs),
         |iex AS (SELECT q_id, n_id FROM ixr WHERE rank <= 3)
         |SELECT iex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN ian.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN ian.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM iex LEFT JOIN ian
         |  ON ian.q_id = iex.q_id AND ian.n_id = iex.n_id
         |GROUP BY iex.q_id""".stripMargin,

    "sim_graph_search" ->
      s"""WITH $graphSearchChainDuck
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM gfin""".stripMargin,

    "sim_hnsw" ->
      s"""WITH $hnswChainDuck
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM hfin""".stripMargin,

    "sim_hnsw_recall" ->
      s"""WITH $hnswChainDuck,
         |hxs AS (SELECT x.q_id, y.vec_id AS n_id,
         |    ${dotD("x.qv", "y.v")} / (x.qn * y.nrm) AS sim
         |  FROM hq x JOIN en y ON x.q_id <> y.vec_id),
         |hxr AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM hxs),
         |hex AS (SELECT q_id, n_id FROM hxr WHERE rank <= 3)
         |SELECT hex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN hfin.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN hfin.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM hex LEFT JOIN hfin
         |  ON hfin.q_id = hex.q_id AND hfin.n_id = hex.n_id
         |GROUP BY hex.q_id""".stripMargin,

    "sim_graph_search_recall" ->
      s"""WITH $graphSearchChainDuck,
         |gxs AS (SELECT x.q_id, y.vec_id AS n_id,
         |    ${dotD("x.qv", "y.v")} / (x.qn * y.nrm) AS sim
         |  FROM gq x JOIN en y ON x.q_id <> y.vec_id),
         |gxr AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM gxs),
         |gex AS (SELECT q_id, n_id FROM gxr WHERE rank <= 3)
         |SELECT gex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN gfin.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN gfin.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM gex LEFT JOIN gfin
         |  ON gfin.q_id = gex.q_id AND gfin.n_id = gex.n_id
         |GROUP BY gex.q_id""".stripMargin)
}
