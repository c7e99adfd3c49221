package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, ConnectedComponents, Multimodal, TextOps}
import graft.functions.GraftFunctions

import TextOps._
import ExtCommon._

/** Similarity / embedding family (SURVEY.md §7.4; split out of
  * ExtQueries r11): brute-force cosine top-k baselines, hyperplane-LSH
  * and IVF (untrained + trained-kmeans) ANN with in-suite recall twins,
  * MIPS, hybrid BM25+dense RRF fusion, kmeans/silhouette/PCA/centroid
  * analytics. IVF index build + cell assignment live in [[ExtCommon]]. */
object SimQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact all-pairs near-dup as a BLOCK-PARTITIONED pair join: rows
    // are bucketed into B blocks; the left side replicates each row to
    // block-pair keys (b, *), the right side to (*, b), so every
    // ordered pair meets in exactly ONE (bi, bj) group. The join is an
    // EQUI-join on the block-pair key (shuffle-hash — never a
    // BroadcastNestedLoopJoin): per-task work is bounded at (n/B)^2,
    // shuffle is B·n rows/side, and the O(n^2) compute (inherent to
    // exact all-pairs) is spread over B^2 independent tasks. At true
    // scale prefer emb_neardup_lsh, which prunes candidates instead.
    "emb_neardup" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val x = e.withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      x.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.vec_id") < col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .filter(col("sim") > 0.3)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          Rounding.r6(col("sim")).as("sim"))
    }),

    // Exact top-k: same block-pair scheme, query side × full side.
    "sim_topk" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val q = e.filter(col("vec_id") % TopkSplit === 0)
        .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 5)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // MMR re-ranking (Carbonell & Goldstein '98) -- the retrieval
    // diversification step after top-k: from each query's exact top-5
    // pool pick 3 by maximal marginal relevance, score = 0.7*sim(q,c)
    // - 0.3*max_{s in S} sim(c,s), unrolled as three deterministic
    // argmax rounds (score desc, n_id). All sims are the r6-rounded
    // values both engines already agree on, so the selection compares
    // identical doubles. Scale shape: the pool is 5 rows/query and the
    // pairwise table 20 rows/query -- every join is q_id/vec_id-keyed,
    // the per-round windows are per-query (bounded), and the corpus
    // cost is sim_topk's (the candidate generator), not the reranker's.
    "sim_rerank_mmr" -> ((s, dir) => {
      val lam = "CAST(0.7 AS DOUBLE)"
      val mu = "CAST(0.3 AS DOUBLE)"
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val mc = ExtCommon.exactTopk(s, dir)
        .select(col("q_id"), col("n_id"), col("sim"))
        .localCheckpoint() // feeds the pool, the pair table, and 3 rounds
      val mp = mc.as("a").join(mc.as("b"),
          col("a.q_id") === col("b.q_id") && col("a.n_id") =!= col("b.n_id"))
        .join(e.select(col("vec_id").as("ai_v"), col("v").as("av"),
          col("nrm").as("an")), col("a.n_id") === col("ai_v"))
        .join(e.select(col("vec_id").as("bi_v"), col("v").as("bv"),
          col("nrm").as("bn")), col("b.n_id") === col("bi_v"))
        .select(col("a.q_id").as("q_id"), col("a.n_id").as("ai"),
          col("b.n_id").as("bi"),
          Rounding.r6(expr(s"try_divide(${dotS("av", "bv")}, an * bn)"))
            .as("ps"))
        .localCheckpoint()
      val s1 = mc.withColumn("r", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)"))
        .filter(col("r") === 1).select(col("q_id"),
          col("n_id").as("s1_id"), col("sim").as("s1_sim"))
      val c2 = mc.join(s1, "q_id")
        .filter(col("n_id") =!= col("s1_id"))
        .join(mp, mc("q_id") === mp("q_id") && col("n_id") === col("ai") &&
          col("s1_id") === col("bi"))
        .select(mc("q_id"), col("n_id"), col("sim"),
          expr(s"$lam * sim - $mu * ps").as("score"))
      val s2 = c2.withColumn("r", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id)"))
        .filter(col("r") === 1).select(col("q_id"),
          col("n_id").as("s2_id"), col("score").as("s2_score"))
      val c3 = mc.join(s1, "q_id").join(s2, "q_id")
        .filter(col("n_id") =!= col("s1_id") && col("n_id") =!= col("s2_id"))
        .join(mp.as("p1"), mc("q_id") === col("p1.q_id") &&
          col("n_id") === col("p1.ai") && col("s1_id") === col("p1.bi"))
        .join(mp.as("p2"), mc("q_id") === col("p2.q_id") &&
          col("n_id") === col("p2.ai") && col("s2_id") === col("p2.bi"))
        .select(mc("q_id"), col("n_id"), col("sim"),
          expr(s"$lam * sim - $mu * greatest(p1.ps, p2.ps)").as("score"))
      val s3 = c3.withColumn("r", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id)"))
        .filter(col("r") === 1)
        .select(col("q_id"), col("n_id"), col("score"))
      s1.select(col("q_id"), col("s1_id").as("n_id"),
          lit(1L).as("mmr_rank"),
          Rounding.r6(expr(s"$lam * s1_sim")).as("mmr_score"))
        .unionByName(s2.select(col("q_id"), col("s2_id").as("n_id"),
          lit(2L).as("mmr_rank"), Rounding.r6(col("s2_score")).as("mmr_score")))
        .unionByName(s3.select(col("q_id"), col("n_id"),
          lit(3L).as("mmr_rank"), Rounding.r6(col("score")).as("mmr_score")))
    }),

    // Hard-negative mining for contrastive training: for each anchor
    // (the sim_topk query split) the top-3 most-similar vectors with a
    // DIFFERENT label — the negatives that actually move an embedding
    // model, mined exactly. Same block-partitioned all-pairs shape as
    // sim_topk (per-task work (n/B)², shuffle B·n, no BNLJ); the
    // label inequality rides the join condition so crossed-out pairs
    // never reach the rank window, and the window is per-anchor
    // (bounded), never corpus-wide.
    "sample_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("label").cast("long").as("label"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val q = e.filter(col("vec_id") % TopkSplit === 0)
        .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.label") =!= col("y.label"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("x.label").as("q_label"),
          col("y.vec_id").as("n_id"), col("y.label").as("n_label"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // Hybrid retrieval with reciprocal-rank fusion: the RAG-corpus
    // query shape — a lexical BM25 list and a dense cosine list fuse
    // per query as Σ 1/(60 + rank). Corpus = docs that have an
    // embedding (id-aligned generator; the bound is a one-count driver
    // literal, scalar-subquery-mirrored). Lexical candidates come from
    // an inverted-index posting join (query tokens × per-doc tf),
    // never doc×doc — with a deterministic df·4 ≤ n stopword cut so a
    // flood token can't quadratic the join at 100 TB; per-term BM25
    // scores micro-quantize to longs BEFORE the per-(q,d) sum so the
    // cross-partition reduce is order-independent. Dense candidates
    // are the block-partitioned exact cosine top-20 (the sim_topk
    // shape). Both rank columns are integers; the fused score is two
    // IEEE divisions and one add — bit-equal on both engines. 0 in
    // lex_rank/dense_rank marks "absent from that side's top-20".
    "sim_hybrid_rrf" -> ((s, dir) => {
      val (lexTop, _) = hybridLexTop(s, dir)
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val q = e.filter(col("id") % HybridSplit === 0)
        .withColumn("bi", expr(s"CAST(id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.withColumn("bj", expr(s"CAST(id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val denseTop = q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.id") =!= col("y.id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("dr", expr(
          "CAST(row_number() OVER (PARTITION BY x.id ORDER BY sim DESC, y.id) AS BIGINT)"))
        .filter(col("dr") <= 20)
        .select(col("x.id").as("q_id"), col("y.id").as("id"), col("dr"))
      hybridFuse(lexTop, denseTop)
    }),

    // Hybrid retrieval, ANN dense side: the 100 TB form of
    // sim_hybrid_rrf. Same BM25 posting-join lexical list and the same
    // RRF fuse, but the dense top-20 probes the TRAINED bucketed IVF
    // index (sim_ivf_kmeans' quantizer) at nprobe=2: one broadcast
    // assignment pass over the corpus, a query-side 2-best-cell rank
    // (bounded: |Q| × nlist rows, never the corpus), then a cell
    // equi-join whose candidate set is two cells (~2n/nlist rows per
    // query) — the exact block top-20's O(|Q|·n) work (effectively
    // quadratic at |Q| = n/50) never happens. Recall vs the exact
    // variant is measured by sim_hybrid_rrf_ann_recall.
    "sim_hybrid_rrf_ann" -> ((s, dir) => {
      val (lexTop, _) = hybridLexTop(s, dir)
      val (cents, assigned) = ivfKmeansIndex(emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v")))
      val qs = assigned.filter(col("vec_id") % HybridSplit === 0)
        .select(col("vec_id"), col("v"), col("nrm"))
        .crossJoin(broadcast(cents))
        .withColumn("csim", expr(s"try_divide(${dotS("v", "cv")}, nrm * cnrm)"))
        .withColumn("crank", expr(
          "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id)"))
        .filter(col("crank") <= 2)
        .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("cell"))
      val denseTop = qs.as("x").join(assigned.as("y"),
          col("x.cell") === col("y.cell") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("dr", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("dr") <= 20)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("id"),
          col("dr"))
      hybridFuse(lexTop, denseTop)
    }),

    // Measured RRF-recall of the ANN-fused hybrid vs the exact one:
    // per query, the fraction of the exact fused top-5 the ANN fused
    // top-5 recovers. The join keys are (q_id, doc_id) id pairs —
    // recall math on bounded 5-row-per-query lists, never vectors.
    "sim_hybrid_rrf_ann_recall" -> ((s, dir) => {
      val exact = ExtCommon.cachedAnn("sim_hybrid_rrf", s, dir)(ExtQueries.queries("sim_hybrid_rrf")(s, dir))
        .select(col("q_id"), col("doc_id"))
      val ann = ExtCommon.cachedAnn("sim_hybrid_rrf_ann", s, dir)(ExtQueries.queries("sim_hybrid_rrf_ann")(s, dir))
        .select(col("q_id"), col("doc_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "doc_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(col("n_hits").cast("double") / col("k").cast("double"))
            .as("recall"))
    }),

    // kNN majority-vote labeling (weak supervision / label-noise
    // audit): each held-out query vector (the sim_topk split) gets
    // the majority label of its 5 nearest corpus vectors by cosine;
    // `agree` flags whether the vote matches the stored label — the
    // disagreeing rows are the label-noise review queue. Same
    // block-partitioned exact shape as sim_topk; the vote is a
    // bounded per-query count + argmin-rank, never a corpus-wide
    // window. Ties: higher count wins, then smaller label.
    "emb_knn_label" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("label").cast("long").as("label"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val q = e.filter(col("vec_id") % TopkSplit === 0)
        .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.filter(col("vec_id") % 10 =!= 0)
        .withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id)"))
        .filter(col("rank") <= 5)
        .groupBy(col("x.vec_id").as("q_id"), col("x.label").as("label"),
          col("y.label").as("n_label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", expr(
          "row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label)"))
        .filter(col("vr") === 1)
        .select(col("q_id"), col("label"),
          col("n_label").as("pred_label"), col("votes"),
          expr("CAST(label = n_label AS BIGINT)").as("agree"))
    }),

    // Exact maximum-inner-product top-3 (retrieval's actual score
    // when embeddings are trained with dot-product objectives —
    // cosine's norm division is NOT rank-equivalent unless vectors
    // are normalized). Same block-partitioned all-pairs shape as
    // sim_topk: per-task work (n/B)², shuffle B·n, no
    // BroadcastNestedLoopJoin.
    "sim_mips" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val q = e.filter(col("vec_id") % TopkSplit === 0)
        .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      val y = e.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
        .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
      q.as("x").hint("shuffle_hash")
        .join(y.as("y").hint("shuffle_hash"),
          col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("ip", expr(dotS("x.v", "y.v")))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY ip DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("ip")).as("ip"))
    }),

    // Approximate MIPS via the norm-augmentation reduction (Neyshabur
    // & Srebro / Shrivastava & Li): data vectors extend to
    // x' = [x, √(M² − ‖x‖²)] (M² = max squared norm, a one-row
    // broadcast aggregate), queries to q' = [q, 0] — then
    // cos(q', x') ∝ q·x for each fixed q, so the SAME adaptive
    // hyperplane-LSH bucket join the cosine path uses serves inner
    // product. Candidates come from signature equality (equi-join,
    // never all-pairs); ranking within candidates is the exact dot.
    // The max-norm vector's augmented term clamps at 0 on BOTH
    // engines (M·M − ‖x‖² can go one ulp negative).
    "sim_mips_ann" -> ((s, dir) => {
      val e0 = emb(s, dir)
      val bits = annBits(e0)
      val e = e0.select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val m2 = e.agg(max(expr(dotS("v", "v"))).as("m2"))
      val data = e.crossJoin(broadcast(m2))
        .withColumn("va", expr(
          s"concat(v, array(sqrt(greatest(0D, m2 - ${dotS("v", "v")}))))"))
        .select(col("vec_id"), col("v"),
          expr(s"graft_hplane_sig(va, $bits)").as("sig"))
      val qs = data.filter(col("vec_id") % TopkSplit === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          expr(s"graft_hplane_sig(concat(v, array(0D)), $bits)").as("sig"))
      qs.join(data, Seq("sig"))
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn("ip", expr(dotS("qv", "v")))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("ip")).as("ip"))
    }),

    // Recall@3 of the augmented-LSH MIPS index vs the exact
    // inner-product ground truth — the published-measurement pattern
    // of the family (sim_recall / sim_ivf_recall), on the shared
    // %10 query split. Pure composition of oracle-gated queries.
    "sim_mips_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactMips(s, dir)
        .select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_mips_ann", s, dir)(ExtQueries.queries("sim_mips_ann")(s, dir))
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    "sim_ann_lsh" -> ((s, dir) => {
      val e0 = emb(s, dir)
      val e = e0
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
        .withColumn("sig", expr(sigS(annBits(e0))))
      e.as("x").join(e.as("y"),
          col("x.sig") === col("y.sig") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // Incremental embedding near-dup: a NEW shard (vec_id ≡ 3 mod 20)
    // probes the EXISTING corpus via the hyperplane-signature
    // equi-join WITHOUT re-pairing the corpus with itself — the
    // vector face of dedup_incremental (daily-ingest shape: the
    // corpus side is the persisted at-rest index; only the shard
    // hashes fresh). Emits (shard vec, corpus vec, cosine) above the
    // emb_neardup_lsh threshold.
    "emb_neardup_incremental" -> ((s, dir) => {
      val e0 = emb(s, dir)
      val e = e0
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
        .withColumn("sig", expr(sigS(annBits(e0))))
      val shard = e.filter(col("vec_id") % 20 === 3)
      val corpus = e.filter(col("vec_id") % 20 =!= 3)
      shard.as("x").join(corpus.as("y"), col("x.sig") === col("y.sig"))
        .withColumn("sim", expr(
          s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .filter(col("sim") > 0.3)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          Rounding.r6(col("sim")).as("sim"))
    }),

    // Visibility report for the adaptive hyperplane signature (the
    // dedup_lsh_skipped pattern): the chosen bit count and the bucket
    // profile it produced — vector count, distinct buckets, largest
    // bucket, and the within-bucket candidate-pair mass the ANN joins
    // will pay. The ONE number to watch when the corpus grows: if
    // n_cand_pairs trends quadratic, the bit formula needs more range.
    "sim_ann_stats" -> ((s, dir) => {
      val e0 = emb(s, dir)
      val bits = annBits(e0)
      e0.select(expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .select(expr(sigS(bits)).as("sig"))
        .groupBy("sig").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_vectors"),
          count(lit(1)).as("n_buckets"),
          max(col("c")).as("max_bucket"),
          sum(expr("c * (c - 1) DIV 2")).as("n_cand_pairs"))
        // empty-in → empty-out (suite invariant): a global aggregate
        // over an empty corpus still emits its one all-null row.
        .filter(col("n_buckets") > 0)
        .select(lit(bits.toLong).as("bits"), col("n_vectors"),
          col("n_buckets"), col("max_bucket"), col("n_cand_pairs"))
    }),

    // Mutual-kNN graph over the LSH-bucketed ANN edges: a directed
    // k=3 edge per vector (sim_ann_lsh's list), kept only when both
    // endpoints list each other — the symmetrized graph semantic-dedup
    // clustering and manifold methods consume. Degree histogram over
    // ALL vectors (0-degree singletons included). Scale: the directed
    // edge list is ≤ 3n short rows (checkpointed once — it feeds both
    // sides of the mutual check), the mutual test is a self semi-join
    // on 16-byte keys, and degrees collapse map-side; nothing ever
    // shuffles a vector payload after the bucket join.
    "sim_knn_graph" -> ((s, dir) => {
      val knn = ExtQueries.queries("sim_ann_lsh")(s, dir)
        .select(col("q_id"), col("n_id"))
        .localCheckpoint()
      val rev = knn.select(col("n_id").as("q_id"), col("q_id").as("n_id"))
      val deg = knn.join(rev, Seq("q_id", "n_id"), "left_semi")
        .groupBy(col("q_id").as("vec_id"))
        .agg(count(lit(1)).as("deg"))
      emb(s, dir).select(col("vec_id").cast("long").as("vec_id"))
        .join(deg, Seq("vec_id"), "left")
        .withColumn("degree", coalesce(col("deg"), lit(0L)))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    }),

    // NN-descent kNN-graph refinement (Dong et al., WWW'11 — the
    // construction pynndescent/UMAP and disk-ANN builds use at scale):
    // start from the LSH same-bucket top-3 lists and run two
    // neighbor-of-neighbor rounds — each round proposes the friends of
    // friends over the UNDIRECTED current graph, scores them, and
    // keeps top-3 per node. The convergence claim of the paper is that
    // a few such rounds recover most of the true kNN graph that
    // single-probe LSH misses (bucket boundaries cut true neighbors);
    // sim_nndescent_recall publishes the measured uplift over the
    // sim_recall LSH baseline. Scale shape: candidate generation is a
    // self-join of a ≤6n-row id-pair list on 8-byte keys (≤ ~36+3
    // candidates per node, k²-bounded — never a vector payload), then
    // two id-keyed joins re-attach vectors for scoring and a per-node
    // top-k window; rounds are a fixed constant, each localCheckpointed.
    "sim_nndescent" -> ((s, dir) => {
      val e0 = emb(s, dir)
      val e = e0
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
        .localCheckpoint() // feeds the init bucket join + 2 scoring rounds
      // Pairing only needs (vec_id, sig) — the bucket join never
      // shuffles a vector payload. rn ranks bucket-mates by vec_id so
      // the hot-bucket cap below is deterministic on both engines;
      // the rank window and the self-join share the sig exchange.
      val withSig = e.select(col("vec_id"), expr(sigS(annBits(e0))).as("sig"))
        .withColumn("rn", expr(
          "CAST(row_number() OVER (PARTITION BY sig ORDER BY vec_id) AS BIGINT)"))
      // Score candidate id-pairs by re-attaching vectors (two id-keyed
      // joins — the pair list itself never carries a payload), then
      // keep top-3 per node.
      def top3(cand: DataFrame): DataFrame = cand
        .join(e.select(col("vec_id").as("a"), col("v").as("va"),
          col("nrm").as("na")), "a")
        .join(e.select(col("vec_id").as("b"), col("v").as("vb"),
          col("nrm").as("nb")), "b")
        .select(col("a"), col("b"),
          expr(s"try_divide(${dotS("va", "vb")}, na * nb)").as("sim"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("a"), col("b"), col("rank"), col("sim"))
      // Init = LSH bucket-mates ∪ 3 deterministic pseudo-random ring
      // edges per node (the paper's RANDOM init, made oracle-
      // mirrorable). The ring edges are what let descent ESCAPE the
      // LSH partition: same-bucket friends-of-friends stay in the
      // bucket (sig(c) = sig(m) = sig(a)), so an LSH-only init is
      // already a fixed point of the refinement, measured as exactly
      // zero uplift. Dense [0, n) ids assumed for the targets (the
      // gate tables are dense); a missing target just drops its edge
      // at the scoring join.
      // Hot-bucket guard: a degenerate corpus (mass near-duplicate
      // vectors hashing to ONE bucket — exactly what LLM dedup
      // pipelines see) would make the same-sig self-join quadratic in
      // the flood size. Each node therefore pairs only with bucket-
      // mates within NndInitCap rank positions (|Δrn| ≤ cap over the
      // vec_id order), bounding a B-node bucket at B·2·cap init pairs
      // while the adaptive bits keep the EXPECTED bucket at ~64 ≪ cap
      // — every gate bucket (max 66 at sf0.1) sits under the cap, so
      // the gate pair sets are byte-identical to the uncapped join.
      // Descent's friend-of-friend rounds re-link what the rank band
      // cuts, the same way they recover LSH boundary losses.
      val n = math.max(1L, e.count())
      val bucketPairs = withSig.as("x").join(withSig.as("y"),
          col("x.sig") === col("y.sig") && col("x.vec_id") =!= col("y.vec_id") &&
            abs(col("x.rn") - col("y.rn")) <= NndInitCap)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      val ringPairs = e.select(col("vec_id").as("a"))
        .select(col("a"), explode(expr(
          s"transform(sequence(1, 3), " +
            s"j -> ((a % $P) * (2*j + 1) + j * 7919 + 1) % $P % ${n}L)"))
          .as("b"))
        .filter(col("a") =!= col("b"))
      var knn = top3(bucketPairs.union(ringPairs).distinct())
        .localCheckpoint()
      for (_ <- 1 to 2) {
        val und = knn.select(col("a"), col("b"))
          .union(knn.select(col("b").as("a"), col("a").as("b")))
        val cand = und.as("p").join(und.as("q"), col("p.b") === col("q.a"))
          .select(col("p.a").as("a"), col("q.b").as("b"))
          .filter(col("a") =!= col("b"))
          .union(knn.select(col("a"), col("b")))
          .distinct()
        knn = top3(cand).localCheckpoint()
      }
      knn.select(col("a").as("q_id"), col("b").as("n_id"), col("rank"),
        Rounding.r6(col("sim")).as("sim"))
    }),

    // Recall@3 of the refined graph vs the exact ground truth on the
    // q_id % 10 split — read next to sim_recall (the LSH init's own
    // recall) for the measured NN-descent uplift.
    "sim_nndescent_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_nndescent", s, dir)(queries("sim_nndescent")(s, dir))
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

    // Embedding near-dup at scale: same-bucket candidates only (the
    // brute-force emb_neardup is the correctness baseline; this is the
    // shape that survives 100 TB — an equi-join on the adaptive-width
    // hyperplane signature, see [[annBits]]).
    "emb_neardup_lsh" -> ((s, dir) => {
      val e0 = emb(s, dir)
      val e = e0
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
        .withColumn("sig", expr(sigS(annBits(e0))))
      e.as("x").join(e.as("y"),
          col("x.sig") === col("y.sig") && col("x.vec_id") < col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .filter(col("sim") > 0.3)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          Rounding.r6(col("sim")).as("sim"))
    }),

    // IVF-style ANN: deterministic coarse quantizer (centroids = the
    // nlist lowest vec_ids, nlist adaptive — see [[ivfNlist]]), cells
    // assigned by max cosine; queries probe their own cell. The scale
    // path: the big pairwise join becomes an equi-join on cell id —
    // candidates shrink ~nlist×, and nlist grows ~√n so per-cell
    // candidate lists stay ~√n instead of n/16.
    "sim_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val cents = ivfInitCents(e)
      val assigned = assignCells(e, cents)
      val qs = assigned.filter(col("vec_id") % IvfQuerySplit === 0)
      qs.as("x").join(assigned.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // IVF with nprobe=2 — the recall lever: queries probe their TWO
    // nearest cells (candidates ~2×, still an equi-join on cell id; a
    // data vector lives in exactly one cell so no pair dedup needed).
    // Same adaptive nlist quantizer as sim_ivf.
    "sim_ivf_probe2" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val cents = ivfInitCents(e)
      val assigned = assignCells(e, cents)
      // The top-2 probe list needs a per-vector RANK (not just the
      // argmax), so the window survives here — but only over the
      // query split (4% of rows), filtered BEFORE the rank: the
      // full-corpus side uses the aggregate assignment above.
      val qs = e.filter(col("vec_id") % IvfQuerySplit === 0)
        .crossJoin(broadcast(cents))
        .withColumn("csim", expr(s"try_divide(${dotS("v", "cv")}, nrm * cnrm)"))
        .withColumn("crank", expr(
          "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id)"))
        .filter(col("crank") <= 2)
        .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("cell"))
      qs.as("x").join(assigned.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // IVF with a TRAINED coarse quantizer: one Lloyd iteration of
    // spherical k-means over the init centroids (the same nlist lowest
    // vec_ids sim_ivf probes untrained), then the usual cell equi-join.
    // The 100 TB posture of quantizer training: centroids train on a
    // bounded hash-sample (vec_id % 4 — quantizer training is O(sample
    // · nlist), never O(n · nlist · iters)), the update is the
    // micro-quantized integer mean from emb_kmeans (the only
    // cross-partition float reduction runs over exact longs), and the
    // full corpus only ever sees ONE broadcast-assignment pass against
    // the trained centroids. Mean updates need no normalization:
    // cosine ranking is scale-invariant in the centroid. c1 is ≤ nlist
    // rows and localCheckpoints so the self-join below doesn't re-run
    // the training chain per side.
    "sim_ivf_kmeans" -> ((s, dir) => {
      val assigned = ivfKmeansAssigned(s, dir)
      val qs = assigned.filter(col("vec_id") % IvfQuerySplit === 0)
      qs.as("x").join(assigned.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // Per-label embedding centroids — the "domain mean vector" used
    // for clustering diagnostics and IVF seeding. Long output shape
    // (label, dim, value): posexplode then ONE groupBy on (label, dim)
    // — the shuffle carries scalars keyed by a 2-int key, never whole
    // vectors, and map-side partial sums collapse each partition to
    // one row per (label, dim) first.
    "emb_centroids" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label").cast("long").as("label"),
          posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), Rounding.r6(avg(col("x"))).as("centroid"))
        .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
          col("centroid"))),

    // kNN-distance OOD score -- the LOCAL-density outlier face next
    // to emb_outliers' global-centroid one (junk inside a dense
    // corpus is far from its neighbors long before it is far from the
    // centroid): for each query-split vector, ood = 1 - sim to its
    // 5th nearest neighbor; flagged when its micro-quantized score
    // exceeds 2x the split's mean (exact integer cross-multiply --
    // the mean never crosses an engine as a float). Rides sim_topk's
    // block-partitioned all-pairs verbatim; the threshold is one
    // |split|-row aggregate broadcast back.
    "emb_ood_knn" -> ((s, dir) => {
      val k5 = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") === 5)
        .select(col("q_id"),
          expr("CAST(round(sim * 1000000.0) AS BIGINT)").as("kth_micro"))
        .withColumn("ood_micro", lit(1000000L) - col("kth_micro"))
        .localCheckpoint() // feeds the threshold aggregate and the rows
      val tot = k5.agg(count(lit(1)).as("nq"),
        sum(col("ood_micro")).as("so"))
      k5.crossJoin(broadcast(tot))
        .select(col("q_id"),
          Rounding.r6(expr("CAST(kth_micro AS DOUBLE) / 1000000.0"))
            .as("kth_sim"),
          Rounding.r6(expr("CAST(ood_micro AS DOUBLE) / 1000000.0"))
            .as("ood"),
          (col("ood_micro") * col("nq") > col("so") * 2).as("is_ood"))
    }),

    // Per-label embedding outliers: squared distance to the label
    // centroid, flagged against 2× the label's mean squared distance.
    // Centroids and the per-label mean dist² are plain groupBy
    // aggregates (map-side partials) broadcast back — ZERO windows:
    // the old per-(label, dim) / per-label windows funneled every
    // component (resp. vector) of a label through one task. The
    // per-vector dist² table checkpoints once (3 scalar columns) and
    // feeds both the threshold aggregate and the output.
    "emb_outliers" -> ((s, dir) => {
      def x = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("label").cast("long").as("label"),
          posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)")).as(Seq("dim", "x")))
      val cent = x.groupBy("label", "dim").agg(avg(col("x")).as("c"))
      val d = x.join(broadcast(cent), Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist2"))
        .localCheckpoint()
      val mu = d.groupBy("label").agg(avg(col("dist2")).as("mu"))
      d.join(broadcast(mu), Seq("label"))
        .select(col("vec_id"), col("label"), Rounding.r6(col("dist2")).as("dist2"),
          (col("dist2") > lit(2.0) * col("mu")).as("is_outlier"))
    }),

    // K-means (k=8, two Lloyd iterations, deterministic init = the 8
    // lowest vec_ids). Distances expand to three sequential-fold dot
    // products (bit-equal across engines); centroid UPDATES are the
    // only cross-partition float reduction, so component sums run over
    // micro-quantized longs and the new centroids re-quantize — every
    // float either never crosses a shuffle or is exact when it does.
    // Centroids broadcast both rounds; the vectors shuffle only as
    // (vec_id | cluster·dim)-keyed aggregate partials.
    "emb_kmeans" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      assignEuclid(e, lloyd1Cents(e))
        .select(col("vec_id"), col("cluster"), Rounding.r6(col("d2")).as("d2"))
    }),

    // Simplified silhouette of the one-Lloyd-round k-means clustering:
    // per vector a = dist to OWN centroid, b = dist to the nearest
    // OTHER centroid, s = (b−a)/max(a,b) — the separation metric a
    // clustering run reports before anyone trusts its groups. One
    // broadcast of the 8 centroids; the two distances come out of ONE
    // sorted 8-struct collect per vector (clusters are distinct per
    // row, so element 2 IS the nearest other); per-vector scores
    // micro-quantize before the per-cluster mean so the reduce is
    // order-independent.
    "emb_silhouette" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      e.crossJoin(broadcast(lloyd1Cents(e)))
        .withColumn("d2", expr(
          "graft_dot(v, v) - 2.0 * graft_dot(v, c) + graft_dot(c, c)"))
        .groupBy("vec_id")
        .agg(expr("array_sort(collect_list(struct(d2, cluster)))").as("ds"))
        .select(col("vec_id"),
          expr("element_at(ds, 1).cluster").as("cluster"),
          expr("sqrt(greatest(element_at(ds, 1).d2, 0D))").as("a"),
          expr("sqrt(greatest(element_at(ds, 2).d2, 0D))").as("b"))
        .withColumn("sil", expr("CASE WHEN greatest(a, b) <= 0D THEN 0D" +
          " ELSE (b - a) / greatest(a, b) END"))
        .withColumn("sm", expr("CAST(round(sil * 1000000.0) AS BIGINT)"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_vectors"),
          Rounding.r6(expr("CAST(sum(sm) AS DOUBLE) / 1000000.0" +
            " / CAST(count(1) AS DOUBLE)")).as("mean_sil"))
    }),

    // ANN quality evaluation — recall@3 of the LSH index against the
    // brute-force ground truth, per query vector (the measurement a
    // vector store publishes before anyone trusts the approximate
    // path). Pure composition of the two oracle-gated similarity
    // queries; hits resolve by an exchange-aligned left join on
    // (q_id, n_id), counts exact.
    "sim_recall" -> ((s, dir) => {
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = ExtCommon.cachedAnn("sim_ann_lsh", s, dir)(ExtQueries.queries("sim_ann_lsh")(s, dir))
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

    // Matryoshka truncation curve: recall@3 of cosine search over the
    // PREFIX dims (d/4, d/2) against the full-dimension ground truth
    // — the measurement behind serving truncated embeddings (MRL):
    // how much ranking quality each prefix keeps, published per query.
    // Truncated searches reuse the block-partitioned all-pairs shape
    // (slice happens in the scan projection, so the join moves k-dim
    // arrays, not full vectors); the dims are driver literals from one
    // max(len) job, oracle-mirrored as scalar subqueries.
    "emb_mrl_recall" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val d = {
        val r = e.agg(max(size(col("v")))).collect()(0)
        if (r.isNullAt(0)) 0 else r.getInt(0)
      }
      val dims = Seq(math.max(1, d / 4), math.max(1, d / 2)).distinct
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"))
        .crossJoin(dims.map(_.toLong).toDF("dim_k"))
      val anns = dims.map { k =>
        val t = e.select(col("vec_id"), expr(s"slice(v, 1, $k)").as("vk"))
          .withColumn("nrm", expr(s"sqrt(${dotS("vk", "vk")})"))
        val qb = t.filter(col("vec_id") % TopkSplit === 0)
          .withColumn("bi", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
          .withColumn("bj", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
        val yb = t.withColumn("bj", expr(s"CAST(vec_id % $PairBlocks AS INT)"))
          .withColumn("bi", explode(expr(s"sequence(0, ${PairBlocks - 1})")))
        qb.as("x").hint("shuffle_hash")
          .join(yb.as("y").hint("shuffle_hash"),
            col("x.bi") === col("y.bi") && col("x.bj") === col("y.bj") &&
              col("x.vec_id") =!= col("y.vec_id"))
          .withColumn("sim", expr(
            s"try_divide(${dotS("x.vk", "y.vk")}, x.nrm * y.nrm)"))
          .withColumn("rank", expr(
            "row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id)"))
          .filter(col("rank") <= 3)
          .select(lit(k.toLong).as("dim_k"), col("x.vec_id").as("q_id"),
            col("y.vec_id").as("n_id"), lit(1L).as("hit"))
      }.reduce(_ union _)
      exact.join(anns, Seq("dim_k", "q_id", "n_id"), "left")
        .groupBy("dim_k", "q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("dim_k"), col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // Recall@3 per IVF probe depth — probe1 (own cell) vs probe2 (two
    // nearest cells) against the brute-force ground truth on the
    // shared query split (q_id % 50 = 0). nprobe is THE knob a vector
    // store turns when measured recall is too low; this emits the
    // recall side of that tradeoff as a table next to sim_ann_stats'
    // candidate-mass side (and sim_ivf_pq_recall's composed-index
    // number). Pure composition of oracle-gated queries; hits resolve
    // by an exchange-aligned left join, counts exact.
    "sim_ivf_recall" -> ((s, dir) => {
      import s.implicits._
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
        .crossJoin(Seq("probe1", "probe2").toDF("method"))
      def ann(name: String, q: String) =
        queries(q)(s, dir)
          .filter(col("q_id") % TopkSplit === 0)
          .select(lit(name).as("method"), col("q_id"), col("n_id"),
            lit(1L).as("hit"))
      val anns = ann("probe1", "sim_ivf").union(ann("probe2", "sim_ivf_probe2"))
      exact.join(anns, Seq("method", "q_id", "n_id"), "left")
        .groupBy("method", "q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("method"), col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // The cell-balance side of quantizer training: per method
    // (untrained init vs one-Lloyd-iteration trained), the number of
    // nonempty cells, the LARGEST cell, and the mean cell size. At
    // scale max_cell is the number that matters — the per-cell
    // candidate join does max_cell² work in its worst cell (straggler
    // task), and Lloyd's update exists precisely to pull that toward
    // the mean. Assignments reuse the shared chains; the aggregate
    // shuffles only (method, cell) longs.
    "sim_ivf_kmeans_stats" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
      val c0 = ivfInitCents(e)
      val init = assignCells(e, c0)
        .select(lit("init").as("method"), col("cell"))
      val trained = ivfKmeansAssigned(s, dir)
        .select(lit("trained").as("method"), col("cell"))
      init.union(trained)
        .groupBy("method", "cell").agg(count(lit(1)).as("cnt"))
        .groupBy("method")
        .agg(count(lit(1)).as("n_cells"), max(col("cnt")).as("max_cell"),
          sum(col("cnt")).as("n_vecs"))
        .select(col("method"), col("n_cells"), col("max_cell"),
          Rounding.r6(expr(
            "CAST(n_vecs AS DOUBLE) / CAST(n_cells AS DOUBLE)"))
            .as("mean_cell"))
    }),

    // Does training the coarse quantizer buy recall? recall@3 of the
    // UNTRAINED IVF (centroids = lowest vec_ids, sim_ivf) vs the
    // one-Lloyd-iteration TRAINED index (sim_ivf_kmeans) against the
    // brute-force ground truth on the shared query split — the
    // measurement behind the "train your centroids" remedy the
    // sim_ivf_recall caveat points at. Pure composition of oracle-gated
    // queries; hits resolve by an exchange-aligned left join.
    "sim_ivf_kmeans_recall" -> ((s, dir) => {
      import s.implicits._
      val exact = ExtCommon.exactTopk(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
        .crossJoin(Seq("init", "trained").toDF("method"))
      def ann(name: String, q: String) =
        queries(q)(s, dir)
          .filter(col("q_id") % TopkSplit === 0)
          .select(lit(name).as("method"), col("q_id"), col("n_id"),
            lit(1L).as("hit"))
      val anns = ann("init", "sim_ivf").union(ann("trained", "sim_ivf_kmeans"))
      exact.join(anns, Seq("method", "q_id", "n_id"), "left")
        .groupBy("method", "q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("method"), col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }),

    // PCA first principal component by power iteration — every number
    // that crosses an engine boundary is an exact integer. Components
    // micro-quantize; the dim means and the 64×64 centered covariance
    // reduce as exact long sums (the covariance is FIXED-SIZE whatever
    // the corpus, so collecting it to the driver is the broadcast-
    // build-side posture, not a data-sized collect); 12 power-iteration
    // rounds run in arbitrary-precision integers (Scala BigInt here,
    // HUGEINT in the mirrored unrolled-CTE oracle) with a
    // truncate-toward-zero max-norm requantize each round and a
    // first-nonzero-positive sign canon; the projection folds exact
    // long products per vector. At corpora where a cov cell exceeds
    // int64 (~1e18 micro²·rows), widen the cell sums to DECIMAL(38,0).
    "emb_pca1" -> ((s, dir) => {
      val (centered, m) = pcaCenteredCov(s, dir)
      val v = pcaPowerIter(m)
      centered.select(col("vec_id"),
        Rounding.r6(expr(s"CAST(aggregate(zip_with(c, ${pcaVecLit(v)}, " +
          "(x, w) -> x * w), 0L, (a, b) -> a + b) AS DOUBLE)" +
          " / 1000000000000.0")).as("pc1"))
    }),

    // Top-4 principal components by DEFLATED power iteration — the
    // same all-exact-integer contract as emb_pca1, one component at a
    // time: after component k converges, the covariance is Hotelling-
    // deflated M ← M − λ v̂v̂ᵀ/(v̂ᵀv̂) with λ = v̂ᵀMv̂/(v̂ᵀv̂) so the next
    // iteration converges to the next eigenvector. Both divisions run
    // truncate-toward-zero on sign-symmetrized non-negative numerators
    // (BigInt here, HUGEINT `//` in the mirrored oracle), so the
    // deflated matrices are the identical integers on both engines.
    // The CORPUS cost does not grow with k: still ONE covariance pass
    // (the d²-bounded mapPartitions accumulator) and one projection
    // pass; the k×12 iteration rounds run on the driver's d×d matrix.
    "emb_pca_topk" -> ((s, dir) => {
      val (centered, m0) = pcaCenteredCov(s, dir)
      val comps = pcaTopComponents(m0, 4)
      centered.select(col("vec_id") +: comps.zipWithIndex.map {
        case (v, k) =>
          Rounding.r6(expr(s"CAST(aggregate(zip_with(c, ${pcaVecLit(v)}, " +
            "(x, w) -> x * w), 0L, (a, b) -> a + b) AS DOUBLE)" +
            " / 1000000000000.0")).as(s"pc${k + 1}")
      }: _*)
    }),

    // PCA WHITENING — the embedding pre-processing step that makes
    // downstream cosine/quantization isotropic: each vector's top-4
    // principal coordinates rescaled to unit variance, w_k =
    // (cᵀv̂_k) · √n / √(v̂ᵀ_k M v̂_k) (the Rayleigh numerator IS the
    // component's variance numerator, so no extra corpus pass is
    // spent estimating it). Same all-exact-integer contract as
    // emb_pca_topk: the only doubles are the final √ and divide,
    // applied to integers both engines derived identically — the
    // numerators ride into the SQL as DECIMAL(38,0) literals
    // (they exceed int64 at d=64·micro² scale). Corpus cost: the ONE
    // covariance pass + one projection pass, same as emb_pca_topk;
    // the whitening scales are driver literals.
    "emb_whiten" -> ((s, dir) => {
      val (centered, m0) = pcaCenteredCov(s, dir)
      val comps = pcaTopComponentsVar(m0, 4)
      val n = centered.count()
      centered.select(col("vec_id") +: comps.zipWithIndex.map {
        case ((v, num, _), k) =>
          val dot = s"CAST(aggregate(zip_with(c, ${pcaVecLit(v)}, " +
            "(x, w) -> x * w), 0L, (a, b) -> a + b) AS DOUBLE)"
          (if (num <= 0) lit(null).cast("double")
          else Rounding.r6(expr(s"$dot * sqrt(CAST(${n}L AS DOUBLE)) " +
            s"/ sqrt(CAST(CAST('$num' AS DECIMAL(38,0)) AS DOUBLE))")))
            .as(s"w${k + 1}")
      }: _*)
    }))

  /** Exact-integer PCA base shared by emb_pca1 / emb_pca_topk:
    * micro-quantized centered frame (column `c`) and the d×d centered
    * covariance as BigInt. Cov cells accumulate in a per-partition
    * long array (exact) and shuffle d²·partitions rows — NOT the
    * d²·vectors an inline pair explode would move; the merged sums are
    * the same integers. The d² collect is fixed-size whatever the
    * corpus (broadcast-build-side posture, not a data-sized collect).
    */
  private[graft] def pcaCenteredCov(s: SparkSession, dir: String)
      : (DataFrame, Array[Array[BigInt]]) = {
    val e = emb(s, dir).select(col("vec_id").cast("long").as("vec_id"),
      expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
        "x -> CAST(round(x * 1000000.0) AS BIGINT))").as("xi"))
    val meansRows = e.select(posexplode(col("xi")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(expr("CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(1) AS DOUBLE))" +
        " AS BIGINT)").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val mArr =
      if (meansRows.isEmpty) "CAST(array() AS ARRAY<BIGINT>)"
      else meansRows.map(_._2 + "L").mkString("array(", ",", ")")
    val centered = e.withColumn("c",
      expr(s"zip_with(xi, $mArr, (x, m) -> x - m)"))
    val covSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.LongType)))
    val covRows = centered.select(col("c"))
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        var acc: Array[Long] = null
        var dd = 0
        it.foreach { r =>
          // one unbox per component — the d² inner loop then runs on
          // a primitive array (boxed Seq indexing costs ~10× here)
          val c: Array[Long] = r.getSeq[Long](0).toArray
          if (acc == null) { dd = c.length; acc = new Array[Long](dd * dd) }
          var i = 0
          while (i < dd) {
            val ci = c(i); var j = 0
            while (j < dd) { acc(i * dd + j) += ci * c(j); j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else (0 until dd * dd).iterator.map(k =>
          org.apache.spark.sql.Row(k / dd, k % dd, acc(k)))
      }(org.apache.spark.sql.Encoders.row(covSchema))
      .groupBy("i", "j").agg(sum(col("p")).as("mij"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val d = if (meansRows.isEmpty) 0 else meansRows.length
    val M = Array.fill(d, d)(BigInt(0))
    covRows.foreach { case (i, j, v) => M(i)(j) = BigInt(v) }
    (centered, M)
  }

  /** Top-k deflated components of the BigInt covariance (the driver
    * loop of emb_pca_topk, exposed for OpsSpec's orthogonality pin):
    * power-iterate, Hotelling-deflate with sign-symmetrized truncating
    * divisions, repeat. */
  private[graft] def pcaTopComponents(
      m0: Array[Array[BigInt]], k: Int): Seq[Array[BigInt]] =
    pcaTopComponentsVar(m0, k).map(_._1)

  /** [[pcaTopComponents]] plus each component's Rayleigh numerator
    * `num = v̂ᵀMv̂` and denominator `den = v̂ᵀv̂` against the matrix it
    * converged on — `num/(den·n)` is the component's variance in
    * micro² units, the whitening scale of emb_whiten. */
  private[graft] def pcaTopComponentsVar(
      m0: Array[Array[BigInt]], k: Int)
      : Seq[(Array[BigInt], BigInt, BigInt)] = {
    val d = m0.length
    var m = m0
    (1 to k).map { _ =>
      // 24 rounds (vs pca1's 12): deflation compounds convergence
      // error — the residue of an unconverged component leaks into
      // every later one, and the gate covariance's small eigengaps
      // left v1·v2 at ~0.05 after 12 rounds (OpsSpec pins < 0.05)
      val v = pcaPowerIter(m, rounds = 24)
      val den = v.map(q => q * q).foldLeft(BigInt(0))(_ + _)
      var num = BigInt(0)
      if (den > 0) {
        num = (0 until d).map(i => (0 until d)
          .map(j => v(i) * m(i)(j) * v(j)).foldLeft(BigInt(0))(_ + _))
          .foldLeft(BigInt(0))(_ + _)
        val lam = if (num >= 0) num / den else -((-num) / den)
        val prev = m
        m = Array.tabulate(d, d) { (i, j) =>
          val t = lam * v(i) * v(j)
          prev(i)(j) - (if (t >= 0) t / den else -((-t) / den))
        }
      }
      (v, num, den)
    }
  }

  /** 12 exact-integer power-iteration rounds with per-round
    * truncate-toward-zero max-norm requantize and first-nonzero-
    * positive sign canon (emb_pca1's loop, verbatim). */
  private def pcaPowerIter(
      m: Array[Array[BigInt]], rounds: Int = 12): Array[BigInt] = {
    val d = m.length
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to rounds) {
      val wv = Array.tabulate(d)(i =>
        (0 until d).map(j => m(i)(j) * v(j)).foldLeft(BigInt(0))(_ + _))
      val mx = if (d == 0) BigInt(0) else wv.map(_.abs).max
      if (mx > 0)
        v = wv.map(t =>
          if (t >= 0) t * 1000000 / mx else -((-t) * 1000000 / mx))
    }
    if (v.exists(_ != 0) && v.find(_ != 0).get < 0) v = v.map(-_)
    v
  }

  private def pcaVecLit(v: Array[BigInt]): String =
    if (v.isEmpty) "CAST(array() AS ARRAY<BIGINT>)"
    else v.map(_.toString + "L").mkString("array(", ",", ")")

  /** NN-descent oracle chain: LSH same-bucket top-3 init (k0), then two
    * friend-of-friend rounds — undirected edge set, DISTINCT candidate
    * union with the current lists (mirrors Spark's union+distinct),
    * re-score, top-3 — ending in `k2(a, b, sim, rank)`. */
  private[queries] val nndescentChainDuck: String = {
    def round(r: Int): String =
      s"""u${r - 1} AS (SELECT a, b FROM k${r - 1}
         |  UNION SELECT b, a FROM k${r - 1}),
         |c$r AS (SELECT DISTINCT p.a, q.b FROM u${r - 1} p
         |    JOIN u${r - 1} q ON p.b = q.a WHERE p.a <> q.b
         |  UNION SELECT a, b FROM k${r - 1}),
         |s$r AS (SELECT c.a, c.b,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM c$r c JOIN en x ON x.vec_id = c.a
         |  JOIN en y ON y.vec_id = c.b),
         |k$r AS (SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY a ORDER BY sim DESC, b)::BIGINT AS rank FROM s$r)
         |  WHERE rank <= 3)""".stripMargin
    s"""$embBase,
       |es0 AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
       |es AS (SELECT *, row_number() OVER (
       |    PARTITION BY sig ORDER BY vec_id)::BIGINT AS rn FROM es0),
       |bp AS (SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM es x JOIN es y ON x.sig = y.sig AND x.vec_id <> y.vec_id
       |    AND abs(x.rn - y.rn) <= $NndInitCap),
       |rp AS (SELECT a, b FROM (
       |    SELECT vec_id AS a, ((vec_id % $P) * (2*j + 1) + j * 7919 + 1)
       |      % $P % greatest(1, (SELECT count(*) FROM embeddings)) AS b
       |    FROM en, unnest(generate_series(1, 3)) AS u(j))
       |  WHERE a <> b),
       |c0 AS (SELECT a, b FROM bp UNION SELECT a, b FROM rp),
       |s0 AS (SELECT c.a, c.b,
       |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
       |  FROM c0 c JOIN en x ON x.vec_id = c.a
       |  JOIN en y ON y.vec_id = c.b),
       |k0 AS (SELECT * FROM (SELECT *, row_number() OVER (
       |    PARTITION BY a ORDER BY sim DESC, b)::BIGINT AS rank FROM s0)
       |  WHERE rank <= 3),
       |${round(1)},
       |${round(2)}""".stripMargin
  }

  /** The shared emb_pca_topk / emb_whiten DuckDB chain: four deflated
    * components, each emb_pca1's power iteration unrolled as 24
    * HUGEINT layers (bit-identical arithmetic to the Scala BigInt
    * loop), followed by the Hotelling deflation mm{c} = mm{c-1} -
    * lambda*vv^T/(v^Tv) with both divisions trunc-toward-zero on
    * sign-symmetrized non-negative numerators -- the exact mirror of
    * the driver-side pcaTopComponentsVar. MATERIALIZED throughout:
    * vf{c} is referenced 5x and each plain-CTE reference would
    * re-expand its whole 24-layer chain. dn{c}/nm{c} (the Rayleigh
    * denominator/numerator) emit for EVERY component -- emb_whiten
    * reads all four; emb_pca_topk leaves nm4/dn4 unreferenced and the
    * optimizer prunes them. */
  private def pcaTopChainDuck: String = {
    def layers(c: Int): String = (1 to 24).map { k =>
      val (pv, w, x, nv) =
        (s"v${c}_${k - 1}", s"w${c}_$k", s"x${c}_$k", s"v${c}_$k")
      s"""$w AS MATERIALIZED (SELECT m.i, sum(m.mij * $pv.q) AS w
         |  FROM mm${c - 1} m JOIN $pv ON m.j = $pv.i GROUP BY 1),
         |$x AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM $w),
         |$nv AS MATERIALIZED (SELECT $w.i,
         |    CASE WHEN $x.mx = 0 THEN $pv.q
         |      WHEN $w.w >= 0 THEN ($w.w * 1000000) // $x.mx
         |      ELSE -(((-$w.w) * 1000000) // $x.mx) END AS q
         |  FROM $w JOIN $pv ON $w.i = $pv.i CROSS JOIN $x)""".stripMargin
    }.mkString(",\n")
    def comp(c: Int): String = {
      val deflate =
        if (c == 4) ""
        else s""",
          |lm$c AS MATERIALIZED (SELECT
          |    CASE WHEN den IS NULL OR den = 0 THEN 0::HUGEINT
          |      WHEN num >= 0 THEN num // den
          |      ELSE -((-num) // den) END AS lam FROM nm$c, dn$c),
          |mm$c AS MATERIALIZED (SELECT m.i, m.j,
          |    m.mij - (CASE WHEN dn.den = 0 THEN 0::HUGEINT
          |      WHEN lm.lam * a.q * b.q >= 0
          |        THEN (lm.lam * a.q * b.q) // dn.den
          |      ELSE -((-(lm.lam * a.q * b.q)) // dn.den) END) AS mij
          |  FROM mm${c - 1} m JOIN vf$c a ON m.i = a.i
          |  JOIN vf$c b ON m.j = b.i, lm$c lm, dn$c dn)""".stripMargin
      s"""v${c}_0 AS MATERIALIZED (SELECT dim AS i, 1000000::HUGEINT AS q
         |  FROM mn),
         |${layers(c)},
         |sg$c AS (SELECT coalesce((SELECT CASE WHEN q < 0 THEN -1 ELSE 1 END
         |    FROM v${c}_24 WHERE q <> 0 ORDER BY i LIMIT 1), 1) AS s),
         |vf$c AS MATERIALIZED (SELECT i, q * (SELECT s FROM sg$c) AS q
         |  FROM v${c}_24),
         |proj$c AS MATERIALIZED (SELECT cx.vec_id,
         |    sum(cx.c::HUGEINT * vf$c.q) AS p
         |  FROM cx JOIN vf$c ON cx.dim = vf$c.i GROUP BY 1),
         |dn$c AS MATERIALIZED (SELECT sum(q * q) AS den FROM vf$c),
         |nm$c AS MATERIALIZED (SELECT sum(a.q * m.mij * b.q) AS num
         |  FROM mm${c - 1} m JOIN vf$c a ON m.i = a.i
         |  JOIN vf$c b ON m.j = b.i)$deflate""".stripMargin
    }
    s"""e AS MATERIALIZED (SELECT vec_id::BIGINT AS vec_id,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xi
       |  FROM embeddings),
       |px AS MATERIALIZED (SELECT vec_id, unnest(xi) AS x,
       |    generate_subscripts(xi, 1) - 1 AS dim FROM e),
       |mn AS MATERIALIZED (SELECT dim,
       |    CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |      AS BIGINT) AS m
       |  FROM px GROUP BY 1),
       |cx AS MATERIALIZED (SELECT vec_id, dim, x - m AS c
       |  FROM px JOIN mn USING (dim)),
       |mm0 AS MATERIALIZED (SELECT a.dim AS i, b.dim AS j,
       |    sum(a.c::HUGEINT * b.c) AS mij
       |  FROM cx a JOIN cx b USING (vec_id) GROUP BY 1, 2),
       |${comp(1)},
       |${comp(2)},
       |${comp(3)},
       |${comp(4)}""".stripMargin
  }

  private def pcaPcColDuck(c: Int): String =
    s"""(round((CAST(p$c.p AS DOUBLE) / 1000000000000.0)
       |   * 1000000.0) / 1000000.0 + 0.0) AS pc$c""".stripMargin

  val oracles: Map[String, String] = Map(

    "sim_nndescent" ->
      s"""WITH $nndescentChainDuck
         |SELECT a AS q_id, b AS n_id, rank,
         |  (round(sim, 6) + 0.0) AS sim FROM k2""".stripMargin,

    "sim_nndescent_recall" ->
      s"""WITH $nndescentChainDuck,
         |qs AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN en y ON x.vec_id <> y.vec_id),
         |xrk AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM xsims),
         |ex AS (SELECT q_id, n_id FROM xrk WHERE rank <= 3),
         |an AS (SELECT a AS q_id, b AS n_id FROM k2 WHERE a % $TopkSplit = 0)
         |SELECT ex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN an.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN an.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM ex LEFT JOIN an ON an.q_id = ex.q_id AND an.n_id = ex.n_id
         |GROUP BY ex.q_id""".stripMargin,

    "emb_neardup" ->
      s"""WITH $embBase
         |SELECT x.vec_id AS a, y.vec_id AS b,
         |  (round(${dotD("x.v", "y.v")} / (x.nrm * y.nrm), 6) + 0.0) AS sim
         |FROM en x JOIN en y ON x.vec_id < y.vec_id
         |WHERE ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) > 0.3""".stripMargin,

    "sim_topk" ->
      s"""WITH $embBase,
         |qs AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN en y ON x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 5""".stripMargin,

    "emb_ood_knn" ->
      s"""WITH $embBase,
         |oqs AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |osims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM oqs x JOIN en y ON x.vec_id <> y.vec_id),
         |ork AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id) AS rank FROM osims),
         |ok5 AS (SELECT q_id,
         |    round((round(sim, 6) + 0.0) * 1000000.0)::BIGINT AS kth_micro
         |  FROM ork WHERE rank = 5),
         |ok6 AS (SELECT q_id, kth_micro,
         |    1000000 - kth_micro AS ood_micro FROM ok5),
         |ot AS (SELECT count(*)::BIGINT AS nq,
         |    sum(ood_micro)::BIGINT AS so FROM ok6)
         |SELECT q_id,
         |  (round(kth_micro::DOUBLE / 1000000.0, 6) + 0.0) AS kth_sim,
         |  (round(ood_micro::DOUBLE / 1000000.0, 6) + 0.0) AS ood,
         |  (ood_micro * ot.nq > ot.so * 2) AS is_ood
         |FROM ok6 CROSS JOIN ot""".stripMargin,

    "sim_rerank_mmr" ->
      s"""WITH $embBase,
         |mqs AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |msims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM mqs x JOIN en y ON x.vec_id <> y.vec_id),
         |mc AS (SELECT q_id, n_id, (round(sim, 6) + 0.0) AS sim
         |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id) AS rank FROM msims)
         |  WHERE rank <= 5),
         |mp AS (SELECT a.q_id, a.n_id AS ai, b.n_id AS bi,
         |    (round(${dotD("x.v", "y.v")} / (x.nrm * y.nrm), 6) + 0.0)
         |      AS ps
         |  FROM mc a JOIN mc b ON a.q_id = b.q_id AND a.n_id <> b.n_id
         |  JOIN en x ON x.vec_id = a.n_id
         |  JOIN en y ON y.vec_id = b.n_id),
         |ms1 AS (SELECT q_id, n_id, sim FROM (SELECT *,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY sim DESC, n_id) AS r FROM mc) WHERE r = 1),
         |mc2 AS (SELECT c.q_id, c.n_id, c.sim,
         |    CAST(0.7 AS DOUBLE) * c.sim - CAST(0.3 AS DOUBLE) * p.ps
         |      AS score
         |  FROM mc c JOIN ms1 ON c.q_id = ms1.q_id AND c.n_id <> ms1.n_id
         |  JOIN mp p ON p.q_id = c.q_id AND p.ai = c.n_id
         |    AND p.bi = ms1.n_id),
         |ms2 AS (SELECT q_id, n_id, score FROM (SELECT *,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id) AS r FROM mc2) WHERE r = 1),
         |mc3 AS (SELECT c.q_id, c.n_id, c.sim,
         |    CAST(0.7 AS DOUBLE) * c.sim
         |      - CAST(0.3 AS DOUBLE) * greatest(p1.ps, p2.ps) AS score
         |  FROM mc c JOIN ms1 ON c.q_id = ms1.q_id AND c.n_id <> ms1.n_id
         |  JOIN ms2 ON c.q_id = ms2.q_id AND c.n_id <> ms2.n_id
         |  JOIN mp p1 ON p1.q_id = c.q_id AND p1.ai = c.n_id
         |    AND p1.bi = ms1.n_id
         |  JOIN mp p2 ON p2.q_id = c.q_id AND p2.ai = c.n_id
         |    AND p2.bi = ms2.n_id),
         |ms3 AS (SELECT q_id, n_id, score FROM (SELECT *,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id) AS r FROM mc3) WHERE r = 1)
         |SELECT q_id, n_id, 1::BIGINT AS mmr_rank,
         |  (round(CAST(0.7 AS DOUBLE) * sim, 6) + 0.0) AS mmr_score
         |FROM ms1
         |UNION ALL SELECT q_id, n_id, 2::BIGINT,
         |  (round(score, 6) + 0.0) FROM ms2
         |UNION ALL SELECT q_id, n_id, 3::BIGINT,
         |  (round(score, 6) + 0.0) FROM ms3""".stripMargin,

    "sample_hard_negatives" ->
      s"""WITH el AS (SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
         |    embedding::DOUBLE[] AS v FROM embeddings),
         |eln AS (SELECT *, sqrt(${dotD("v", "v")}) AS nrm FROM el),
         |qs AS (SELECT * FROM eln WHERE vec_id % $TopkSplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, x.label AS q_label,
         |    y.vec_id AS n_id, y.label AS n_label,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN eln y ON x.label <> y.label),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, q_label, n_id, n_label, rank,
         |  (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 3""".stripMargin,

    "sim_hybrid_rrf" ->
      s"""WITH $hybridLexDuck,
         |$embBase,
         |$hybridDenseExactDuck,
         |${hybridFuseDuck("x", "ltop", "dtop")}
         |SELECT q_id, doc_id, rank, rrf, lex_rank, dense_rank
         |FROM xtop""".stripMargin,

    "sim_hybrid_rrf_ann" ->
      s"""WITH $hybridLexDuck,
         |$embBase,
         |$ivfKmeansCentsDuck,
         |$hybridDenseAnnDuck,
         |${hybridFuseDuck("a", "ltop", "adtop")}
         |SELECT q_id, doc_id, rank, rrf, lex_rank, dense_rank
         |FROM atop""".stripMargin,

    "sim_hybrid_rrf_ann_recall" ->
      s"""WITH $hybridLexDuck,
         |$embBase,
         |$hybridDenseExactDuck,
         |$ivfKmeansCentsDuck,
         |$hybridDenseAnnDuck,
         |${hybridFuseDuck("x", "ltop", "dtop")},
         |${hybridFuseDuck("a", "ltop", "adtop")}
         |SELECT x.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    ::DOUBLE / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM xtop x LEFT JOIN atop a
         |  ON a.q_id = x.q_id AND a.doc_id = x.doc_id
         |GROUP BY x.q_id""".stripMargin,

    "emb_knn_label" ->
      s"""WITH el AS (SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
         |    embedding::DOUBLE[] AS v FROM embeddings),
         |eln AS (SELECT *, sqrt(${dotD("v", "v")}) AS nrm FROM el),
         |qs AS (SELECT * FROM eln WHERE vec_id % $TopkSplit = 0),
         |cs AS (SELECT * FROM eln WHERE vec_id % 10 <> 0),
         |sims AS (SELECT x.vec_id AS q_id, x.label AS label,
         |    y.vec_id AS n_id, y.label AS n_label,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN cs y ON true),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id) AS rank FROM sims),
         |vt AS (SELECT q_id, label, n_label, count(*)::BIGINT AS votes
         |  FROM rk WHERE rank <= 5 GROUP BY q_id, label, n_label),
         |wv AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY votes DESC, n_label) AS vr FROM vt)
         |SELECT q_id, label, n_label AS pred_label, votes,
         |  (label = n_label)::BIGINT AS agree FROM wv WHERE vr = 1""".stripMargin,

    "sim_mips" ->
      s"""WITH $embBase,
         |qs AS (SELECT * FROM eb WHERE vec_id % $TopkSplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} AS ip
         |  FROM qs x JOIN eb y ON x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(ip, 6) + 0.0) AS ip FROM rk WHERE rank <= 3""".stripMargin,

    "sim_mips_ann" ->
      s"""WITH $embBase,
         |m2 AS (SELECT max(${dotD("v", "v")}) AS m2 FROM eb),
         |da AS (SELECT vec_id, v AS vq,
         |    list_append(v, sqrt(greatest(0.0::DOUBLE, m2.m2 - ${dotD("v", "v")}))) AS v
         |  FROM eb CROSS JOIN m2),
         |ds AS (SELECT vec_id, vq, ${sigD(annBitsD)} AS sig FROM da),
         |qa AS (SELECT vec_id, vq, list_append(vq, 0.0::DOUBLE) AS v
         |  FROM da WHERE vec_id % $TopkSplit = 0),
         |qsg AS (SELECT vec_id AS q_id, vq AS qv, ${sigD(annBitsD)} AS sig FROM qa),
         |sims AS (SELECT q.q_id, d.vec_id AS n_id, ${dotD("q.qv", "d.vq")} AS ip
         |  FROM qsg q JOIN ds d ON q.sig = d.sig AND q.q_id <> d.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(ip, 6) + 0.0) AS ip FROM rk WHERE rank <= 3""".stripMargin,

    "sim_mips_recall" ->
      s"""WITH $embBase,
         |qs AS (SELECT * FROM eb WHERE vec_id % $TopkSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} AS ip
         |  FROM qs x JOIN eb y ON x.vec_id <> y.vec_id),
         |ex AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY ip DESC, n_id) AS rank FROM xsims)
         |  WHERE rank <= 3),
         |m2 AS (SELECT max(${dotD("v", "v")}) AS m2 FROM eb),
         |da AS (SELECT vec_id, v AS vq,
         |    list_append(v, sqrt(greatest(0.0::DOUBLE, m2.m2 - ${dotD("v", "v")}))) AS v
         |  FROM eb CROSS JOIN m2),
         |ds AS (SELECT vec_id, vq, ${sigD(annBitsD)} AS sig FROM da),
         |qa AS (SELECT vec_id, vq, list_append(vq, 0.0::DOUBLE) AS v
         |  FROM da WHERE vec_id % $TopkSplit = 0),
         |qsg AS (SELECT vec_id AS q_id, vq AS qv, ${sigD(annBitsD)} AS sig FROM qa),
         |asims AS (SELECT q.q_id, d.vec_id AS n_id, ${dotD("q.qv", "d.vq")} AS ip
         |  FROM qsg q JOIN ds d ON q.sig = d.sig AND q.q_id <> d.vec_id),
         |an AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY ip DESC, n_id) AS rank FROM asims)
         |  WHERE rank <= 3)
         |SELECT ex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN an.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
         |  (round(sum(CASE WHEN an.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM ex LEFT JOIN an ON an.q_id = ex.q_id AND an.n_id = ex.n_id
         |GROUP BY ex.q_id""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH $embBase,
         |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM es x JOIN es y ON x.sig = y.sig AND x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 3""".stripMargin,

    "emb_neardup_incremental" ->
      s"""WITH $embBase,
         |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
         |sh AS (SELECT * FROM es WHERE vec_id % 20 = 3),
         |co AS (SELECT * FROM es WHERE vec_id % 20 <> 3)
         |SELECT x.vec_id AS a, y.vec_id AS b,
         |  (round(${dotD("x.v", "y.v")} / (x.nrm * y.nrm), 6) + 0.0) AS sim
         |FROM sh x JOIN co y ON x.sig = y.sig
         |WHERE ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) > 0.3""".stripMargin,

    "sim_ann_stats" ->
      s"""WITH $embBase,
         |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
         |g AS (SELECT sig, count(*)::BIGINT AS c FROM es GROUP BY 1)
         |SELECT $annBitsD AS bits, sum(c)::BIGINT AS n_vectors,
         |  count(*)::BIGINT AS n_buckets, max(c)::BIGINT AS max_bucket,
         |  sum(c * (c - 1) // 2)::BIGINT AS n_cand_pairs FROM g
         |HAVING count(*) > 0""".stripMargin,

    "sim_knn_graph" ->
      s"""WITH $embBase,
         |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM es x JOIN es y ON x.sig = y.sig AND x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims),
         |knn AS (SELECT q_id, n_id FROM rk WHERE rank <= 3),
         |mut AS (SELECT k.q_id, k.n_id FROM knn k
         |  JOIN knn r ON r.q_id = k.n_id AND r.n_id = k.q_id),
         |deg AS (SELECT q_id AS vec_id, count(*)::BIGINT AS deg FROM mut GROUP BY 1)
         |SELECT coalesce(deg.deg, 0)::BIGINT AS degree, count(*)::BIGINT AS n_nodes
         |FROM (SELECT vec_id::BIGINT AS vec_id FROM embeddings) v
         |LEFT JOIN deg USING (vec_id) GROUP BY 1""".stripMargin,

    "sim_recall" ->
      s"""WITH $embBase,
         |qs AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN en y ON x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM sims),
         |ex AS (SELECT q_id, n_id FROM rk WHERE rank <= 3),
         |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
         |sims2 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM es x JOIN es y ON x.sig = y.sig AND x.vec_id <> y.vec_id),
         |rk2 AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM sims2),
         |an AS (SELECT q_id, n_id FROM rk2
         |  WHERE rank <= 3 AND q_id % $TopkSplit = 0),
         |j AS (SELECT ex.q_id,
         |    CASE WHEN an.n_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM ex LEFT JOIN an
         |    ON ex.q_id = an.q_id AND ex.n_id = an.n_id)
         |SELECT q_id, count(*)::BIGINT AS k, sum(hit)::BIGINT AS n_hits,
         |  (round((CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS recall
         |FROM j GROUP BY 1""".stripMargin,

    "emb_neardup_lsh" ->
      s"""WITH $embBase,
         |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en)
         |SELECT x.vec_id AS a, y.vec_id AS b,
         |  (round(${dotD("x.v", "y.v")} / (x.nrm * y.nrm), 6) + 0.0) AS sim
         |FROM es x JOIN es y ON x.sig = y.sig AND x.vec_id < y.vec_id
         |WHERE ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) > 0.3""".stripMargin,

    "sim_ivf" ->
      s"""WITH $embBase,
         |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en WHERE vec_id < $ivfNlistD),
         |asg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cents c),
         |asg1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM asg0),
         |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM asg1 WHERE crank = 1),
         |qs AS (SELECT * FROM assigned WHERE vec_id % $IvfQuerySplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN assigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 3""".stripMargin,

    "sim_ivf_probe2" ->
      s"""WITH $embBase,
         |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en WHERE vec_id < $ivfNlistD),
         |asg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cents c),
         |asg1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM asg0),
         |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM asg1 WHERE crank = 1),
         |qs AS (SELECT vec_id, v, nrm, c_id AS cell FROM asg1
         |  WHERE crank <= 2 AND vec_id % $IvfQuerySplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN assigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 3""".stripMargin,

    "emb_mrl_recall" ->
      s"""WITH $embBase,
         |dk AS (SELECT greatest(1, coalesce(max(len(v)), 0) // 4) AS k1,
         |    greatest(1, coalesce(max(len(v)), 0) // 2) AS k2 FROM eb),
         |t1 AS (SELECT vec_id, v[1:dk.k1] AS vk FROM eb CROSS JOIN dk),
         |n1 AS (SELECT *, sqrt(${dotD("vk", "vk")}) AS nrm FROM t1),
         |q1 AS (SELECT * FROM n1 WHERE vec_id % $TopkSplit = 0),
         |s1 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.vk", "y.vk")} / (x.nrm * y.nrm) AS sim
         |  FROM q1 x JOIN n1 y ON x.vec_id <> y.vec_id),
         |a1 AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s1)
         |  WHERE rank <= 3),
         |t2 AS (SELECT vec_id, v[1:dk.k2] AS vk FROM eb CROSS JOIN dk),
         |n2 AS (SELECT *, sqrt(${dotD("vk", "vk")}) AS nrm FROM t2),
         |q2 AS (SELECT * FROM n2 WHERE vec_id % $TopkSplit = 0),
         |s2 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.vk", "y.vk")} / (x.nrm * y.nrm) AS sim
         |  FROM q2 x JOIN n2 y ON x.vec_id <> y.vec_id),
         |a2 AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s2)
         |  WHERE rank <= 3),
         |xq AS (SELECT * FROM en WHERE vec_id % $TopkSplit = 0),
         |xs AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN en y ON x.vec_id <> y.vec_id),
         |ex AS MATERIALIZED (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM xs)
         |  WHERE rank <= 3),
         |m1 AS (SELECT (SELECT k1 FROM dk)::BIGINT AS dim_k, ex.q_id,
         |    count(*)::BIGINT AS k,
         |    sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM ex LEFT JOIN a1 a ON a.q_id = ex.q_id AND a.n_id = ex.n_id
         |  GROUP BY ex.q_id),
         |m2 AS (SELECT (SELECT k2 FROM dk)::BIGINT AS dim_k, ex.q_id,
         |    count(*)::BIGINT AS k,
         |    sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM ex LEFT JOIN a2 a ON a.q_id = ex.q_id AND a.n_id = ex.n_id
         |  GROUP BY ex.q_id
         |  HAVING (SELECT k1 FROM dk) <> (SELECT k2 FROM dk)),
         |mm AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
         |SELECT dim_k, q_id, k, n_hits,
         |  (round(n_hits::DOUBLE / k::DOUBLE, 6) + 0.0) AS recall
         |FROM mm""".stripMargin,

    // One WITH: the shared IVF chain feeds both probe depths; the
    // exact side is one window over the % 50 query split.
    "sim_ivf_recall" ->
      s"""WITH $embBase,
         |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en WHERE vec_id < $ivfNlistD),
         |asg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cents c),
         |asg1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM asg0),
         |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM asg1 WHERE crank = 1),
         |qs1 AS (SELECT * FROM assigned WHERE vec_id % $HybridSplit = 0),
         |qs2 AS (SELECT vec_id, v, nrm, c_id AS cell FROM asg1
         |  WHERE crank <= 2 AND vec_id % $HybridSplit = 0),
         |sims1 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs1 x JOIN assigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |sims2 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs2 x JOIN assigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |ivf1 AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM sims1)
         |  WHERE rank <= 3),
         |ivf2 AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM sims2)
         |  WHERE rank <= 3),
         |xq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN en y ON x.vec_id <> y.vec_id),
         |ex AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM xsims)
         |  WHERE rank <= 3),
         |m1 AS (SELECT 'probe1' AS method, ex.q_id, count(*)::BIGINT AS k,
         |    sum(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM ex LEFT JOIN ivf1 i ON i.q_id = ex.q_id AND i.n_id = ex.n_id
         |  GROUP BY ex.q_id),
         |m2 AS (SELECT 'probe2' AS method, ex.q_id, count(*)::BIGINT AS k,
         |    sum(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM ex LEFT JOIN ivf2 i ON i.q_id = ex.q_id AND i.n_id = ex.n_id
         |  GROUP BY ex.q_id),
         |mm AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
         |SELECT method, q_id, k, n_hits,
         |  (round(n_hits::DOUBLE / k::DOUBLE, 6) + 0.0) AS recall
         |FROM mm""".stripMargin,

    "sim_ivf_kmeans" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |asg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cn c),
         |assigned AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM asg0)
         |  WHERE crank = 1),
         |qs AS (SELECT * FROM assigned WHERE vec_id % $IvfQuerySplit = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN assigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 3""".stripMargin,

    "sim_ivf_kmeans_stats" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |iasg0 AS (SELECT e.vec_id, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN kc0 c),
         |icell AS (SELECT 'init' AS method, c_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM iasg0)
         |  WHERE crank = 1),
         |tasg0 AS (SELECT e.vec_id, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cn c),
         |tcell AS (SELECT 'trained' AS method, c_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM tasg0)
         |  WHERE crank = 1),
         |cc AS (SELECT method, cell, count(*)::BIGINT AS cnt
         |  FROM (SELECT * FROM icell UNION ALL SELECT * FROM tcell)
         |  GROUP BY 1, 2)
         |SELECT method, count(*)::BIGINT AS n_cells, max(cnt)::BIGINT AS max_cell,
         |  (round((CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS mean_cell
         |FROM cc GROUP BY 1""".stripMargin,

    "sim_ivf_kmeans_recall" ->
      s"""WITH $embBase,
         |$ivfKmeansCentsDuck,
         |iasg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN kc0 c),
         |iassigned AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM iasg0)
         |  WHERE crank = 1),
         |tasg0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
         |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
         |  FROM en e CROSS JOIN cn c),
         |tassigned AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM tasg0)
         |  WHERE crank = 1),
         |iqs AS (SELECT * FROM iassigned WHERE vec_id % $HybridSplit = 0),
         |tqs AS (SELECT * FROM tassigned WHERE vec_id % $HybridSplit = 0),
         |isims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM iqs x JOIN iassigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |tsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM tqs x JOIN tassigned y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         |itop AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM isims) WHERE rank <= 3),
         |ttop AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM tsims) WHERE rank <= 3),
         |xq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN en y ON x.vec_id <> y.vec_id),
         |ex AS MATERIALIZED (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM xsims) WHERE rank <= 3),
         |m1 AS (SELECT 'init' AS method, ex.q_id, count(*)::BIGINT AS k,
         |    sum(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM ex LEFT JOIN itop i ON i.q_id = ex.q_id AND i.n_id = ex.n_id
         |  GROUP BY ex.q_id),
         |m2 AS (SELECT 'trained' AS method, ex.q_id, count(*)::BIGINT AS k,
         |    sum(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM ex LEFT JOIN ttop t ON t.q_id = ex.q_id AND t.n_id = ex.n_id
         |  GROUP BY ex.q_id),
         |mk AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
         |SELECT method, q_id, k, n_hits,
         |  (round(n_hits::DOUBLE / k::DOUBLE, 6) + 0.0) AS recall
         |FROM mk""".stripMargin,

    "emb_centroids" ->
      """WITH x AS (SELECT label::BIGINT AS label,
        |    unnest(embedding::DOUBLE[]) AS x,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings)
        |SELECT label, dim::BIGINT AS dim, count(*)::BIGINT AS n,
        |  (round(avg(x), 6) + 0.0) AS centroid
        |FROM x GROUP BY 1, 2""".stripMargin,

    "emb_outliers" ->
      """WITH x AS (SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
        |    unnest(embedding::DOUBLE[]) AS x,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |c AS (SELECT *, avg(x) OVER (PARTITION BY label, dim) AS c FROM x),
        |d AS (SELECT vec_id, label,
        |    sum((x - c) * (x - c)) AS dist2 FROM c GROUP BY 1, 2)
        |SELECT vec_id, label, (round(dist2, 6) + 0.0) AS dist2,
        |  dist2 > 2.0 * avg(dist2) OVER (PARTITION BY label) AS is_outlier
        |FROM d""".stripMargin,

    "emb_kmeans" ->
      s"""WITH $kmLloyd1Duck,
         |a2 AS (SELECT vec_id, cluster, d2 FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2, cluster) AS rk FROM x2)
         |  WHERE rk = 1)
         |SELECT vec_id, cluster,
         |  (round((d2) * 1000000.0) / 1000000.0 + 0.0) AS d2
         |FROM a2""".stripMargin,

    "emb_silhouette" ->
      s"""WITH $kmLloyd1Duck,
         |rk AS (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY d2, cluster) AS rk FROM x2),
         |ab AS (SELECT r1.vec_id, r1.cluster,
         |    sqrt(greatest(r1.d2, 0.0::DOUBLE)) AS a,
         |    sqrt(greatest(r2.d2, 0.0::DOUBLE)) AS b
         |  FROM rk r1 JOIN rk r2 ON r2.vec_id = r1.vec_id AND r2.rk = 2
         |  WHERE r1.rk = 1),
         |si AS (SELECT cluster,
         |    CASE WHEN greatest(a, b) <= 0.0::DOUBLE THEN 0.0::DOUBLE
         |      ELSE (b - a) / greatest(a, b) END AS sil FROM ab),
         |sm AS (SELECT cluster,
         |    CAST(round(sil * 1000000.0) AS BIGINT) AS sm FROM si)
         |SELECT cluster, count(*)::BIGINT AS n_vectors,
         |  (round((CAST(sum(sm) AS DOUBLE) / 1000000.0
         |    / CAST(count(*) AS DOUBLE)) * 1000000.0) / 1000000.0 + 0.0)
         |    AS mean_sil
         |FROM sm GROUP BY 1""".stripMargin,

    "emb_pca1" -> {
      // 12 unrolled power-iteration layers; HUGEINT keeps every
      // product exact, mirroring the Scala BigInt loop bit-for-bit.
      // MATERIALIZED everywhere: DuckDB inlines plain CTEs per
      // reference, and 12 chained layers each referencing the previous
      // twice would expand exponentially (symptom: "Too many open
      // files" from re-scanning the parquet thousands of times).
      val iters = (1 to 12).map { k =>
        val (pv, w, x, nv) = (s"v${k - 1}", s"w$k", s"x$k", s"v$k")
        s"""$w AS MATERIALIZED (SELECT m.i, sum(m.mij * $pv.q) AS w
           |  FROM mm m JOIN $pv ON m.j = $pv.i GROUP BY 1),
           |$x AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM $w),
           |$nv AS MATERIALIZED (SELECT $w.i,
           |    CASE WHEN $x.mx = 0 THEN $pv.q
           |      WHEN $w.w >= 0 THEN ($w.w * 1000000) // $x.mx
           |      ELSE -(((-$w.w) * 1000000) // $x.mx) END AS q
           |  FROM $w JOIN $pv ON $w.i = $pv.i CROSS JOIN $x)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (SELECT vec_id::BIGINT AS vec_id,
         |    list_transform(embedding::DOUBLE[],
         |      x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xi
         |  FROM embeddings),
         |px AS MATERIALIZED (SELECT vec_id, unnest(xi) AS x,
         |    generate_subscripts(xi, 1) - 1 AS dim FROM e),
         |mn AS MATERIALIZED (SELECT dim,
         |    CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |      AS BIGINT) AS m
         |  FROM px GROUP BY 1),
         |cx AS MATERIALIZED (SELECT vec_id, dim, x - m AS c
         |  FROM px JOIN mn USING (dim)),
         |mm AS MATERIALIZED (SELECT a.dim AS i, b.dim AS j,
         |    sum(a.c::HUGEINT * b.c) AS mij
         |  FROM cx a JOIN cx b USING (vec_id) GROUP BY 1, 2),
         |v0 AS MATERIALIZED (SELECT dim AS i, 1000000::HUGEINT AS q FROM mn),
         |$iters,
         |sg AS (SELECT coalesce((SELECT CASE WHEN q < 0 THEN -1 ELSE 1 END
         |    FROM v12 WHERE q <> 0 ORDER BY i LIMIT 1), 1) AS s),
         |vf AS (SELECT i, q * (SELECT s FROM sg) AS q FROM v12),
         |proj AS (SELECT cx.vec_id, sum(cx.c::HUGEINT * vf.q) AS p
         |  FROM cx JOIN vf ON cx.dim = vf.i GROUP BY 1)
         |SELECT vec_id,
         |  (round((CAST(p AS DOUBLE) / 1000000000000.0)
         |   * 1000000.0) / 1000000.0 + 0.0) AS pc1
         |FROM proj""".stripMargin
    },

    "emb_pca_topk" ->
      s"""WITH $pcaTopChainDuck
         |SELECT p1.vec_id,
         |  ${pcaPcColDuck(1)},
         |  ${pcaPcColDuck(2)},
         |  ${pcaPcColDuck(3)},
         |  ${pcaPcColDuck(4)}
         |FROM proj1 p1 JOIN proj2 p2 ON p1.vec_id = p2.vec_id
         |JOIN proj3 p3 ON p1.vec_id = p3.vec_id
         |JOIN proj4 p4 ON p1.vec_id = p4.vec_id""".stripMargin,

    "emb_whiten" -> {
      def wCol(c: Int): String =
        s"""CASE WHEN nm$c.num IS NULL OR nm$c.num <= 0 THEN NULL
           |    ELSE (round((CAST(p$c.p AS DOUBLE) * sqrt(nn.n::DOUBLE)
           |      / sqrt(CAST(nm$c.num AS DOUBLE))) * 1000000.0)
           |      / 1000000.0 + 0.0) END AS w$c""".stripMargin
      s"""WITH $pcaTopChainDuck,
         |nn AS (SELECT count(*)::BIGINT AS n FROM e)
         |SELECT p1.vec_id,
         |  ${wCol(1)},
         |  ${wCol(2)},
         |  ${wCol(3)},
         |  ${wCol(4)}
         |FROM proj1 p1 JOIN proj2 p2 ON p1.vec_id = p2.vec_id
         |JOIN proj3 p3 ON p1.vec_id = p3.vec_id
         |JOIN proj4 p4 ON p1.vec_id = p4.vec_id
         |CROSS JOIN nn CROSS JOIN nm1 CROSS JOIN nm2
         |CROSS JOIN nm3 CROSS JOIN nm4""".stripMargin
    })
}
