package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, ConnectedComponents, Multimodal, TextOps}
import graft.functions.GraftFunctions

/** Shared machinery of the four §7.4 extended-operator families
  * (Dedup/Sim/Mm/TextCurationQueries, split out of the 4,170-line
  * ExtQueries in r11): table readers, shingle/minhash/band builders,
  * the IVF index chain, hybrid-retrieval fusion, and every DuckDB SQL
  * fragment the family oracles compose. Visibility stays private[graft]
  * — the public surface is still `ExtQueries.queries`/`oracles`. */
private[graft] object ExtCommon {


  import TextOps._

  private[graft] val NumHash = 12
  private[graft] val Bands = 4

  /** Query-split moduli of the similarity family, hoisted so the Spark
    * builders and the interpolated oracle SQL read the SAME constant
    * and cannot silently desynchronize (r12 advice): [[TopkSplit]] is
    * sim_topk's own query split (vec_id % 10 = 0 ⇒ 10% of the corpus
    * queries); [[IvfQuerySplit]] is the IVF/PQ family's split
    * (vec_id % 25 = 0); the recall twins intersect the two, so their
    * effective split is lcm(10, 25) = 50 — which is exactly
    * [[HybridSplit]], the hybrid-retrieval family's split. Changing
    * any one constant here changes every dependent query AND its
    * oracle together. */
  private[graft] val TopkSplit = 10
  private[graft] val IvfQuerySplit = 25
  private[graft] val HybridSplit = 50

  /** Session-scoped cache of the EXACT similarity ground truths
    * (r13 verdict task 3). Every recall twin joins its ANN result
    * against the exact top-k pool, and before this cache each twin
    * re-ran the block-partitioned all-pairs join from scratch — the
    * dominant cost of a bench pass over the twins (~1.3 s/query
    * marginal vs 0.79 suite-wide at r13). One verify/bench session
    * now pays each exact baseline ONCE per (session, dir):
    * the first caller materializes it behind a localCheckpoint
    * (truncated lineage, |queries|·k rows — tiny), later callers
    * reuse the checkpointed blocks. Queries stay independently
    * runnable (any caller computes on miss), results are
    * byte-identical (the cached frame IS the query's own output),
    * and keys carry the session identity so a restarted session
    * can't resurrect blocks owned by a stopped SparkContext. */
  private val gtCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def cachedExact(name: String, s: SparkSession, dir: String)
      (build: => DataFrame): DataFrame =
    gtCache.computeIfAbsent(
      s"${System.identityHashCode(s.sparkContext)}|$name|$dir",
      _ => build.localCheckpoint())

  /** Exact cosine top-k pool (sim_topk) — shared by the LSH, IVF, BQ,
    * HNSW, graph-walk and NN-descent recall twins. */
  private[graft] def exactTopk(s: SparkSession, dir: String): DataFrame =
    cachedExact("sim_topk", s, dir)(SimQueries.queries("sim_topk")(s, dir))

  /** Exact MIPS top-k pool (sim_mips) — shared by sim_mips_recall. */
  private[graft] def exactMips(s: SparkSession, dir: String): DataFrame =
    cachedExact("sim_mips", s, dir)(SimQueries.queries("sim_mips")(s, dir))

  /** Session-scoped cache for ANN results consumed by recall twins
    * and eval overlays (same mechanism as the exact pools). The
    * STANDALONE query still rebuilds from scratch on every run — its
    * own bench line prices the build honestly; only the measurement
    * overlays reuse, so a twin prices the COMPARISON instead of a
    * second copy of the build it is grading. */
  private[graft] def cachedAnn(name: String, s: SparkSession, dir: String)
      (build: => DataFrame): DataFrame = cachedExact(name, s, dir)(build)

  private[graft] def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  private[graft] def emb(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/embeddings.parquet")
  }

  /** IVF cell count: smallest power of two ≥ ⌊√n⌋, clamped to
    * [16, 4096] — cells grow with the corpus so per-cell candidate
    * lists stay ~√n (a fixed nlist degrades the cell join to (n/k)²
    * at 100 TB). Driver literal from one count job; the oracle mirrors
    * it as a scalar subquery with the identical float-free outcome
    * (floor∘sqrt agrees with integer isqrt for any n < 2⁵¹). */
  private[graft] def ivfNlist(e: DataFrame): Long = {
    val s = math.floor(math.sqrt(e.count().toDouble)).toLong
    var p = 16L
    while (p < s && p < 4096L) p <<= 1
    p
  }

  /** The oracle-side mirror of [[ivfNlist]]. */
  private[queries] val ivfNlistD =
    "(SELECT least(4096, greatest(16, CAST(power(2, " +
      "ceil(log2(greatest(1, floor(sqrt(count(*)))))) ) AS BIGINT)))" +
      " FROM embeddings)"

  /** Untrained IVF init centroids: the [[ivfNlist]] lowest vec_ids of
    * `e(vec_id, v, nrm)` as `(c_id, cv, cnrm)` — the ONE definition
    * of the deterministic coarse-quantizer init every IVF query and
    * the trained chain share. */
  private[graft] def ivfInitCents(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < lit(ivfNlist(e)))
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))

  /** Argmax-cosine cell assignment of `e(vec_id, v, nrm)` against a
    * small centroid table `cents(c_id, cv, cnrm)` (broadcast). The
    * map-side-combinable AGGREGATE form (emb_kmeans' shape): the
    * broadcast crossJoin's nlist-amplified rows collapse to ONE row
    * per vector through partial min-of-struct BEFORE any exchange —
    * the window-function (`row_number`) form would shuffle all
    * n·nlist array-carrying rows to rank them. Ties pick the lowest
    * c_id and NULL csim (zero norms) sorts last, matching
    * `row_number() OVER (ORDER BY csim DESC, c_id)` exactly.
    * Columns: (vec_id, v, nrm, cell). */
  private[graft] def assignCells(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("csim", expr("coalesce(" +
        s"try_divide(${dotS("v", "cv")}, nrm * cnrm)" +
        ", CAST('-Infinity' AS DOUBLE))"))
      .groupBy("vec_id")
      .agg(min(struct(negate(col("csim")).as("ncsim"), col("c_id"),
        col("v"), col("nrm"))).as("m"))
      .select(col("vec_id"), col("m.v").as("v"), col("m.nrm").as("nrm"),
        col("m.c_id").as("cell"))

  /** Full-corpus cell assignment against the TRAINED coarse quantizer
    * of the gate embeddings table. Columns: (vec_id, v, nrm, cell). */
  private[graft] def ivfKmeansAssigned(s: SparkSession, dir: String): DataFrame =
    ivfKmeansIndex(emb(s, dir)
      .select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v")))._2

  /** Trained-IVF index build from an at-rest corpus (vec_id BIGINT,
    * v ARRAY<DOUBLE>): one spherical-Lloyd iteration (init = the
    * [[ivfNlist]] lowest vec_ids, training restricted to the
    * vec_id % 4 hash-sample, the centroid update a micro-quantized
    * integer mean so the only cross-partition float reduction runs
    * over exact longs). Returns (cents(c_id, cv, cnrm) — ≤ nlist rows,
    * localCheckpointed so consumers never re-run the training chain —
    * and assigned(vec_id, v, nrm, cell), the corpus in cell-keyed
    * at-rest form). The full corpus sees exactly ONE broadcast
    * assignment pass; streaming serving collects cents driver-side
    * (bounded by the nlist clamp) and probes `assigned` cell-by-cell. */
  private[graft] def ivfKmeansIndex(corpus: DataFrame): (DataFrame, DataFrame) = {
    GraftFunctions.register(corpus.sparkSession)
    val e = corpus.withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})"))
    val c0 = ivfInitCents(e)
    val a1 = assignCells(e.filter(col("vec_id") % 4 === 0), c0)
      .select(col("cell"), col("v"))
    val c1 = a1
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("xi", expr("CAST(round(x * 1000000.0) AS BIGINT)"))
      .groupBy("cell", "dim")
      .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
      .withColumn("cx", expr("CAST(CAST(round(CAST(sx AS DOUBLE)" +
        " / CAST(n AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1000000.0"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(dim, cx)))," +
        " s -> s.cx)").as("cv"))
      .select(col("cell").as("c_id"), col("cv"),
        expr(s"sqrt(${dotS("cv", "cv")})").as("cnrm"))
      .localCheckpoint()
    (c1, assignCells(e, c1))
  }

  /** Shared hybrid-retrieval lexical side (sim_hybrid_rrf family):
    * BM25 top-20 per query over the vec-aligned doc corpus (id % 50
    * query split) via an inverted-index posting join with the
    * df·4 ≤ n stopword cut. Returns (lexTop(q_id, id, lr), nvec). */
  private[graft] def hybridLexTop(s: SparkSession, dir: String)
      : (DataFrame, Long) = {
    val nvec = emb(s, dir).count()
    val dd = docs(s, dir)
      .select(col("doc_id").cast("long").as("id"),
        expr(toksSpark).as("toks"))
      .filter(col("id") < nvec)
      .localCheckpoint()
    val dl = dd.select(col("id"), size(col("toks")).cast("long").as("dl"))
    val st = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sdl"))
    val tf = dd.select(col("id"), explode(col("toks")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("dfc"))
    val qt = dd.filter(col("id") % HybridSplit === 0)
      .select(col("id").as("q_id"),
        explode(array_distinct(col("toks"))).as("tok"))
    val term = {
      val avgdl = col("sdl").cast("double") / col("nd").cast("double")
      val idf = log(lit(1.0) + (col("nd").cast("double") - col("dfc") + lit(0.5))
        / (col("dfc").cast("double") + lit(0.5)))
      val tfn = (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2)
          * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
      round(idf * tfn * lit(1e6), 0).cast("long")
    }
    // stopword cut BEFORE the posting join — the broadcast df table
    // prunes flood tokens from the query side, so the tok-keyed
    // exchange never fans a stopword's posting list per query
    val goodTok = dfT.filter(col("dfc") * 4 <= nvec)
    val lexTop = qt
      .join(broadcast(goodTok), Seq("tok"))
      .join(tf, Seq("tok"))
      .filter(col("id") =!= col("q_id"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(st))
      .withColumn("tm", term)
      .groupBy("q_id", "id").agg(sum(col("tm")).as("lexm"))
      .withColumn("lr", expr(
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY lexm DESC, id) AS BIGINT)"))
      .filter(col("lr") <= 20)
      .select(col("q_id"), col("id"), col("lr"))
    (lexTop, nvec)
  }

  /** ScaleProbe-facing: posting-join candidate mass of the hybrid
    * lexical side — the (query-token × posting-list) row count the
    * tok-keyed exchange carries WITH the df·4 ≤ n stopword cut
    * (measured by running the real join) and WITHOUT it (computed
    * analytically as Σ_{(q,tok)} df(tok) − |qt| — each query-token row
    * matches its posting list, one entry of which is the query doc
    * itself; materializing the flood join at probe scale would be
    * O(10¹⁰) rows, which is precisely the point). Same toks/tf/df/query
    * construction as [[hybridLexTop]], with n = doc count so the probe
    * corpus needs no embeddings table. Returns
    * (nDocs, qtRows, withCutActual, withCutAnalytic, noCutAnalytic). */
  private[graft] def hybridLexCandidateMass(s: SparkSession, dir: String)
      : (Long, Long, Long, Long, Long) = {
    val dd = docs(s, dir)
      .select(col("doc_id").cast("long").as("id"), expr(toksSpark).as("toks"))
      .localCheckpoint()
    val n = dd.count()
    val tf = dd.select(col("id"), explode(col("toks")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("dfc")).localCheckpoint()
    val qt = dd.filter(col("id") % HybridSplit === 0)
      .select(col("id").as("q_id"),
        explode(array_distinct(col("toks"))).as("tok"))
    val goodTok = dfT.filter(col("dfc") * 4 <= n)
    val withCutActual = qt.join(broadcast(goodTok), Seq("tok"))
      .join(tf, Seq("tok")).filter(col("id") =!= col("q_id")).count()
    // analytic masses: every (q, tok) row fans to df(tok) postings, one
    // of which is q itself (tok came from q's own token set)
    def mass(dfTab: DataFrame): Long = {
      val r = qt.join(dfTab, Seq("tok"))
        .agg(sum(col("dfc")).as("s"), count(lit(1)).as("q")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0) - r.getLong(1)
    }
    val qtRows = qt.count()
    (n, qtRows, withCutActual, mass(goodTok), mass(dfT))
  }

  /** Shared hybrid RRF fuse: full-outer join of the per-query lexical
    * and dense top-20 rank lists, Σ 1/(60 + rank) score, fused top-5.
    * 0 in lex_rank/dense_rank marks "absent from that side's top-20";
    * both rank columns are integers so the fused score is two IEEE
    * divisions and one add — bit-equal on both engines. */
  private[graft] def hybridFuse(lexTop: DataFrame, denseTop: DataFrame)
      : DataFrame =
    lexTop.join(denseTop, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id"),
        coalesce(col("lr"), lit(0L)).as("lex_rank"),
        coalesce(col("dr"), lit(0L)).as("dense_rank"))
      .withColumn("rrf",
        when(col("lex_rank") > 0,
          lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")))
          .otherwise(lit(0.0))
          + when(col("dense_rank") > 0,
            lit(1.0) / (lit(60.0) + col("dense_rank").cast("double")))
            .otherwise(lit(0.0)))
      .withColumn("rank", expr(
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, id) AS BIGINT)"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("id").as("doc_id"), col("rank"),
        Rounding.r6(col("rrf")).as("rrf"),
        col("lex_rank"), col("dense_rank"))

  // ---- shared Spark expression fragments ----
  // Native graft_* expressions (tight JVM loops) replace the HOF
  // formulations on the Spark side; TextOps' HOF strings remain the
  // DuckDB oracle mirrors. Fold order is identical → bit-equal.

  private[graft] val whS = whNativeSpark
  private[graft] val shS = shNativeSpark
  private[graft] val mhS = s"graft_minhash(sh, $NumHash)"
  private[graft] val bandsS = bandsSpark("mh", Bands, 3)
  private[graft] val bkS = s"transform(sequence(0, ${Bands - 1}), j -> CAST(j AS BIGINT) * $P + element_at(bands, j + 1))"

  private[graft] val whD = wordHashesDuck(toksDuck)
  private[graft] val shD = shinglesDuck("wh")
  private[graft] val mhD = minhashDuck("sh", NumHash)
  private[graft] val bandsD = bandsDuck("mh", Bands, 3)
  private[graft] val bkD = s"list_transform(generate_series(0, ${Bands - 1}), j -> j * $P + mbands[j + 1])"

  /** Sequential-fold dot product — identical op order on both engines.
    * Spark side is the native codegen'd [[graft.functions.DotProduct]]
    * (same left-to-right summation as the DuckDB list_reduce fold). */
  private[graft] def dotS(a: String, b: String): String = s"graft_dot($a, $b)"
  private[graft] def dotD(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  /** Deterministic hyperplane sign signature (weights in -11..11,
    * w(j,d) = ((j·131 + d·31) mod 23) − 11 — the modulus must exceed
    * the max plane count or planes repeat: the original mod-7 weights
    * made plane j ≡ plane j+7, capping the corpus at ~2^7 buckets
    * FOREVER regardless of bit count) with an ADAPTIVE plane count:
    * smallest b ∈ [8, 20] with 2^b ≥ n/64, so the expected bucket size
    * stays ~64 as the corpus grows — a fixed 8 planes leaves bucket
    * membership (and the within-bucket pair join) growing linearly
    * with n, i.e. the candidate set quadratic at 100 TB (measured:
    * 40k vectors spent 40+ s in the old fixed buckets; mod-23 at
    * 12 bits cuts candidate pairs 3.6×). Same driver-literal-from-
    * one-count pattern as [[ivfNlist]]; all three gate SFs sit below
    * the floor (4000/64 = 62 < 2^8) so the gate exercises b = 8. */
  private[graft] def annBits(e: DataFrame): Int = {
    val target = math.max(1L, e.count() / 64L)
    var bits = 8
    while ((1L << bits) < target && bits < 20) bits += 1
    bits
  }

  /** Oracle-side mirror of [[annBits]]: ceil∘log2 agrees with the
    * integer doubling loop for any target (log2 of an exact power of
    * two is exact in IEEE; everything else is safely non-integral). */
  private[graft] val annBitsD =
    "least(20, greatest(8, CAST(ceil(log2(greatest(1, " +
      "(SELECT count(*) FROM embeddings) // 64))) AS BIGINT)))"

  private[graft] def sigS(bits: Int): String = s"graft_hplane_sig(v, $bits)"
  private[graft] def sigD(bits: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(0, ($bits) - 1), j -> CASE WHEN " +
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len(v)), d -> v[d] * (((j*131 + (d-1)*31) % 23) - 11)::DOUBLE)), (x, y) -> x + y)" +
      " >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b)"

  /** Band-detection probability 1 − (1 − s^r)^b as a literal
    * multiplication chain over a `jac` column — the SAME expression
    * text runs on both engines (pow() may differ by an ulp across
    * libms; products cannot; the bare 1.0 literals promote to double
    * against the double operand on both). */
  private[graft] def bandDetectP(b: Int, r: Int): String = {
    val sr = List.fill(r)("jac").mkString(" * ")
    val q = s"(1.0 - ($sr))"
    s"1.0 - ${List.fill(b)(q).mkString(" * ")}"
  }

  // Simhash bit width.
  private[graft] val SimBits = 16

  /** Block count for the exact all-pairs block-partitioned joins
    * (emb_neardup / sim_topk): per-task work (n/B)^2, shuffle B·n.
    * At 1000 executors raise B so B^2 ≈ task-slot count.
    */
  private[graft] val PairBlocks = 8

  /** LSH band buckets larger than this are dropped from candidate
    * generation (mirrored in the DuckDB oracle). Bounds within-bucket
    * pairing at MaxBandBucket^2 regardless of corpus skew.
    */
  private[graft] val MaxBandBucket = 64

  /** NN-descent init: a node pairs only with same-bucket mates within
    * this many row_number positions (vec_id order), so a degenerate
    * hot bucket of B near-identical vectors costs B·2·cap init pairs
    * instead of B² (mirrored in the DuckDB oracle). 2× the ~64
    * expected bucket the adaptive [[annBits]] target, and above every
    * gate bucket (max 66 at sf0.1) so the gate pair sets match the
    * uncapped join exactly. */
  private[graft] val NndInitCap = 128

  /** Exact 3-gram-shingle jaccard over a candidate pair (raw — callers
    * round for output, filter on the raw value).
    */
  /** Nearest-centroid assignment by euclidean d², min-of-struct
    * (map-side combinable; ties by cluster id) — shared by emb_kmeans
    * and emb_silhouette. `cents` is (cluster, c). */
  private[graft] def assignEuclid(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", expr(
        "graft_dot(v, v) - 2.0 * graft_dot(v, c) + graft_dot(c, c)"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cluster"), col("v"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"),
        col("m.d2").as("d2"), col("m.v").as("v"))

  /** One Lloyd round of euclidean k-means (k = 8, init = the 8 lowest
    * vec_ids; micro-quantized integer mean update) → (cluster, c). */
  private[graft] def lloyd1Cents(e: DataFrame): DataFrame = {
    val c0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("v").as("c"))
    assignEuclid(e, c0)
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("xi", expr("CAST(round(x * 1000000.0) AS BIGINT)"))
      .groupBy("cluster", "dim")
      .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
      .withColumn("cx", expr("CAST(CAST(round(CAST(sx AS DOUBLE)" +
        " / CAST(n AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1000000.0"))
      .groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(struct(dim, cx)))," +
        " s -> s.cx)").as("c"))
  }

  private[queries] def jaccardExpr: Column =
    expr("CAST(size(array_intersect(array_distinct(sha), array_distinct(shb))) AS DOUBLE) / CAST(size(array_union(array_distinct(sha), array_distinct(shb))) AS DOUBLE)")

  /** MinHash-LSH candidate pairs (a < b) with signatures and shingle
    * sets attached — shared by the pair-report and kept-corpus queries.
    *
    * Band-skew guard: a boilerplate-heavy corpus floods one band bucket
    * and the within-bucket pairing degrades to quadratic in the flood
    * size, so bucket membership is capped at [[MaxBandBucket]] (floods
    * that large are exact-dup shaped and belong to dedup_exact's
    * hash-groupBy). The count window partitions on bk — the same key
    * the candidate join shuffles on — so ONE exchange feeds the window
    * and both join sides (verified in PlanSpec).
    *
    * Scale shape: the band exchange, the candidate self-join, and the
    * pair dedup carry (doc_id, bk) ONLY — two longs per banded row.
    * The expensive text hashing runs once into the checkpointed sigs
    * table; minhash signatures and distinct shingle sets join back BY
    * ID after the pair dedup, so a doc's arrays move once per unique
    * surviving pair side, never once per band per collision (the
    * posture [[jaccardJoinExact]] proves; PlanSpec pins that no
    * array-typed column rides a bk- or pair-keyed exchange).
    * jaccard/est still run once per unique pair. */
  private[queries] def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val (sigs, banded) = lshTables(s, dir)
    attachSigs(bandIdPairs(banded), sigs)
  }

  /** Candidate (a, b) id-pairs only — for consumers that never touch
    * signatures or shingles (edit-distance verification joins texts by
    * id itself), skipping the sigs join-back entirely. */
  private[queries] def minhashIdPairs(s: SparkSession, dir: String): DataFrame =
    bandIdPairs(lshTables(s, dir)._2)

  private[graft] def bandIdPairs(banded: DataFrame): DataFrame =
    banded.as("x").hint("shuffle_hash")
      .join(banded.as("y").hint("shuffle_hash"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .dropDuplicates("a", "b")

  /** (sigs, banded): the two checkpointed tables the LSH family is
    * built from — the per-doc signature table (doc_id, shd, mh) and
    * the bucket-capped banded rows (doc_id, bk). `banded` is what a
    * persisted LSH band INDEX is at scale: built once over the
    * corpus, re-read by every probe (full self-join or incremental
    * shard) without recomputing the text hashing or the cap window. */
  private[graft] def lshTables(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sigs = docs(s, dir)
      .withColumn("wh", expr(whS))
      .withColumn("sh", expr(shS))
      .filter(expr("size(sh) > 0"))
      .withColumn("mh", expr(mhS))
      .select(col("doc_id").cast("long").as("doc_id"),
        expr("array_distinct(sh)").as("shd"), col("mh"))
      .localCheckpoint()
    val banded = sigs
      .withColumn("bands", expr(bandsS))
      .select(col("doc_id"), explode(expr(bkS)).as("bk"))
      .withColumn("_bn", expr("count(1) OVER (PARTITION BY bk)"))
      .filter(col("_bn") <= MaxBandBucket)
      .drop("_bn")
      .localCheckpoint()
    (sigs, banded)
  }

  /** The LSH hash pipeline applied to any (… text …) frame as pure
    * per-row codegen'd projections — no window, no shuffle, so it is
    * legal on a STREAM as well as a batch frame. Adds `shd` (distinct
    * shingle set) and `bks` (band-key array) next to the input's own
    * columns; rows with no shingles drop (the batch filter). Streaming
    * consumers explode `bks` and probe a static band index
    * ([[graft.streaming.StreamingLshDedup]]); the batch [[lshTables]]
    * derives its checkpointed tables from the same fragments. */
  private[graft] def lshDocSigs(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    d.withColumn("wh", expr(whS))
      .withColumn("sh", expr(shS))
      .filter(expr("size(sh) > 0"))
      .withColumn("mh", expr(mhS))
      .withColumn("bands", expr(bandsS))
      .withColumn("shd", expr("array_distinct(sh)"))
      .withColumn("bks", expr(bkS))
      .drop("wh", "sh", "mh", "bands")
  }

  /** Band-bucket cap shared with the streaming index builder. */
  private[graft] def maxBandBucket: Int = MaxBandBucket

  /** Join minhash signatures + distinct shingle sets back onto an
    * (a, b) id-pair set — arrays move once per surviving pair side,
    * keyed by id, never through the band fan-out. */
  private[graft] def attachSigs(pairs: DataFrame, sigs: DataFrame): DataFrame =
    pairs
      .join(sigs.select(col("doc_id").as("a"), col("mh").as("mha"),
        col("shd").as("sha")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("mh").as("mhb"),
        col("shd").as("shb")), Seq("b"))

  /** EXACT jaccard-threshold similarity join (threshold tNum/tDen)
    * via AllPairs/PPJoin prefix filtering — the scale path for exact
    * text similarity, replacing the O(n²/B) block-partitioned
    * all-pairs. Input `sh` must carry (doc_id, shd) with DISTINCT
    * shingle arrays.
    *
    * Candidate generation is lossless: order every doc's shingles by
    * ascending global document frequency (ties by hash); a pair with
    * jaccard ≥ t shares ≥ ceil(t·|x|) shingles, so it must collide
    * inside each side's first |x| − ceil(t·|x|) + 1 shingles — the
    * prefix join on rare-first tokens generates few candidates, and
    * the verify step recomputes the same intersect/union expression
    * the naive join filtered on, so the result SET is bit-identical.
    * Prefix lengths use pure integer arithmetic (no t·sz double
    * rounding). `queryPred` restricts the LEFT (a) side before the
    * candidate join — the recall query's 10% split.
    *
    * Scale: shuffles are keyed on the 8-byte shingle hash; per-token
    * candidate fan-out is bounded by how many docs rank that token
    * inside their prefix (rare tokens by construction). The one
    * degenerate corpus — thousands of byte-identical docs sharing
    * every prefix — is exact-dup shaped and belongs to dedup_exact's
    * hash-groupBy upstream of any similarity join. */
  private[graft] def jaccardJoinExact(sh: DataFrame, tNum: Int,
      tDen: Int, queryPred: Option[Column] = None): DataFrame = {
    val tok = sh.select(col("doc_id"),
      size(col("shd")).cast("long").as("sz"), explode(col("shd")).as("g"))
    val dfreq = tok.groupBy("g").agg(count(lit(1)).as("df"))
    val pref = tok.hint("shuffle_hash").join(dfreq.hint("shuffle_hash"), Seq("g"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
      .filter(col("rn") <=
        expr(s"sz - (sz * $tNum + ${tDen - 1}) DIV $tDen + 1"))
      .select(col("doc_id"), col("sz"), col("g"))
      // materialize: the self-join sides differ (queryPred filters x),
      // so without this the dfreq shuffle and the prefix ranking
      // window — the two widest stages — would each execute twice.
      .localCheckpoint()
    val xs = queryPred.fold(pref)(p => pref.filter(p))
    // Length filter (also lossless: J ≥ t ⟹ t·|x| ≤ |y| ≤ |x|/t)
    // prunes size-mismatched collisions before the pair dedup.
    val cand = xs.as("x").hint("shuffle_hash")
      .join(pref.as("y").hint("shuffle_hash"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          col("y.sz") * tDen >= col("x.sz") * tNum &&
          col("x.sz") * tDen >= col("y.sz") * tNum)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .dropDuplicates("a", "b")
    cand
      .join(sh.select(col("doc_id").as("a"), col("shd").as("sha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shd").as("shb")), Seq("b"))
      .withColumn("jac",
        expr("CAST(size(array_intersect(sha, shb)) AS DOUBLE)" +
          " / CAST(size(array_union(sha, shb)) AS DOUBLE)"))
      .filter(col("jac") >= lit(tNum.toDouble / tDen))
  }

  /** The (doc_id, distinct-shingle-set) table the exact-similarity
    * queries share; checkpointed — consumers join it to itself. */
  private[graft] def shingleSets(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("wh", expr(whS))
      .withColumn("sh", expr(shS))
      .filter(expr("size(sh) > 0"))
      .select(col("doc_id").cast("long").as("doc_id"),
        expr("array_distinct(sh)").as("shd"))
      .localCheckpoint()



  private[graft] val docToks =
    s"dt AS (SELECT doc_id::BIGINT AS doc_id, text, $toksDuck AS toks FROM documents)"

  private[graft] val docHashes =
    s"""$docToks,
       |dh AS (SELECT *, $whD AS wh FROM dt),
       |ds AS (SELECT *, $shD AS sh FROM dh)""".stripMargin

  /** Shared oracle prefix for the one-Lloyd-round euclidean k-means:
    * CTE chain e → c0 → x1/a1 (init assign) → c1 (integer-mean
    * update) → x2 (all vec × centroid d² pairs) — [[lloyd1Cents]] /
    * [[assignEuclid]] mirrored. Splice as `WITH $kmLloyd1Duck, ...`. */
  private[graft] val kmLloyd1Duck: String =
    s"""e AS (SELECT vec_id::BIGINT AS vec_id,
       |    embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE vec_id < 8),
       |x1 AS (SELECT e.vec_id, e.v, c0.cluster,
       |    ${dotD("e.v", "e.v")} - 2.0 * ${dotD("e.v", "c0.c")}
       |      + ${dotD("c0.c", "c0.c")} AS d2
       |  FROM e CROSS JOIN c0),
       |a1 AS (SELECT vec_id, v, cluster, d2 FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d2, cluster) AS rk FROM x1)
       |  WHERE rk = 1),
       |p1 AS (SELECT cluster,
       |    generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM a1),
       |s1 AS (SELECT cluster, dim,
       |    sum(CAST(round(x * 1000000.0) AS BIGINT))::BIGINT AS sx,
       |    count(*)::BIGINT AS n
       |  FROM p1 GROUP BY 1, 2),
       |c1 AS (SELECT cluster,
       |    list(CAST(CAST(round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       |      AS BIGINT) AS DOUBLE) / 1000000.0 ORDER BY dim) AS c
       |  FROM s1 GROUP BY 1),
       |x2 AS (SELECT e.vec_id, c1.cluster,
       |    ${dotD("e.v", "e.v")} - 2.0 * ${dotD("e.v", "c1.c")}
       |      + ${dotD("c1.c", "c1.c")} AS d2
       |  FROM e CROSS JOIN c1)""".stripMargin

  private[graft] val embBase =
    s"""eb AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |en AS (SELECT *, sqrt(${dotD("v", "v")}) AS nrm FROM eb)""".stripMargin

  /** Shared oracle fragment: the one-Lloyd-iteration trained IVF
    * centroids (init = nlist lowest vec_ids, micro-quantized integer
    * mean update over the vec_id % 4 training sample — mirrors
    * sim_ivf_kmeans' Spark chain); ends in `cn(c_id, cv, cnrm)`,
    * with `kc0` = the untrained init centroids. Splice after
    * [[embBase]] inside a WITH. */
  private[graft] val ivfKmeansCentsDuck: String =
    s"""kc0 AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en WHERE vec_id < $ivfNlistD),
       |ktr AS (SELECT * FROM en WHERE vec_id % 4 = 0),
       |kt0 AS (SELECT t.vec_id, t.v, c.c_id,
       |    ${dotD("t.v", "c.cv")} / (t.nrm * c.cnrm) AS csim
       |  FROM ktr t CROSS JOIN kc0 c),
       |kt1 AS (SELECT c_id AS cell, v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crank FROM kt0)
       |  WHERE crank = 1),
       |kp1 AS (SELECT cell, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM kt1),
       |ks1 AS (SELECT cell, dim,
       |    sum(CAST(round(x * 1000000.0) AS BIGINT))::BIGINT AS sx,
       |    count(*)::BIGINT AS n FROM kp1 GROUP BY 1, 2),
       |kc1 AS (SELECT cell AS c_id,
       |    list(CAST(CAST(round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       |      AS BIGINT) AS DOUBLE) / 1000000.0 ORDER BY dim) AS cv
       |  FROM ks1 GROUP BY 1),
       |cn AS (SELECT c_id, cv, sqrt(${dotD("cv", "cv")}) AS cnrm FROM kc1)""".stripMargin

  /** Shared oracle fragment: hybrid-retrieval lexical BM25 top-20
    * (mirrors [[hybridLexTop]]); ends in `ltop(q_id, id, lr)`.
    * Splice first inside a WITH (defines `nv`). */
  private[graft] val hybridLexDuck: String =
    s"""nv AS (SELECT count(*)::BIGINT AS nvec FROM embeddings),
       |dd AS (SELECT doc_id::BIGINT AS id, $toksDuck AS toks
       |  FROM documents, nv WHERE doc_id::BIGINT < nvec),
       |dl AS (SELECT id, len(toks)::BIGINT AS dl FROM dd),
       |st AS (SELECT count(*)::BIGINT AS nd, sum(dl)::BIGINT AS sdl FROM dl),
       |tf AS (SELECT id, tok, count(*)::BIGINT AS tf
       |  FROM (SELECT id, unnest(toks) AS tok FROM dd) GROUP BY 1, 2),
       |dft AS (SELECT tok, count(*)::BIGINT AS dfc FROM tf GROUP BY 1),
       |qt AS (SELECT id AS q_id, unnest(list_distinct(toks)) AS tok
       |  FROM dd WHERE id % $HybridSplit = 0),
       |po AS (SELECT q.q_id, t.id, t.tf, f.dfc, l.dl
       |  FROM qt q JOIN dft f ON f.tok = q.tok
       |  JOIN tf t ON t.tok = q.tok JOIN dl l ON l.id = t.id, nv
       |  WHERE f.dfc * 4 <= nv.nvec AND t.id <> q.q_id),
       |tm AS (SELECT q_id, id, CAST(round(
       |    ln(1.0 + (nd::DOUBLE - dfc + 0.5) / (dfc::DOUBLE + 0.5))
       |    * ((tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2 * (0.25
       |      + 0.75 * dl::DOUBLE / (sdl::DOUBLE / nd::DOUBLE))))
       |    * 1000000.0) AS BIGINT) AS tm FROM po, st),
       |lx AS (SELECT q_id, id, sum(tm)::BIGINT AS lexm FROM tm GROUP BY 1, 2),
       |lr AS (SELECT q_id, id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY lexm DESC, id)::BIGINT AS lr FROM lx),
       |ltop AS (SELECT * FROM lr WHERE lr <= 20)""".stripMargin

  /** Shared oracle fragment: hybrid exact dense top-20 (the sim_topk
    * all-pairs shape); ends in `dtop(q_id, id, dr)`. Needs
    * [[embBase]]. */
  private[graft] val hybridDenseExactDuck: String =
    s"""hqx AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
       |hds AS (SELECT x.vec_id AS q_id, y.vec_id AS id,
       |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
       |  FROM hqx x JOIN en y ON x.vec_id <> y.vec_id),
       |hdr AS (SELECT q_id, id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, id)::BIGINT AS dr FROM hds),
       |dtop AS (SELECT * FROM hdr WHERE dr <= 20)""".stripMargin

  /** Shared oracle fragment: hybrid ANN dense top-20 via the trained
    * IVF quantizer's cell probe (mirrors sim_hybrid_rrf_ann's dense
    * side); ends in `adtop(q_id, id, dr)`. Needs [[embBase]] and
    * [[ivfKmeansCentsDuck]]. */
  private[graft] val hybridDenseAnnDuck: String =
    s"""aag0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN cn c),
       |aagr AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, c_id) AS crank FROM aag0),
       |aasg AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell
       |  FROM aagr WHERE crank = 1),
       |aqx AS (SELECT vec_id, v, nrm, c_id AS cell FROM aagr
       |  WHERE crank <= 2 AND vec_id % $HybridSplit = 0),
       |ads AS (SELECT x.vec_id AS q_id, y.vec_id AS id,
       |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
       |  FROM aqx x JOIN aasg y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
       |adr AS (SELECT q_id, id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, id)::BIGINT AS dr FROM ads),
       |adtop AS (SELECT * FROM adr WHERE dr <= 20)""".stripMargin

  /** Shared oracle fragment: the RRF fuse of `ltopCte(q_id, id, lr)`
    * and `dtopCte(q_id, id, dr)`, fused top-5 — mirrors
    * [[hybridFuse]]; ends in `${p}top(q_id, doc_id, rank, rrf,
    * lex_rank, dense_rank)`. */
  private[graft] def hybridFuseDuck(p: String, ltopCte: String,
      dtopCte: String): String =
    s"""${p}fu AS (SELECT coalesce(l.q_id, d.q_id) AS q_id,
       |    coalesce(l.id, d.id) AS id,
       |    coalesce(l.lr, 0)::BIGINT AS lex_rank,
       |    coalesce(d.dr, 0)::BIGINT AS dense_rank
       |  FROM $ltopCte l FULL OUTER JOIN $dtopCte d
       |    ON l.q_id = d.q_id AND l.id = d.id),
       |${p}scf AS (SELECT *,
       |    (CASE WHEN lex_rank > 0
       |      THEN 1.0 / (60.0 + lex_rank::DOUBLE) ELSE 0.0 END
       |     + CASE WHEN dense_rank > 0
       |       THEN 1.0 / (60.0 + dense_rank::DOUBLE)
       |       ELSE 0.0 END)::DOUBLE AS rrf FROM ${p}fu),
       |${p}top AS (SELECT q_id, id AS doc_id, rank,
       |    (round(rrf * 1000000.0) / 1000000.0 + 0.0) AS rrf,
       |    lex_rank, dense_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf DESC, id)::BIGINT AS rank FROM ${p}scf)
       |  WHERE rank <= 5)""".stripMargin

  /** Shared oracle fragment: hyperplane-bucketed embedding near-dup
    * pairs at cosine > 0.3 (token-equivalent to emb_neardup_lsh's
    * pair set); ends in `epr(a, b)`. Splice inside a WITH. */
  private[queries] val embPairsDuck: String =
    s"""$embBase,
       |es AS (SELECT *, ${sigD(annBitsD)} AS sig FROM en),
       |epr AS (SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM es x JOIN es y ON x.sig = y.sig AND x.vec_id < y.vec_id
       |  WHERE ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) > 0.3)""".stripMargin

  /** Shared oracle fragment: the UNFILTERED LSH candidate pairs with
    * both shingle sets attached (token-equivalent to `minhashPairs`);
    * ends in `cp(a, b, sha, shb)`. Splice inside a WITH. */
  private[queries] val candPairsDuck: String =
    s"""$docHashes,
       |df AS (SELECT * FROM ds WHERE len(sh) > 0),
       |dm AS (SELECT *, $mhD AS mh FROM df),
       |db AS (SELECT *, $bandsD AS mbands FROM dm),
       |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
       |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
       |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
       |cpid AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id),
       |cp AS (SELECT cpid.a, cpid.b, da.sh AS sha, db2.sh AS shb
       |  FROM cpid JOIN ds da ON da.doc_id = cpid.a
       |  JOIN ds db2 ON db2.doc_id = cpid.b)""".stripMargin

  /** Shared oracle fragment: the LSH jaccard ≥ 0.8 candidate-pair CTE
    * chain (token-equivalent to `minhashPairs(...).filter(jaccard ≥ 0.8)`);
    * ends in `pr(a, b)`. Splice inside a WITH. */
  private[queries] val lshPairsDuck: String =
    s"""$docHashes,
       |df AS (SELECT * FROM ds WHERE len(sh) > 0),
       |dm AS (SELECT *, $mhD AS mh FROM df),
       |db AS (SELECT *, $bandsD AS mbands FROM dm),
       |dk0 AS (SELECT doc_id, sh, mh, unnest($bkD) AS bk FROM db),
       |dkc AS (SELECT *, count(*) OVER (PARTITION BY bk) AS bucket_n FROM dk0),
       |dk AS (SELECT doc_id, sh, mh, bk FROM dkc WHERE bucket_n <= $MaxBandBucket),
       |pr AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM dk x JOIN dk y ON x.bk = y.bk AND x.doc_id < y.doc_id
       |  WHERE len(list_distinct(list_intersect(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE
       |      / len(list_distinct(list_concat(list_distinct(x.sh), list_distinct(y.sh))))::DOUBLE >= 0.8)""".stripMargin

}
