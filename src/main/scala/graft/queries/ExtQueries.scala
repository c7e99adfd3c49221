package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, ConnectedComponents, Multimodal, TextOps}
import graft.functions.GraftFunctions

/** Extended LLM-data-pipeline operators (builder prompt; SURVEY.md §7.4):
  * text analysis, dedup family, embedding similarity, multimodal
  * plumbing — each with a token-equivalent DuckDB oracle.
  *
  * Scale design (100 TB north star):
  *  - text ops are per-row codegen'd HOF projections (no shuffle);
  *  - dedup groupBys shuffle short hashes, not documents;
  *  - MinHash-LSH banding turns O(n²) near-dup into an equi-join on
  *    band keys (the classic shingle→minhash→band→bucket-join);
  *  - brute-force cosine is the correctness baseline; the LSH-bucketed
  *    ANN variant is the scale path (hyperplane sig equi-join);
  *  - multimodal decode streams per-partition, no driver collection.
  */
object ExtQueries {

  import TextOps._

  private val NumHash = 12
  private val Bands = 4

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  private def emb(s: SparkSession, dir: String): DataFrame = {
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
  private def ivfKmeansAssigned(s: SparkSession, dir: String): DataFrame =
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
  private def hybridLexTop(s: SparkSession, dir: String)
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
    val qt = dd.filter(col("id") % 50 === 0)
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
    val qt = dd.filter(col("id") % 50 === 0)
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
  private def hybridFuse(lexTop: DataFrame, denseTop: DataFrame)
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

  private val whS = whNativeSpark
  private val shS = shNativeSpark
  private val mhS = s"graft_minhash(sh, $NumHash)"
  private val bandsS = bandsSpark("mh", Bands, 3)
  private val bkS = s"transform(sequence(0, ${Bands - 1}), j -> CAST(j AS BIGINT) * $P + element_at(bands, j + 1))"

  private val whD = wordHashesDuck(toksDuck)
  private val shD = shinglesDuck("wh")
  private val mhD = minhashDuck("sh", NumHash)
  private val bandsD = bandsDuck("mh", Bands, 3)
  private val bkD = s"list_transform(generate_series(0, ${Bands - 1}), j -> j * $P + mbands[j + 1])"

  /** Sequential-fold dot product — identical op order on both engines.
    * Spark side is the native codegen'd [[graft.functions.DotProduct]]
    * (same left-to-right summation as the DuckDB list_reduce fold). */
  private def dotS(a: String, b: String): String = s"graft_dot($a, $b)"
  private def dotD(a: String, b: String): String =
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
  private def annBits(e: DataFrame): Int = {
    val target = math.max(1L, e.count() / 64L)
    var bits = 8
    while ((1L << bits) < target && bits < 20) bits += 1
    bits
  }

  /** Oracle-side mirror of [[annBits]]: ceil∘log2 agrees with the
    * integer doubling loop for any target (log2 of an exact power of
    * two is exact in IEEE; everything else is safely non-integral). */
  private val annBitsD =
    "least(20, greatest(8, CAST(ceil(log2(greatest(1, " +
      "(SELECT count(*) FROM embeddings) // 64))) AS BIGINT)))"

  private def sigS(bits: Int): String = s"graft_hplane_sig(v, $bits)"
  private def sigD(bits: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(0, ($bits) - 1), j -> CASE WHEN " +
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len(v)), d -> v[d] * (((j*131 + (d-1)*31) % 23) - 11)::DOUBLE)), (x, y) -> x + y)" +
      " >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b)"

  /** Band-detection probability 1 − (1 − s^r)^b as a literal
    * multiplication chain over a `jac` column — the SAME expression
    * text runs on both engines (pow() may differ by an ulp across
    * libms; products cannot; the bare 1.0 literals promote to double
    * against the double operand on both). */
  private def bandDetectP(b: Int, r: Int): String = {
    val sr = List.fill(r)("jac").mkString(" * ")
    val q = s"(1.0 - ($sr))"
    s"1.0 - ${List.fill(b)(q).mkString(" * ")}"
  }

  // Simhash bit width.
  private val SimBits = 16

  /** Block count for the exact all-pairs block-partitioned joins
    * (emb_neardup / sim_topk): per-task work (n/B)^2, shuffle B·n.
    * At 1000 executors raise B so B^2 ≈ task-slot count.
    */
  private val PairBlocks = 8

  /** LSH band buckets larger than this are dropped from candidate
    * generation (mirrored in the DuckDB oracle). Bounds within-bucket
    * pairing at MaxBandBucket^2 regardless of corpus skew.
    */
  private val MaxBandBucket = 64

  /** Exact 3-gram-shingle jaccard over a candidate pair (raw — callers
    * round for output, filter on the raw value).
    */
  /** Nearest-centroid assignment by euclidean d², min-of-struct
    * (map-side combinable; ties by cluster id) — shared by emb_kmeans
    * and emb_silhouette. `cents` is (cluster, c). */
  private def assignEuclid(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", expr(
        "graft_dot(v, v) - 2.0 * graft_dot(v, c) + graft_dot(c, c)"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cluster"), col("v"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"),
        col("m.d2").as("d2"), col("m.v").as("v"))

  /** One Lloyd round of euclidean k-means (k = 8, init = the 8 lowest
    * vec_ids; micro-quantized integer mean update) → (cluster, c). */
  private def lloyd1Cents(e: DataFrame): DataFrame = {
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

  private def bandIdPairs(banded: DataFrame): DataFrame =
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
  private def lshTables(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
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
  private def attachSigs(pairs: DataFrame, sigs: DataFrame): DataFrame =
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
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("wh", expr(whS))
      .withColumn("sh", expr(shS))
      .filter(expr("size(sh) > 0"))
      .select(col("doc_id").cast("long").as("doc_id"),
        expr("array_distinct(sh)").as("shd"))
      .localCheckpoint()

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

    "text_stats" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("n_tokens", expr("CAST(size(toks) AS BIGINT)"))
        .withColumn("n_distinct", expr("CAST(size(array_distinct(toks)) AS BIGINT)"))
        .withColumn("avg_len",
          expr("try_divide(aggregate(transform(toks, t -> CAST(length(t) AS DOUBLE)), 0D, (a, b) -> a + b), CAST(size(toks) AS DOUBLE))"))
        .withColumn("dr", expr("try_divide(CAST(n_distinct AS DOUBLE), CAST(n_tokens AS DOUBLE))"))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("CAST(length(text) AS BIGINT)").as("n_chars_c"),
          // BPE-ish subword count: letter runs, digit runs, single marks
          expr("CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)")
            .as("n_tokens_bpe"),
          col("n_tokens"), col("n_distinct"),
          Rounding.r6(col("avg_len")).as("avg_len"),
          Rounding.r6(col("dr")).as("distinct_ratio"),
          Rounding.r6(expr("least(1.0D, greatest(0.0D, 0.2D + 0.001D * CAST(length(text) AS DOUBLE) + 0.3D * dr - 0.05D * abs(avg_len - 5.0D)))")).as("quality"))),

    // Repetition quality filters (the Gopher-rule family): fraction of
    // 2-gram occurrences taken by the single most frequent 2-gram, and
    // fraction of 3-gram occurrences that are repeats. One explode →
    // per-(doc, gram) count → per-doc fold PER GRAM SIZE — every
    // statistic (top count, total, distinct) comes out of its stream's
    // single aggregation tree, so the tokenize→hash pipeline runs once
    // per stream instead of once per statistic. Gram hashes are the
    // native base-131 fold (no string materialization). Docs too short
    // for any gram re-attach from the cheap id scan with zero fracs.
    "text_repetition" -> ((s, dir) => {
      def gramStats(gram: Int, prefix: String): DataFrame =
        docs(s, dir)
          .withColumn("toks", expr(toksSpark))
          .withColumn("wh", expr(whS))
          .select(col("doc_id").cast("long").as("doc_id"),
            explode(expr(s"graft_shingles(wh, $gram)")).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            max(col("c")).as(s"${prefix}_top"),
            sum(col("c")).as(s"${prefix}_n"),
            count(lit(1)).as(s"${prefix}_d"))
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"))
        .join(gramStats(2, "g2"), Seq("doc_id"), "left")
        .join(gramStats(3, "g3"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          Rounding.r6(coalesce(
            try_divide(col("g2_top").cast("double"), col("g2_n").cast("double")),
            lit(0.0))).as("top2gram_frac"),
          Rounding.r6(coalesce(
            try_divide((col("g3_n") - col("g3_d")).cast("double"),
              col("g3_n").cast("double")),
            lit(0.0))).as("dup3gram_frac"))
        .withColumn("repetitive",
          col("top2gram_frac") > 0.2 || col("dup3gram_frac") > 0.2)
    }),

    // The END-TO-END kept corpus — the composition a training-data
    // pipeline actually ships: drop held-out benchmark docs, low
    // quality, repetitive docs, exact duplicates (keep-lowest-id),
    // near-dup losers, and benchmark-contaminated docs. Every stage is
    // one of this engine's oracle-gated operators; the whole chain is
    // semi/anti joins on doc_id — documents themselves are scanned,
    // never shuffled (only ids and 16-byte hashes move).
    "corpus_clean" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("n_chars"))
        .filter(col("doc_id") % 50 =!= 0) // held-out eval set ≙ text_decontaminate's split
      val highQuality = queries("text_stats")(s, dir)
        .select(col("doc_id"), col("quality"))
        .filter(col("quality") >= 0.5)
      val notRepetitive = queries("text_repetition")(s, dir)
        .filter(!col("repetitive")).select("doc_id")
      val exactKeep = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(col("text")).as("h"))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val nearKeep = queries("dedup_keep")(s, dir).select("doc_id")
      val contaminated = queries("text_decontaminate")(s, dir)
        .filter(col("n_shared") > 0).select("doc_id")
      base.join(highQuality, "doc_id")
        .join(notRepetitive, Seq("doc_id"), "left_semi")
        .join(exactKeep, Seq("doc_id"), "left_semi")
        .join(nearKeep, Seq("doc_id"), "left_semi")
        .join(contaminated, Seq("doc_id"), "left_anti")
    }),

    "text_langid" -> ((s, dir) => {
      val base = docs(s, dir).withColumn("toks", expr(toksSpark))
      val scored = LangMarkers.foldLeft(base) { case (d, (name, ms)) =>
        d.withColumn(s"s_$name", expr(s"CAST(${langScoreSpark("toks", ms)} AS BIGINT)"))
      }
      scored.select(col("doc_id").cast("long").as("doc_id"),
        col("s_determiner"), col("s_relational"), col("s_scan"),
        expr("CASE WHEN s_determiner >= s_relational AND s_determiner >= s_scan THEN 'determiner' " +
          "WHEN s_relational >= s_scan THEN 'relational' ELSE 'scan' END").as("pred"))
    }),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(whS))
        .withColumn("sh", expr(shS))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(fingerprintSpark("wh")).as("fingerprint"),
          expr("CAST(size(sh) AS BIGINT)").as("n_shingles"))),

    // Document chunking: overlapping token windows (size 32, stride 24)
    // — the standard long-document split for training pipelines. Pure
    // codegen'd HOF + explode; chunk count ≈ tokens/stride per doc.
    "text_chunk" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("chunk", explode(expr(
          "transform(sequence(0, CAST(greatest(0, CAST(size(toks) AS BIGINT) - 9) AS INT) DIV 24), " +
            "i -> struct(CAST(i AS BIGINT) AS chunk_idx, " +
            "concat_ws(' ', slice(toks, i*24 + 1, 32)) AS chunk_text))")))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("chunk.chunk_idx").as("chunk_idx"),
          col("chunk.chunk_text").as("chunk_text"),
          expr("CAST(length(chunk.chunk_text) AS BIGINT)").as("chunk_chars"))),

    // Scrub: redact digit runs and collapse whitespace (PII-scrub shape;
    // same RE2-safe patterns on both engines).
    "text_scrub" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        expr("regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>'), '  +', ' ')")
          .as("scrubbed"))),

    // PII exposure report (the audit companion to text_scrub's
    // redaction): per-doc counts of email-shaped tokens, long digit
    // runs, and all number runs — RE2-safe patterns, identical both
    // engines, pure per-row projection.
    "text_pii_report" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        expr("CAST(size(regexp_extract_all(text, " +
          "'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', 0)) AS BIGINT)").as("n_emails"),
        expr("CAST(size(regexp_extract_all(text, '[0-9]{7,}', 0)) AS BIGINT)")
          .as("n_long_digits"),
        expr("CAST(size(regexp_extract_all(text, '[0-9]+', 0)) AS BIGINT)")
          .as("n_nums"))
        .withColumn("has_pii",
          col("n_emails") + col("n_long_digits") > 0)),

    // Per-source dedup retention — the curation dashboard number: how
    // much of each source survives exact and near dedup. Keeper id
    // sets reuse the oracle-gated dedup operators; rates derive from
    // exact counts.
    "corpus_retention_by_source" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"))
      val ek = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(col("text")).as("h"))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val nk = queries("dedup_keep")(s, dir).select("doc_id")
      val tot = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val ne = d.join(ek, Seq("doc_id"), "left_semi")
        .groupBy("source").agg(count(lit(1)).as("n_exact_kept"))
      val nn = d.join(nk, Seq("doc_id"), "left_semi")
        .groupBy("source").agg(count(lit(1)).as("n_near_kept"))
      tot.join(ne, Seq("source"), "left").join(nn, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_exact_kept"), lit(0L)).as("n_exact_kept"),
          coalesce(col("n_near_kept"), lit(0L)).as("n_near_kept"),
          Rounding.r6(expr("CAST(coalesce(n_exact_kept, 0) AS DOUBLE)" +
            " / CAST(n_docs AS DOUBLE)")).as("exact_rate"),
          Rounding.r6(expr("CAST(coalesce(n_near_kept, 0) AS DOUBLE)" +
            " / CAST(n_docs AS DOUBLE)")).as("near_rate"))
    }),

    // Language-ID confusion matrix: predicted marker class × labeled
    // lang, with the share within each label (the quality report for
    // the langid heuristic). Tiny output, two aggregate exchanges.
    "text_lang_confusion" -> ((s, dir) => {
      val wL = Window.partitionBy("lang")
      queries("text_langid")(s, dir).select(col("doc_id"), col("pred"))
        .join(docs(s, dir)
          .select(col("doc_id").cast("long").as("doc_id"), col("lang")),
          Seq("doc_id"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .withColumn("share", Rounding.r6(
          col("n").cast("double") / sum(col("n")).over(wL).cast("double")))
    }),

    // Corpus vocabulary: token document-frequency + total count, top 50.
    "text_wordfreq" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(expr(toksSpark)).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n_total"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_total").desc, col("tok"))
        .limit(50)),

    "dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .select(expr("md5(encode(text, 'utf-8'))").as("h"), col("doc_id").cast("long").as("doc_id"))
        .groupBy("h")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical"))),

    // Sequence packing for training: assign docs to fixed-budget
    // (512-token) sequences by running token count, packed WITHIN a
    // deterministic (source, doc_id div 1024) sub-shard. Packing per
    // source alone still serialized each source through ONE window
    // task — at 100 TB with a handful of sources that's the whole
    // corpus through |sources| tasks; the sub-shard bounds every task
    // at ≤ 1024 docs while keeping assignment fully deterministic
    // (shard boundaries waste at most one partial sequence each, the
    // standard pack-within-partition trade). seq_id is shard-local;
    // (source, shard, seq_id) names a sequence globally.
    "text_pack" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          expr(s"CAST(size($toksSpark) AS BIGINT)").as("n_toks"))
        .withColumn("shard", (col("doc_id") / lit(1024L)).cast("long"))
        .withColumn("cum", coalesce(sum("n_toks").over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_toks"), col("shard"),
          (col("cum") / lit(512L)).cast("long").as("seq_id"),
          (col("cum") % lit(512L)).as("offset"))
    }),

    // Packing efficiency/skew visibility (the dedup_lsh_skipped
    // pattern): per source, how many 1024-doc shards text_pack uses,
    // the boundary waste each shard's final partial sequence leaves
    // (the price of shard-local packing), and the max shard token mass
    // (the skew number to watch — a hot shard is the one that would
    // slow the pack at 100 TB). Pure integer two-level aggregate.
    "text_pack_stats" -> ((s, dir) => {
      val perShard = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          expr(s"CAST(size($toksSpark) AS BIGINT)").as("n_toks"))
        .withColumn("shard", (col("doc_id") / lit(1024L)).cast("long"))
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("docs"), sum("n_toks").as("toks"))
        .withColumn("seqs", ((col("toks") + lit(511L)) / lit(512L)).cast("long"))
        .withColumn("waste", col("seqs") * lit(512L) - col("toks"))
      perShard.groupBy("source")
        .agg(count(lit(1)).as("n_shards"),
          sum("docs").as("n_docs"),
          sum("toks").as("n_tokens"),
          sum("seqs").as("n_seqs"),
          sum("waste").as("waste_tokens"),
          max("toks").as("max_shard_tokens"))
    }),

    // TF-IDF-style top terms per document. idf is the exact rational
    // N/df instead of log(N/df): rank order per doc is identical (log
    // is monotone) and the arithmetic stays bit-equal across engines
    // (libm log is not correctly rounded; integer ratios are).
    // Shape: explode → two short-pair groupBys → vocab join → per-doc
    // rank. Term stats shuffle (doc_id, tok-hash)-sized rows only.
    "text_tfidf" -> ((s, dir) => {
      val d = docs(s, dir)
      val tf = d.select(col("doc_id").cast("long").as("doc_id"),
          explode(expr(toksSpark)).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tfc"))
      val dfc = tf.groupBy("tok").agg(count(lit(1)).as("dfc"))
      val n = d.select(count(lit(1)).cast("double").as("nd"))
      tf.join(dfc, Seq("tok")).crossJoin(broadcast(n))
        .withColumn("score",
          col("tfc").cast("double") * col("nd") / col("dfc").cast("double"))
        .withColumn("rk", expr(
          "CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT)"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("tok"), col("rk"),
          Rounding.r6(col("score")).as("score"))
    }),

    // Benchmark decontamination (GPT-3-style n-gram overlap): flag
    // every training doc sharing a 3-gram shingle with the held-out
    // set (stand-in: doc_id % 50 == 0). The held-out shingle set is
    // SMALL by nature → broadcast, so the corpus side never shuffles
    // its shingles; per-doc overlap counts come from one groupBy of
    // 8-byte (doc_id, hash) pairs.
    "text_decontaminate" -> ((s, dir) => {
      val sh = docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(whS))
        .withColumn("sh", expr(shS))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("array_distinct(sh)").as("shd"))
      val benchShingles = sh.filter(col("doc_id") % 50 === 0)
        .select(explode(col("shd")).as("g")).distinct()
      sh.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), explode(col("shd")).as("g"))
        .join(broadcast(benchShingles), Seq("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
    }),

    // Deterministic ~5% uniform sample: Knuth-hash the id, keep one
    // residue class. Pure per-row filter — pushes into the scan, zero
    // shuffle, and reproducible across engines/runs (unlike rand()).
    "sample_hash" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("n_chars"))
        .filter(expr(s"(((doc_id % ${P}L) * 2654435761L) % ${P}L) % 20 = 0"))),

    // Stratified sample: a fixed per-source quota, hash-ordered so the
    // draw is deterministic. Rides the two-phase [[KMin.smallestBy]] —
    // a bare row_number over (source) would sort EVERY doc of a source
    // in one task (the shape corpus_sample_fixed was built to avoid);
    // here the largest sort is one partition's slice of one source and
    // only ≤ k·P candidate rows reach the per-source rank. doc_id
    // rides as the tie-break so the draw stays deterministic even when
    // ids exceed P and the hash collides (mirrors the oracle's
    // ORDER BY h, doc_id).
    "sample_stratified" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          expr(s"((doc_id % ${P}L) * 2654435761L) % ${P}L").as("h"))
      KMin.smallestBy(d, Seq("source"), Seq("h", "doc_id"), 10, "_rk")
        .select(col("doc_id"), col("source"),
          col("_rk").cast("long").as("rk"))
    }),

    // Temperature-scaled source rebalancing (the multilingual-corpus
    // α-sampling recipe): sampling weight w_i ∝ n_i^α with α = 0.5 —
    // sqrt is correctly-rounded IEEE on both engines, so unlike a pow()
    // temperature the weights are bit-identical; they micro-quantize
    // to longs before the (few-row) total so the denominator is an
    // exact integer. Each source's quota of the 100-doc target fills
    // by the deterministic hash order through the two-phase KMin (cap
    // k at the target; the per-source cut joins the broadcast quota
    // table). Head sources downweight, tail sources upweight — the
    // rebalance every multi-source 100 TB mix runs before training.
    "sample_temperature" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          expr(s"((doc_id % ${P}L) * 2654435761L) % ${P}L").as("h"))
        .localCheckpoint()
      val cnt = d.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("w",
          expr("CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)"))
      val tot = cnt.agg(sum(col("w")).as("tw"))
      val quota = cnt.crossJoin(broadcast(tot))
        .withColumn("quota", expr(
          "greatest(CAST(1 AS BIGINT), CAST(floor(CAST(100 AS DOUBLE)" +
            " * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) AS BIGINT))"))
        .select("source", "quota")
      KMin.smallestBy(d, Seq("source"), Seq("h", "doc_id"), 100, "_rk")
        .join(broadcast(quota), Seq("source"))
        .filter(col("_rk").cast("long") <= col("quota"))
        .select(col("doc_id"), col("source"),
          col("_rk").cast("long").as("rk"), col("quota"))
    }),

    // Class-balanced downsample over the labeled embeddings: every
    // label keeps exactly n_min = |smallest class| vectors, chosen by
    // the deterministic Knuth-hash order (h, vec_id) — the balancing
    // step before training on skewed classes. n_min is a driver
    // literal from one count job (scalar-subquery mirror in the
    // oracle); selection runs through the same two-phase KMin
    // bottom-K as sample_stratified, so no task ever windows a whole
    // class. (When n_min itself is huge at true scale, the rate-based
    // hash-threshold keep of sample_weighted is the cheaper
    // approximate form; this is the exact one.)
    "sample_balanced" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("label").cast("long").as("label"),
          expr(s"((vec_id % ${P}L) * 2654435761L) % ${P}L").as("h"))
      val nMin = {
        val r = e.groupBy("label").agg(count(lit(1)).as("c"))
          .agg(min(col("c"))).collect()(0)
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      // Clamp before the Int narrowing: a > 2^31 smallest class would
      // otherwise WRAP nMin negative and silently keep zero rows. At
      // that size the rate-based sampler is the right tool anyway
      // (see above); failing loudly beats an empty result.
      require(nMin <= Int.MaxValue,
        s"sample_balanced: n_min $nMin exceeds the exact bottom-K range")
      KMin.smallestBy(e, Seq("label"), Seq("h", "vec_id"),
          nMin.toInt, "_rk")
        .select(col("vec_id"), col("label"),
          col("_rk").cast("long").as("rk"))
    }),

    // Weighted domain mixing: each source keeps a different fraction of
    // its docs (rates 1/5..5/5, derived from the source index — in a
    // real pipeline this is the mixture-weights table). Keep rule is
    // the Knuth-hash residue under the rate threshold, in EXACT integer
    // arithmetic (h*5 < w*P; h < P so h*5 can't overflow) — a
    // double-valued rate compare could round differently per engine.
    // Scan-pushed filter, no shuffle, independent of row order.
    "sample_weighted" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("n_chars"))
        .withColumn("w",
          expr("CAST(1 + CAST(substring(source, 4) AS INT) % 5 AS BIGINT)"))
        .filter(
          expr(s"((doc_id % ${P}L) * 2654435761L) % ${P}L * 5 < w * ${P}L"))),

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
      val kept = queries("dedup_keep")(s, dir)
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
      val q = e.filter(col("vec_id") % 10 === 0)
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
      val q = e.filter(col("vec_id") % 10 === 0)
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
      val q = e.filter(col("id") % 50 === 0)
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
      val qs = assigned.filter(col("vec_id") % 50 === 0)
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
      val exact = queries("sim_hybrid_rrf")(s, dir)
        .select(col("q_id"), col("doc_id"))
      val ann = queries("sim_hybrid_rrf_ann")(s, dir)
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
      val q = e.filter(col("vec_id") % 10 === 0)
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
      val q = e.filter(col("vec_id") % 10 === 0)
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
      val qs = data.filter(col("vec_id") % 10 === 0)
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
      val exact = queries("sim_mips")(s, dir)
        .select(col("q_id"), col("n_id"))
      val ann = queries("sim_mips_ann")(s, dir)
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
      val knn = queries("sim_ann_lsh")(s, dir)
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

    "mm_decode" -> ((s, dir) =>
      Multimodal.decodeFeatures(Multimodal.mediaTable(docs(s, dir)))),

    // AS-OF join: each click gets the latest at-or-before purchase value
    // per user (union + forward-fill window — one shuffle, no range
    // explosion). Oracle is DuckDB's native ASOF LEFT JOIN.
    // Resize stub: every-4th-byte thumbnail (1:1 binary transform).
    "mm_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.mediaTable(docs(s, dir)), 4)
        .select(col("doc_id"), col("thumb_bytes"), col("first_byte"))),

    // Frame-sample stub: 64-byte frames, one row each (1:N generator).
    "mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.mediaTable(docs(s, dir)), 64)),

    // Audio-energy stub: 256-sample frames, exact integer energy folds
    // inside the scan task (mapPartitions), RMS derived from the two
    // exact longs afterwards — the Σx² never crosses an engine as a
    // float.
    "mm_audio_rms" -> ((s, dir) =>
      Multimodal.audioRms(Multimodal.mediaTable(docs(s, dir)), 256)
        .withColumn("rms", Rounding.r6(expr(
          "sqrt(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE))")))),

    // Media near-dup via average-hash: per-payload 32-pixel fingerprint
    // (mapPartitions, bytes never leave the scan task), then duplicate
    // groups = one count window over the 8-byte hash — the only
    // shuffled payload is (doc_id, phash).
    "mm_phash" -> ((s, dir) =>
      Multimodal.avgHash(Multimodal.mediaTable(docs(s, dir)))
        .withColumn("n_same",
          expr("count(1) OVER (PARTITION BY phash)").cast("long"))),

    // Media NEAR-dup: banded hamming join over the 32-bit average-hash
    // — the image-side twin of dedup_hamming (pigeonhole: hamming ≤ 3
    // across 4 bands ⇒ ≥ 1 exact 8-bit band). Payload bytes never
    // shuffle — only (doc_id, phash, band) rows move; flooded band
    // buckets cap at 64 like minhashPairs (uniform-payload floods are
    // exact-dup shaped and belong to mm_phash's n_same groups); each
    // surviving pair is emitted from its lowest matching band, so no
    // distinct pass.
    "mm_phash_neardup" -> ((s, dir) => {
      val ph = Multimodal.avgHash(Multimodal.mediaTable(docs(s, dir)))
        .localCheckpoint()
      val banded = ph.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("bv", expr("shiftright(phash, j * 8) & 255"))
        .withColumn("_bn", expr("count(1) OVER (PARTITION BY j, bv)"))
        .filter(col("_bn") <= 64).drop("_bn")
      val firstBandOnly = (0 until 4).map(b =>
        s"IF((shiftright(x.phash, ${b * 8}) & 255) = " +
          s"(shiftright(y.phash, ${b * 8}) & 255), ${1 << b}, 0)")
        .mkString("((", " + ",
          ") & (shiftleft(1, CAST(x.j AS INT)) - 1)) = 0")
      banded.as("x").join(banded.as("y").hint("shuffle_hash"),
          col("x.j") === col("y.j") && col("x.bv") === col("y.bv")
            && col("x.doc_id") < col("y.doc_id"))
        .filter(expr(firstBandOnly))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          expr("CAST(bit_count(x.phash ^ y.phash) AS BIGINT)")
            .as("hamming"))
        .filter(col("hamming") <= 3L)
    }),

    // Scene-boundary detection over the frame stream: a cut is a
    // frame whose signature jumps > 25% from its predecessor (the
    // decode being stubbed, the signature is the frame's exact
    // integer energy — the real pipeline would swap in a perceptual
    // frame hash; the lag-compare-aggregate plumbing is the shape).
    // All arithmetic is BIGINT (jump·4 > prev avoids any float
    // threshold); the window partitions on doc_id — high-cardinality,
    // one media item per group.
    "mm_scene_cuts" -> ((s, dir) => {
      val en = Multimodal.audioRms(Multimodal.mediaTable(docs(s, dir)), 256)
        .select(col("doc_id"), col("frame_idx"), col("energy"))
      val wd = Window.partitionBy("doc_id").orderBy("frame_idx")
      en.withColumn("pe", lag(col("energy"), 1).over(wd))
        .withColumn("jump", abs(col("energy") - col("pe")))
        .withColumn("cut",
          col("pe").isNotNull && col("jump") * 4 > col("pe"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_frames"),
          sum(when(col("cut"), 1L).otherwise(0L)).as("n_cuts"),
          coalesce(max(when(col("cut"), col("jump"))), lit(0L))
            .as("max_jump"))
    }),

    // The cap report for mm_phash_neardup — same no-silent-caps rule
    // as dedup_lsh_skipped: which phash band buckets exceed the
    // 64-member flood cap and how many banded rows that drops.
    "mm_phash_skipped" -> ((s, dir) => {
      val sizes = Multimodal.avgHash(Multimodal.mediaTable(docs(s, dir)))
        .select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("bv", expr("shiftright(phash, j * 8) & 255"))
        .groupBy("j", "bv").agg(count(lit(1)).as("n"))
      sizes.groupBy(lit(true).as("_g")).agg(
        sum(col("n")).as("n_rows_total"),
        count(when(col("n") > 64, lit(1))).as("n_buckets_capped"),
        sum(when(col("n") > 64, col("n")).otherwise(lit(0L)))
          .as("n_rows_dropped"))
        .select(col("n_rows_total"), col("n_buckets_capped"),
          col("n_rows_dropped"))
    }),

    "asof_join" -> ((s, dir) => {
      val ev = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"), col("t"),
          col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t"), Rounding.r6(col("value")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("value").as("purchase_value"))
      AsOfJoin(clicks, purchases, Seq("user_id"), "t", Seq("purchase_value"))
        .select(col("user_id"), col("t"), col("click_value"),
          Rounding.r6(col("purchase_value_asof")).as("purchase_value"))
    }),

    // NEAREST-match as-of: the closest purchase in EITHER direction
    // (backward wins ties — it has distance 0 on an exact-timestamp
    // match, and the oracle's strict forward inequality mirrors that).
    // Same union trick as AsOfJoin but with BOTH running fills over ONE
    // sort: last-non-null looking back and first-non-null looking
    // forward share the (t, side) ordering, so the plan is still one
    // exchange + one sort. Right rows at the probe's exact timestamp
    // sort before it, landing in the backward frame only.
    "asof_nearest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"), col("t"),
          col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t"),
          Rounding.r6(col("value")).as("click_value"),
          lit(1).as("_side"),
          lit(null).cast("struct<v:double,rt:bigint>").as("_r"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"),
          lit(null).cast("double").as("click_value"),
          lit(0).as("_side"),
          struct(col("value").as("v"), col("t").as("rt")).as("_r"))
      // `_r` as the trailing sort term determinizes duplicate purchase
      // timestamps: backward `last` matches max (v, rt) — the greatest
      // value among same-instant purchases — and forward `first`
      // matches the least; the oracle collapses duplicates to
      // max(pv) / min(pv) respectively before its two ASOF joins.
      val w = Window.partitionBy("user_id")
        .orderBy(col("t").asc, col("_side").asc, col("_r").asc)
      val back = last(col("_r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
      val fwd = first(col("_r"), ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
      clicks.unionByName(purchases)
        .withColumn("_b", back).withColumn("_f", fwd)
        .filter(col("_side") === 1)
        .select(col("user_id"), col("t"), col("click_value"),
          Rounding.r6(
            when(col("_b").isNull, col("_f")("v"))
              .when(col("_f").isNull, col("_b")("v"))
              .when(col("t") - col("_b")("rt") <= col("_f")("rt") - col("t"),
                col("_b")("v"))
              .otherwise(col("_f")("v"))).as("purchase_value"))
    }),

    // As-of with tolerance: the prevailing purchase only counts if it
    // is at most 24 h stale — older matches attach as null. Same
    // single-shuffle union + forward-fill plan as asof_join; the bound
    // is a post-fill comparison against the matched row's own
    // timestamp, not extra window state.
    "asof_tolerance" -> ((s, dir) => {
      val ev = EventBars.events(s, dir)
        .select(col("user_id").cast("long").as("user_id"), col("t"),
          col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t"), Rounding.r6(col("value")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("value").as("purchase_value"))
      AsOfJoin(clicks, purchases, Seq("user_id"), "t", Seq("purchase_value"),
        tolerance = Some(86400000000L))
        .select(col("user_id"), col("t"), col("click_value"),
          Rounding.r6(col("purchase_value_asof")).as("purchase_value"))
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
      val qs = assigned.filter(col("vec_id") % 25 === 0)
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
      val qs = e.filter(col("vec_id") % 25 === 0)
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
      val qs = assigned.filter(col("vec_id") % 25 === 0)
      qs.as("x").join(assigned.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
        .withColumn("sim", expr(s"try_divide(${dotS("x.v", "y.v")}, x.nrm * y.nrm)"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY x.vec_id ORDER BY sim DESC, y.vec_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"),
          col("rank"), Rounding.r6(col("sim")).as("sim"))
    }),

    // Data profiling: the per-column summary every ingest job runs
    // before training — null count, distinct count, min/max length —
    // as ONE pass over the table (a single aggregate computes every
    // column's stats; the long output shape comes from a stack of the
    // one wide row, not from re-scanning per column). count(distinct)
    // over several columns plans one Expand over the scan — at 100 TB
    // that is 4× the scan rows shuffled as short values, the standard
    // trade for exact multi-column distincts in one job.
    "profile_docs" -> ((s, dir) => {
      val d = docs(s, dir)
      // groupBy a constant, not a global agg: profiling an empty shard
      // yields zero rows (a global agg would emit one all-zero row),
      // keeping the whole surface's empty-in → empty-out invariant
      val wide = d.groupBy(lit(true).as("_g")).agg(
        count(lit(1)).as("n_rows"),
        count(col("text")).as("nn_text"),
        count(col("lang")).as("nn_lang"),
        count(col("source")).as("nn_source"),
        countDistinct(col("lang")).as("d_lang"),
        countDistinct(col("source")).as("d_source"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      wide.select(col("n_rows"), expr(
        """stack(3,
          |  'lang',   n_rows - nn_lang,   d_lang,   min_chars, max_chars,
          |  'source', n_rows - nn_source, d_source, min_chars, max_chars,
          |  'text',   n_rows - nn_text,   CAST(NULL AS BIGINT), min_chars, max_chars)
          |  AS (column_name, n_null, n_distinct, min_chars, max_chars)""".stripMargin))
        .select(col("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_chars"), col("max_chars"))
    }),

    // Unigram language-model quality score (the perplexity-style
    // filter): score(doc) = mean over tokens of log10 P(token), with
    // P from the corpus's own unigram counts. The vocabulary aggregate
    // shuffles 8-byte (hash, count) pairs; the per-token probability
    // lookup is a broadcast join (a real corpus's vocab is tiny next
    // to the corpus), so documents never shuffle. Token order within a
    // doc is the explode order on both engines, so the float fold is
    // deterministic.
    "text_unigram_lp" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          posexplode(expr(toksSpark)).as(Seq("pos", "tok")))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val total = toks.agg(count(lit(1)).cast("double").as("nt"))
      toks.join(broadcast(vocab), Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          Rounding.r6(avg(log10(col("c").cast("double") / col("nt"))))
            .as("avg_lp"))
    }),

    // Bigram-LM quality score with add-one smoothing: score(doc) =
    // mean over positions of log10 P(w₂|w₁), P = (c(w₁w₂)+1)/(c(w₁)+V).
    // Counts and V are exact longs, so every log input is an exact
    // ratio; the per-doc fold runs in explode order (same trick as the
    // unigram scorer). Dictionaries broadcast; documents never shuffle.
    "text_bigram_lp" -> ((s, dir) => {
      val dt = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(toksSpark).as("toks"))
      val tk = dt.select(col("doc_id"), explode(col("toks")).as("tok"))
      val c1 = tk.groupBy("tok").agg(count(lit(1)).as("c1"))
      val vsize = c1.agg(count(lit(1)).cast("double").as("v"))
      val bg = dt.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1," +
            " element_at(toks, i + 1) AS w2))")).as(Seq("pos", "b")))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      bg.join(broadcast(c2), Seq("w1", "w2"))
        .join(broadcast(c1.withColumnRenamed("tok", "w1")), Seq("w1"))
        .crossJoin(broadcast(vsize))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          Rounding.r6(avg(log10(
            (col("c2").cast("double") + lit(1.0))
              / (col("c1").cast("double") + col("v"))))).as("avg_lp"))
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

    // Training-mix allocation (the data-curation step after all the
    // filters): exact per-source token totals, the natural sampling
    // share p, the temperature-smoothed share w ∝ √p (temperature 0.5;
    // √ because IEEE sqrt is correctly rounded on every platform,
    // unlike pow), and the epochs of each source one pass of the
    // smoothed mix consumes. Token counts collapse map-side to one
    // long per source; the |sources|-row aggregate materializes once
    // and both normalizations are scalar aggregates broadcast back
    // over it — never the corpus, never an unpartitioned window.
    "corpus_mix" -> ((s, dir) => {
      val src = docs(s, dir)
        .withColumn("n_tok", expr(s"CAST(size($toksSpark) AS BIGINT)"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .localCheckpoint()
      val wp = src
        .crossJoin(broadcast(src.agg(sum(col("n_tokens")).as("tt"))))
        .withColumn("p", col("n_tokens").cast("double")
          / col("tt").cast("double"))
      wp.crossJoin(broadcast(wp.agg(sum(sqrt(col("p"))).as("sw"))))
        .withColumn("w", sqrt(col("p")) / col("sw"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          Rounding.r6(col("p")).as("p"), Rounding.r6(col("w")).as("w"),
          Rounding.r6(col("w") / col("p")).as("epochs"))
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

    // Deterministic train/valid/test split: the doc id's multiplicative
    // hash picks a bucket in [0,100) → 98/1/1. The assignment is a
    // per-row projection (reproducible on any engine, no RNG state);
    // the report is one (source, split) aggregate plus a window over
    // the |sources×3|-row result — the corpus itself never reshuffles.
    "corpus_split" -> ((s, dir) => {
      val wS = Window.partitionBy("source")
      docs(s, dir)
        .withColumn("n_tok", expr(s"CAST(size($toksSpark) AS BIGINT)"))
        .withColumn("bucket",
          expr(s"(((doc_id % ${P}L) * 2654435761L) % ${P}L) % 100"))
        .withColumn("split",
          when(col("bucket") < 98, lit("train"))
            .when(col("bucket") === 98, lit("valid"))
            .otherwise(lit("test")))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("doc_share", Rounding.r6(
          col("n_docs").cast("double")
            / sum(col("n_docs")).over(wS).cast("double")))
        .withColumn("tok_share", Rounding.r6(
          col("n_tokens").cast("double")
            / sum(col("n_tokens")).over(wS).cast("double")))
    }),

    // Corpus bigram counts (the pair-statistics pass a BPE-style
    // tokenizer trainer starts from): adjacent token pairs materialize
    // inline per document (codegen'd transform over an index sequence —
    // no self-join, no positional window), collapse map-side in the
    // count aggregate, and the global top-25 is a TakeOrdered — no
    // single-partition exchange anywhere. Ties break on the bigram
    // text so the cut line is a deterministic total order.
    "corpus_ngrams" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(25)),

    // DSIR-style importance weights: score every document by how much
    // its hashed-token feature distribution looks like the target
    // domain (lang='en') vs the raw corpus. Per-bucket importance
    // ratios use add-one smoothing and stay EXACT integer products
    // until one deterministic division, then quantize to micro-units so
    // the per-doc mean is an exact long sum (shuffle-order-proof). The
    // 1024-row ratio table broadcasts; the corpus shuffles only
    // (bucket)- and (doc_id)-keyed partial aggregates, never text.
    // At extreme corpus sizes the long products need HUGEINT-style
    // widening — swap the two products to DECIMAL(38,0) then.
    "text_dsir" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          expr(s"transform($whS, h -> h % 1024)").as("f"))
        .filter(size(col("f")) > 0)
      // The 1024-row bucket table materializes once; its exact-long
      // totals come from a scalar aggregate broadcast back over it —
      // no unpartitioned window.
      val bstats = d.select(col("lang"), explode(col("f")).as("b"))
        .groupBy("b")
        .agg(count(lit(1)).as("n_all"),
          sum(when(col("lang") === "en", lit(1L)).otherwise(lit(0L)))
            .as("n_t"))
        .localCheckpoint()
      val stats = bstats
        .crossJoin(broadcast(bstats.agg(sum(col("n_all")).as("tot_all"),
          sum(col("n_t")).as("tot_t"))))
        .select(col("b"), expr("CAST(round(" +
          "CAST((n_t + 1) * (tot_all + 1024) AS DOUBLE)" +
          " / CAST((n_all + 1) * (tot_t + 1024) AS DOUBLE)" +
          " * 1000000.0) AS BIGINT)").as("r_i6"))
      d.select(col("doc_id"), col("lang"), explode(col("f")).as("b"))
        .join(broadcast(stats), Seq("b"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_f"), sum(col("r_i6")).as("sr"))
        .select(col("doc_id"), col("lang"), col("n_f"),
          Rounding.r6(expr(
            "CAST(sr AS DOUBLE) / CAST(n_f AS DOUBLE) / 1000000.0"))
            .as("dsir_w"),
          expr("CAST(sr AS DOUBLE) / CAST(n_f AS DOUBLE) / 1000000.0 > 1.0")
            .as("keep"))
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
      val exact = queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = queries("sim_ann_lsh")(s, dir)
        .filter(col("q_id") % 10 === 0)
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
      val exact = queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"))
        .crossJoin(dims.map(_.toLong).toDF("dim_k"))
      val anns = dims.map { k =>
        val t = e.select(col("vec_id"), expr(s"slice(v, 1, $k)").as("vk"))
          .withColumn("nrm", expr(s"sqrt(${dotS("vk", "vk")})"))
        val qb = t.filter(col("vec_id") % 10 === 0)
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
      val exact = queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % 25 === 0)
        .select(col("q_id"), col("n_id"))
        .crossJoin(Seq("probe1", "probe2").toDF("method"))
      def ann(name: String, q: String) =
        queries(q)(s, dir)
          .filter(col("q_id") % 10 === 0)
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
      val exact = queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % 25 === 0)
        .select(col("q_id"), col("n_id"))
        .crossJoin(Seq("init", "trained").toDF("method"))
      def ann(name: String, q: String) =
        queries(q)(s, dir)
          .filter(col("q_id") % 10 === 0)
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
      // cov cells accumulate in a per-partition long array (exact) and
      // shuffle d²·partitions rows — NOT the d²·vectors an inline pair
      // explode would move; the merged sums are the same integers.
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
      var v = Array.fill(d)(BigInt(1000000))
      for (_ <- 1 to 12) {
        val wv = Array.tabulate(d)(i =>
          (0 until d).map(j => M(i)(j) * v(j)).foldLeft(BigInt(0))(_ + _))
        val mx = if (d == 0) BigInt(0) else wv.map(_.abs).max
        if (mx > 0)
          v = wv.map(t =>
            if (t >= 0) t * 1000000 / mx else -((-t) * 1000000 / mx))
      }
      if (v.exists(_ != 0) && v.find(_ != 0).get < 0) v = v.map(-_)
      val vArr =
        if (d == 0) "CAST(array() AS ARRAY<BIGINT>)"
        else v.map(_.toString + "L").mkString("array(", ",", ")")
      centered.select(col("vec_id"),
        Rounding.r6(expr(s"CAST(aggregate(zip_with(c, $vArr, " +
          "(x, w) -> x * w), 0L, (a, b) -> a + b) AS DOUBLE)" +
          " / 1000000000000.0")).as("pc1"))
    }),

    // Character-entropy quality signal: H = Σ (n/N)·log₂(N/n) over the
    // doc's character frequencies. Each term derives from two exact
    // longs and quantizes to micro-units BEFORE the per-doc sum, so
    // the cross-partition reduction is exact integers (the log itself
    // can't land on a rounding boundary — transcendental outputs
    // don't hit exact .5 micros).
    "text_entropy" -> ((s, dir) => {
      val wD = Window.partitionBy("doc_id")
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          explode(expr("regexp_extract_all(text, '.', 0)")).as("ch"))
        .groupBy("doc_id", "ch")
        .agg(count(lit(1)).as("n"))
        .withColumn("nn", sum(col("n")).over(wD))
        .withColumn("term", expr("CAST(round(" +
          "(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))" +
          " * log2(CAST(nn AS DOUBLE) / CAST(n AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(max(col("nn")).as("n_chars"),
          count(lit(1)).as("n_distinct"),
          Rounding.r6(expr("CAST(sum(term) AS DOUBLE) / 1000000.0"))
            .as("entropy"))
    }),

    // Flesch reading-ease / FK grade per document from three exact
    // integer counts (words, sentence enders, ASCII vowel-group
    // syllable proxy) — a per-row projection, no shuffle; the score
    // doubles derive from exact longs so they're deterministic. The
    // vowel regex is ASCII-only on purpose: non-Latin scripts score 0
    // syllables rather than betting on unicode case-fold parity.
    "text_readability" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          expr(s"CAST(size($toksSpark) AS BIGINT)").as("n_words"),
          // regexp_count, not size(regexp_extract_all(...)): counting
          // matches without materializing the match arrays — this is
          // the hottest text scan in the suite and the arrays were
          // pure allocation.
          expr("CAST(greatest(regexp_count(text, '[.!?]'), 1)" +
            " AS BIGINT)").as("n_sents"),
          expr("CAST(regexp_count(lower(text), '[aeiouy]+')" +
            " AS BIGINT)").as("n_syll"))
        .filter(col("n_words") > 0)
        .withColumn("wps",
          expr("CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)"))
        .withColumn("spw",
          expr("CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)"))
        .select(col("doc_id"), col("lang"), col("n_words"), col("n_sents"),
          col("n_syll"),
          Rounding.r6(expr("206.835 - 1.015 * wps - 84.6 * spw"))
            .as("flesch"),
          Rounding.r6(expr("0.39 * wps + 11.8 * spw - 15.59"))
            .as("fk_grade"))))

  // ---- DuckDB oracles ----

  private val docToks =
    s"dt AS (SELECT doc_id::BIGINT AS doc_id, text, $toksDuck AS toks FROM documents)"

  private val docHashes =
    s"""$docToks,
       |dh AS (SELECT *, $whD AS wh FROM dt),
       |ds AS (SELECT *, $shD AS sh FROM dh)""".stripMargin

  /** Shared oracle prefix for the one-Lloyd-round euclidean k-means:
    * CTE chain e → c0 → x1/a1 (init assign) → c1 (integer-mean
    * update) → x2 (all vec × centroid d² pairs) — [[lloyd1Cents]] /
    * [[assignEuclid]] mirrored. Splice as `WITH $kmLloyd1Duck, ...`. */
  private val kmLloyd1Duck: String =
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

  private val embBase =
    s"""eb AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |en AS (SELECT *, sqrt(${dotD("v", "v")}) AS nrm FROM eb)""".stripMargin

  /** Shared oracle fragment: the one-Lloyd-iteration trained IVF
    * centroids (init = nlist lowest vec_ids, micro-quantized integer
    * mean update over the vec_id % 4 training sample — mirrors
    * sim_ivf_kmeans' Spark chain); ends in `cn(c_id, cv, cnrm)`,
    * with `kc0` = the untrained init centroids. Splice after
    * [[embBase]] inside a WITH. */
  private val ivfKmeansCentsDuck: String =
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
  private val hybridLexDuck: String =
    s"""nv AS (SELECT count(*)::BIGINT AS nvec FROM embeddings),
       |dd AS (SELECT doc_id::BIGINT AS id, $toksDuck AS toks
       |  FROM documents, nv WHERE doc_id::BIGINT < nvec),
       |dl AS (SELECT id, len(toks)::BIGINT AS dl FROM dd),
       |st AS (SELECT count(*)::BIGINT AS nd, sum(dl)::BIGINT AS sdl FROM dl),
       |tf AS (SELECT id, tok, count(*)::BIGINT AS tf
       |  FROM (SELECT id, unnest(toks) AS tok FROM dd) GROUP BY 1, 2),
       |dft AS (SELECT tok, count(*)::BIGINT AS dfc FROM tf GROUP BY 1),
       |qt AS (SELECT id AS q_id, unnest(list_distinct(toks)) AS tok
       |  FROM dd WHERE id % 50 = 0),
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
  private val hybridDenseExactDuck: String =
    s"""hqx AS (SELECT * FROM en WHERE vec_id % 50 = 0),
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
  private val hybridDenseAnnDuck: String =
    s"""aag0 AS (SELECT e.vec_id, e.v, e.nrm, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN cn c),
       |aagr AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, c_id) AS crank FROM aag0),
       |aasg AS MATERIALIZED (SELECT vec_id, v, nrm, c_id AS cell
       |  FROM aagr WHERE crank = 1),
       |aqx AS (SELECT vec_id, v, nrm, c_id AS cell FROM aagr
       |  WHERE crank <= 2 AND vec_id % 50 = 0),
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
  private def hybridFuseDuck(p: String, ltopCte: String,
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

  val oracles: Map[String, String] = Map(

    "text_stats" ->
      s"""WITH $docToks,
         |t2 AS (SELECT doc_id, text, toks,
         |  len(toks)::BIGINT AS n_tokens,
         |  len(list_distinct(toks))::BIGINT AS n_distinct,
         |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(toks, t -> length(t)::DOUBLE)), (a, b) -> a + b) / len(toks)::DOUBLE AS avg_len
         |  FROM dt),
         |t3 AS (SELECT *, n_distinct::DOUBLE / n_tokens::DOUBLE AS dr FROM t2)
         |SELECT doc_id, length(text)::BIGINT AS n_chars_c,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_tokens_bpe,
         |  n_tokens, n_distinct,
         |  (round(avg_len, 6) + 0.0) AS avg_len, (round(dr, 6) + 0.0) AS distinct_ratio,
         |  (round(least(1.0, greatest(0.0, 0.2 + 0.001 * length(text)::DOUBLE + 0.3 * dr - 0.05 * abs(avg_len - 5.0))), 6) + 0.0) AS quality
         |FROM t3""".stripMargin,

    "corpus_clean" ->
      s"""WITH $docHashes,
         |q1 AS (SELECT doc_id, text, toks, len(toks)::BIGINT AS n_tokens,
         |    len(list_distinct(toks))::BIGINT AS n_distinct,
         |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(toks, t -> length(t)::DOUBLE)), (a, b) -> a + b) / len(toks)::DOUBLE AS avg_len
         |  FROM dt),
         |q2 AS (SELECT doc_id, (round(least(1.0, greatest(0.0,
         |    0.2 + 0.001 * length(text)::DOUBLE
         |    + 0.3 * (n_distinct::DOUBLE / n_tokens::DOUBLE)
         |    - 0.05 * abs(avg_len - 5.0))), 6) + 0.0) AS quality FROM q1),
         |gg AS (SELECT doc_id, ${TextOps.bigramsDuck("wh")} AS g2,
         |    ${TextOps.shinglesDuck("wh")} AS g3 FROM dh),
         |rst AS (SELECT doc_id, len(g2)::BIGINT AS n2, len(g3)::BIGINT AS n3,
         |    len(list_distinct(g3))::BIGINT AS d3 FROM gg),
         |rex AS (SELECT doc_id, unnest(g2) AS g FROM gg),
         |rtc AS (SELECT doc_id, g, count(*) AS c FROM rex GROUP BY 1, 2),
         |rtp AS (SELECT doc_id, max(c) AS top2 FROM rtc GROUP BY 1),
         |rp AS (SELECT rst.doc_id,
         |    ((round(coalesce(rtp.top2::DOUBLE / nullif(rst.n2, 0)::DOUBLE, 0.0), 6) + 0.0) > 0.2
         |     OR (round(coalesce((rst.n3 - rst.d3)::DOUBLE / nullif(rst.n3, 0)::DOUBLE, 0.0), 6) + 0.0) > 0.2) AS repetitive
         |  FROM rst LEFT JOIN rtp ON rst.doc_id = rtp.doc_id),
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
         |ek AS (SELECT min(doc_id::BIGINT) AS doc_id FROM documents GROUP BY md5(text)),
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM ds),
         |bs AS (SELECT DISTINCT unnest(shd) AS g FROM shd WHERE doc_id % 50 = 0),
         |cd AS (SELECT doc_id, unnest(shd) AS g FROM shd WHERE doc_id % 50 <> 0),
         |cont AS (SELECT DISTINCT cd.doc_id FROM cd JOIN bs USING (g))
         |SELECT d.doc_id::BIGINT AS doc_id, d.source, d.n_chars, q2.quality
         |FROM documents d
         |JOIN q2 ON q2.doc_id = d.doc_id::BIGINT
         |JOIN rp ON rp.doc_id = d.doc_id::BIGINT
         |WHERE d.doc_id::BIGINT % 50 <> 0
         |  AND q2.quality >= 0.5
         |  AND NOT rp.repetitive
         |  AND d.doc_id::BIGINT IN (SELECT doc_id FROM ek)
         |  AND d.doc_id::BIGINT NOT IN (SELECT doc_id FROM losers)
         |  AND d.doc_id::BIGINT NOT IN (SELECT doc_id FROM cont)""".stripMargin,

    "text_repetition" ->
      s"""WITH $docToks,
         |dh AS (SELECT doc_id::BIGINT AS doc_id, $whD AS wh FROM dt),
         |gg AS (SELECT doc_id, ${TextOps.bigramsDuck("wh")} AS g2,
         |    ${TextOps.shinglesDuck("wh")} AS g3 FROM dh),
         |st AS (SELECT doc_id, len(g2)::BIGINT AS n2, len(g3)::BIGINT AS n3,
         |    len(list_distinct(g3))::BIGINT AS d3 FROM gg),
         |ex AS (SELECT doc_id, unnest(g2) AS g FROM gg),
         |tc AS (SELECT doc_id, g, count(*) AS c FROM ex GROUP BY 1, 2),
         |tp AS (SELECT doc_id, max(c) AS top2 FROM tc GROUP BY 1),
         |fr AS (SELECT st.doc_id,
         |    (round(coalesce(tp.top2::DOUBLE / nullif(st.n2, 0)::DOUBLE, 0.0), 6) + 0.0) AS top2gram_frac,
         |    (round(coalesce((st.n3 - st.d3)::DOUBLE / nullif(st.n3, 0)::DOUBLE, 0.0), 6) + 0.0) AS dup3gram_frac
         |  FROM st LEFT JOIN tp ON st.doc_id = tp.doc_id)
         |SELECT doc_id, top2gram_frac, dup3gram_frac,
         |  (top2gram_frac > 0.2 OR dup3gram_frac > 0.2) AS repetitive
         |FROM fr""".stripMargin,

    "text_langid" ->
      s"""WITH $docToks,
         |t2 AS (SELECT doc_id,
         |  ${LangMarkers.map { case (n, ms) => s"${langScoreDuck("toks", ms)}::BIGINT AS s_$n" }.mkString(",\n  ")}
         |  FROM dt)
         |SELECT doc_id, s_determiner, s_relational, s_scan,
         |  CASE WHEN s_determiner >= s_relational AND s_determiner >= s_scan THEN 'determiner'
         |    WHEN s_relational >= s_scan THEN 'relational' ELSE 'scan' END AS pred
         |FROM t2""".stripMargin,

    "text_pii_report" ->
      """SELECT doc_id::BIGINT AS doc_id,
        |  len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{7,}'))::BIGINT
        |    AS n_long_digits,
        |  len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_nums,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+'))
        |    + len(regexp_extract_all(text, '[0-9]{7,}')) > 0 AS has_pii
        |FROM documents""".stripMargin,

    "corpus_retention_by_source" ->
      s"""WITH $lshPairsDuck,
         |d AS (SELECT doc_id::BIGINT AS doc_id, source FROM documents),
         |ek AS (SELECT min(doc_id::BIGINT) AS doc_id
         |  FROM (SELECT doc_id, md5(text) AS h FROM documents)
         |  GROUP BY h),
         |losers AS (SELECT DISTINCT b AS doc_id FROM pr),
         |nk AS (SELECT doc_id FROM d
         |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |tot AS (SELECT source, count(*)::BIGINT AS n_docs
         |  FROM d GROUP BY 1),
         |ne AS (SELECT source, count(*)::BIGINT AS n_exact_kept FROM d
         |  WHERE doc_id IN (SELECT doc_id FROM ek) GROUP BY 1),
         |nn AS (SELECT source, count(*)::BIGINT AS n_near_kept FROM d
         |  WHERE doc_id IN (SELECT doc_id FROM nk) GROUP BY 1)
         |SELECT tot.source, tot.n_docs,
         |  coalesce(ne.n_exact_kept, 0)::BIGINT AS n_exact_kept,
         |  coalesce(nn.n_near_kept, 0)::BIGINT AS n_near_kept,
         |  (round((CAST(coalesce(ne.n_exact_kept, 0) AS DOUBLE)
         |    / CAST(tot.n_docs AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS exact_rate,
         |  (round((CAST(coalesce(nn.n_near_kept, 0) AS DOUBLE)
         |    / CAST(tot.n_docs AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS near_rate
         |FROM tot
         |LEFT JOIN ne ON tot.source = ne.source
         |LEFT JOIN nn ON tot.source = nn.source""".stripMargin,

    "text_lang_confusion" ->
      s"""WITH $docToks,
         |t2 AS (SELECT doc_id,
         |  ${LangMarkers.map { case (n, ms) => s"${langScoreDuck("toks", ms)}::BIGINT AS s_$n" }.mkString(",\n  ")}
         |  FROM dt),
         |p AS (SELECT doc_id,
         |    CASE WHEN s_determiner >= s_relational AND s_determiner >= s_scan
         |      THEN 'determiner'
         |      WHEN s_relational >= s_scan THEN 'relational'
         |      ELSE 'scan' END AS pred
         |  FROM t2),
         |j AS (SELECT d.lang, p.pred FROM p
         |  JOIN (SELECT doc_id::BIGINT AS doc_id, lang FROM documents) d
         |  USING (doc_id)),
         |g AS (SELECT lang, pred, count(*)::BIGINT AS n
         |  FROM j GROUP BY 1, 2)
         |SELECT lang, pred, n,
         |  (round((CAST(n AS DOUBLE)
         |    / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS share
         |FROM g""".stripMargin,

    "text_fingerprint" ->
      s"""WITH $docHashes
         |SELECT doc_id, ${fingerprintDuck("wh")} AS fingerprint,
         |  len(sh)::BIGINT AS n_shingles
         |FROM ds""".stripMargin,

    "text_chunk" ->
      s"""WITH $docToks,
         |ch AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(0, greatest(0, len(toks)::BIGINT - 9) // 24),
         |    i -> struct_pack(chunk_idx := i,
         |      chunk_text := array_to_string(toks[i*24 + 1 : i*24 + 32], ' ')))) AS chunk
         |  FROM dt)
         |SELECT doc_id, chunk.chunk_idx::BIGINT AS chunk_idx,
         |  chunk.chunk_text AS chunk_text,
         |  length(chunk.chunk_text)::BIGINT AS chunk_chars
         |FROM ch""".stripMargin,

    "text_scrub" ->
      """SELECT doc_id::BIGINT AS doc_id,
        |  regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'), '  +', ' ', 'g') AS scrubbed
        |FROM documents""".stripMargin,

    "text_wordfreq" ->
      s"""WITH $docToks,
         |ex AS (SELECT doc_id, unnest(toks) AS tok FROM dt)
         |SELECT tok, count(*)::BIGINT AS n_total,
         |  count(DISTINCT doc_id)::BIGINT AS n_docs
         |FROM ex GROUP BY tok
         |ORDER BY n_total DESC, tok LIMIT 50""".stripMargin,

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

    "text_pack" ->
      s"""WITH nt AS (SELECT doc_id::BIGINT AS doc_id, source,
         |    len($toksDuck)::BIGINT AS n_toks,
         |    (doc_id::BIGINT // 1024)::BIGINT AS shard FROM documents),
         |cm AS (SELECT *, coalesce(sum(n_toks) OVER (
         |    PARTITION BY source, shard
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0)::BIGINT AS cum FROM nt)
         |SELECT doc_id, source, n_toks, shard,
         |  (cum // 512)::BIGINT AS seq_id, (cum % 512)::BIGINT AS offset
         |FROM cm""".stripMargin,

    "text_pack_stats" ->
      s"""WITH nt AS (SELECT doc_id::BIGINT AS doc_id, source,
         |    len($toksDuck)::BIGINT AS n_toks,
         |    (doc_id::BIGINT // 1024)::BIGINT AS shard FROM documents),
         |ps AS (SELECT source, shard, count(*)::BIGINT AS docs,
         |    sum(n_toks)::BIGINT AS toks FROM nt GROUP BY 1, 2),
         |pw AS (SELECT *, ((toks + 511) // 512)::BIGINT AS seqs FROM ps)
         |SELECT source, count(*)::BIGINT AS n_shards,
         |  sum(docs)::BIGINT AS n_docs, sum(toks)::BIGINT AS n_tokens,
         |  sum(seqs)::BIGINT AS n_seqs,
         |  sum(seqs * 512 - toks)::BIGINT AS waste_tokens,
         |  max(toks)::BIGINT AS max_shard_tokens
         |FROM pw GROUP BY source""".stripMargin,

    "text_tfidf" ->
      s"""WITH $docToks,
         |tk AS (SELECT doc_id, unnest(toks) AS tok FROM dt),
         |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tfc FROM tk GROUP BY 1, 2),
         |dfc AS (SELECT tok, count(*)::BIGINT AS dfc FROM tf GROUP BY 1),
         |n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
         |sc AS (SELECT tf.doc_id, tf.tok,
         |    tf.tfc::DOUBLE * n.nd / dfc.dfc::DOUBLE AS score
         |  FROM tf JOIN dfc USING (tok) CROSS JOIN n),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, tok)::BIGINT AS rk FROM sc)
         |SELECT doc_id, tok, rk, (round(score, 6) + 0.0) AS score
         |FROM rk WHERE rk <= 3""".stripMargin,

    "text_decontaminate" ->
      s"""WITH $docHashes,
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM ds),
         |bs AS (SELECT DISTINCT unnest(shd) AS g FROM shd WHERE doc_id % 50 = 0),
         |cd AS (SELECT doc_id, unnest(shd) AS g FROM shd WHERE doc_id % 50 <> 0)
         |SELECT cd.doc_id, count(*) AS n_shared
         |FROM cd JOIN bs USING (g) GROUP BY cd.doc_id""".stripMargin,

    "sample_hash" ->
      s"""SELECT doc_id::BIGINT AS doc_id, source, n_chars FROM documents
         |WHERE (((doc_id::BIGINT % $P) * 2654435761) % $P) % 20 = 0""".stripMargin,

    "sample_stratified" ->
      s"""WITH h AS (SELECT doc_id::BIGINT AS doc_id, source,
         |    ((doc_id::BIGINT % $P) * 2654435761) % $P AS h FROM documents),
         |r AS (SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)::BIGINT AS rk
         |  FROM h)
         |SELECT doc_id, source, rk FROM r WHERE rk <= 10""".stripMargin,

    "sample_temperature" ->
      s"""WITH d AS (SELECT doc_id::BIGINT AS doc_id, source,
         |    ((doc_id::BIGINT % $P) * 2654435761) % $P AS h FROM documents),
         |c AS (SELECT source, count(*)::BIGINT AS n FROM d GROUP BY 1),
         |cw AS (SELECT *, CAST(round(sqrt(n::DOUBLE) * 1000000.0) AS BIGINT)
         |    AS w FROM c),
         |t AS (SELECT sum(w)::BIGINT AS tw FROM cw),
         |q AS (SELECT source, greatest(1, CAST(floor(100.0 * w::DOUBLE
         |    / tw::DOUBLE) AS BIGINT)) AS quota FROM cw, t),
         |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY h, doc_id)::BIGINT AS rk FROM d)
         |SELECT r.doc_id, r.source, r.rk, q.quota
         |FROM r JOIN q USING (source) WHERE r.rk <= q.quota""".stripMargin,

    "sample_balanced" ->
      s"""WITH hb AS (SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
         |    ((vec_id::BIGINT % $P) * 2654435761) % $P AS h FROM embeddings),
         |nm AS (SELECT coalesce(min(c), 0)::BIGINT AS n_min FROM (
         |    SELECT count(*)::BIGINT AS c FROM hb GROUP BY label)),
         |r AS (SELECT vec_id, label,
         |    row_number() OVER (PARTITION BY label ORDER BY h, vec_id)::BIGINT AS rk
         |  FROM hb)
         |SELECT vec_id, label, rk FROM r CROSS JOIN nm WHERE rk <= nm.n_min""".stripMargin,

    "sample_weighted" ->
      s"""SELECT doc_id::BIGINT AS doc_id, source, n_chars,
         |  (1 + CAST(substr(source, 4) AS INT) % 5)::BIGINT AS w
         |FROM documents
         |WHERE ((doc_id::BIGINT % $P) * 2654435761) % $P * 5
         |  < (1 + CAST(substr(source, 4) AS INT) % 5)::BIGINT * $P::BIGINT""".stripMargin,

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

    "emb_neardup" ->
      s"""WITH $embBase
         |SELECT x.vec_id AS a, y.vec_id AS b,
         |  (round(${dotD("x.v", "y.v")} / (x.nrm * y.nrm), 6) + 0.0) AS sim
         |FROM en x JOIN en y ON x.vec_id < y.vec_id
         |WHERE ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) > 0.3""".stripMargin,

    "sim_topk" ->
      s"""WITH $embBase,
         |qs AS (SELECT * FROM en WHERE vec_id % 10 = 0),
         |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM qs x JOIN en y ON x.vec_id <> y.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim FROM rk WHERE rank <= 5""".stripMargin,

    "sample_hard_negatives" ->
      s"""WITH el AS (SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
         |    embedding::DOUBLE[] AS v FROM embeddings),
         |eln AS (SELECT *, sqrt(${dotD("v", "v")}) AS nrm FROM el),
         |qs AS (SELECT * FROM eln WHERE vec_id % 10 = 0),
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
         |qs AS (SELECT * FROM eln WHERE vec_id % 10 = 0),
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
         |qs AS (SELECT * FROM eb WHERE vec_id % 10 = 0),
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
         |  FROM da WHERE vec_id % 10 = 0),
         |qsg AS (SELECT vec_id AS q_id, vq AS qv, ${sigD(annBitsD)} AS sig FROM qa),
         |sims AS (SELECT q.q_id, d.vec_id AS n_id, ${dotD("q.qv", "d.vq")} AS ip
         |  FROM qsg q JOIN ds d ON q.sig = d.sig AND q.q_id <> d.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id)::BIGINT AS rank FROM sims)
         |SELECT q_id, n_id, rank, (round(ip, 6) + 0.0) AS ip FROM rk WHERE rank <= 3""".stripMargin,

    "sim_mips_recall" ->
      s"""WITH $embBase,
         |qs AS (SELECT * FROM eb WHERE vec_id % 10 = 0),
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
         |  FROM da WHERE vec_id % 10 = 0),
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
         |qs AS (SELECT * FROM en WHERE vec_id % 10 = 0),
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
         |  WHERE rank <= 3 AND q_id % 10 = 0),
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
         |qs AS (SELECT * FROM assigned WHERE vec_id % 25 = 0),
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
         |  WHERE crank <= 2 AND vec_id % 25 = 0),
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
         |q1 AS (SELECT * FROM n1 WHERE vec_id % 10 = 0),
         |s1 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.vk", "y.vk")} / (x.nrm * y.nrm) AS sim
         |  FROM q1 x JOIN n1 y ON x.vec_id <> y.vec_id),
         |a1 AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s1)
         |  WHERE rank <= 3),
         |t2 AS (SELECT vec_id, v[1:dk.k2] AS vk FROM eb CROSS JOIN dk),
         |n2 AS (SELECT *, sqrt(${dotD("vk", "vk")}) AS nrm FROM t2),
         |q2 AS (SELECT * FROM n2 WHERE vec_id % 10 = 0),
         |s2 AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${dotD("x.vk", "y.vk")} / (x.nrm * y.nrm) AS sim
         |  FROM q2 x JOIN n2 y ON x.vec_id <> y.vec_id),
         |a2 AS (SELECT q_id, n_id FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s2)
         |  WHERE rank <= 3),
         |xq AS (SELECT * FROM en WHERE vec_id % 10 = 0),
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
         |qs1 AS (SELECT * FROM assigned WHERE vec_id % 50 = 0),
         |qs2 AS (SELECT vec_id, v, nrm, c_id AS cell FROM asg1
         |  WHERE crank <= 2 AND vec_id % 50 = 0),
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
         |xq AS (SELECT * FROM en WHERE vec_id % 50 = 0),
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
         |qs AS (SELECT * FROM assigned WHERE vec_id % 25 = 0),
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
         |iqs AS (SELECT * FROM iassigned WHERE vec_id % 50 = 0),
         |tqs AS (SELECT * FROM tassigned WHERE vec_id % 50 = 0),
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
         |xq AS (SELECT * FROM en WHERE vec_id % 50 = 0),
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

    "mm_resize" ->
      """SELECT doc_id::BIGINT AS doc_id,
        |  ((octet_length(text::BLOB) + 3) // 4)::BIGINT AS thumb_bytes,
        |  unicode(substr(text, 1, 1))::BIGINT AS first_byte
        |FROM documents""".stripMargin,

    "mm_frames" ->
      """WITH d AS (SELECT doc_id::BIGINT AS doc_id, text,
        |    octet_length(text::BLOB) AS n FROM documents),
        |f AS (SELECT doc_id, text, n,
        |    unnest(generate_series(0, (n + 63) // 64 - 1)) AS frame_idx FROM d)
        |SELECT doc_id, frame_idx::BIGINT AS frame_idx,
        |  least(64, n - frame_idx * 64)::BIGINT AS frame_bytes,
        |  unicode(substr(text, (frame_idx * 64 + 1)::INT, 1))::BIGINT AS frame_first
        |FROM f""".stripMargin,

    "asof_join" ->
      """WITH ev AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
        |    event_type, value FROM events),
        |clicks AS (SELECT user_id, t, (round(value, 6) + 0.0) AS click_value
        |  FROM ev WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, t, max(value) AS purchase_value
        |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.t, c.click_value,
        |  (round(p.purchase_value, 6) + 0.0) AS purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.t >= p.t""".stripMargin,

    "asof_nearest" ->
      """WITH ev AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
        |    event_type, value FROM events),
        |clicks AS (SELECT user_id, t, (round(value, 6) + 0.0) AS click_value
        |  FROM ev WHERE event_type = 'click'),
        |pback AS (SELECT user_id, t, max(value) AS pv FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2),
        |pfwd AS (SELECT user_id, t, min(value) AS pv FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.t, c.click_value,
        |  (round(CASE
        |    WHEN pb.t IS NULL THEN pf.pv
        |    WHEN pf.t IS NULL THEN pb.pv
        |    WHEN c.t - pb.t <= pf.t - c.t THEN pb.pv
        |    ELSE pf.pv END, 6) + 0.0) AS purchase_value
        |FROM clicks c
        |ASOF LEFT JOIN pback pb
        |  ON c.user_id = pb.user_id AND c.t >= pb.t
        |ASOF LEFT JOIN pfwd pf
        |  ON c.user_id = pf.user_id AND c.t < pf.t""".stripMargin,

    "asof_tolerance" ->
      """WITH ev AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS t,
        |    event_type, value FROM events),
        |clicks AS (SELECT user_id, t, (round(value, 6) + 0.0) AS click_value
        |  FROM ev WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, t, max(value) AS purchase_value
        |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.t, c.click_value,
        |  (round(CASE WHEN c.t - p.t <= 86400000000 THEN p.purchase_value END, 6)
        |    + 0.0) AS purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.t >= p.t""".stripMargin,

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

    "mm_decode" ->
      """SELECT doc_id::BIGINT AS doc_id,
        |  octet_length(text::BLOB)::BIGINT AS n_bytes,
        |  unicode(substr(text, 1, 1))::BIGINT AS first_byte,
        |  unicode(substr(text, length(text), 1))::BIGINT AS last_byte,
        |  (length(text) - length(replace(text, ' ', '')))::BIGINT AS n_spaces
        |FROM documents""".stripMargin,

    // The stub payload is the utf-8 text (ASCII corpus), so the byte
    // sampled at i*stride equals unicode() of that character (same
    // single-byte assumption mm_decode's oracle already makes). The 's'
    // regex flag keeps '.' matching newlines, and coalesce mirrors the
    // Spark side's null-payload-as-empty rule.
    "mm_phash" ->
      """WITH cs AS (SELECT doc_id::BIGINT AS doc_id,
        |    list_transform(regexp_extract_all(coalesce(text, ''), '.', 0, 's'),
        |      c -> unicode(c)::BIGINT) AS codes
        |  FROM documents),
        |st AS (SELECT doc_id, codes, least(32, len(codes)) AS k,
        |    greatest(1, len(codes) // 32) AS stride FROM cs),
        |px AS (SELECT doc_id, k, list_transform(generate_series(1, k),
        |    i -> codes[(i - 1) * stride + 1]) AS px FROM st),
        |mn AS (SELECT doc_id, k, px,
        |    CASE WHEN k = 0 THEN 0.0 ELSE
        |      list_reduce(list_prepend(0::BIGINT, px), (a, b) -> a + b)::DOUBLE / k::DOUBLE
        |    END AS mean FROM px),
        |ph AS (SELECT doc_id,
        |    CASE WHEN k = 0 THEN 0::BIGINT ELSE
        |      list_reduce(list_prepend(0::BIGINT,
        |        list_transform(generate_series(1, k),
        |          i -> CASE WHEN px[i]::DOUBLE >= mean THEN (1::BIGINT << (i - 1))
        |               ELSE 0::BIGINT END)),
        |        (a, b) -> a | b)
        |    END AS phash FROM mn)
        |SELECT doc_id, phash,
        |  count(*) OVER (PARTITION BY phash)::BIGINT AS n_same
        |FROM ph""".stripMargin,

    "mm_phash_neardup" ->
      """WITH cs AS (SELECT doc_id::BIGINT AS doc_id,
        |    list_transform(regexp_extract_all(coalesce(text, ''), '.', 0, 's'),
        |      c -> unicode(c)::BIGINT) AS codes
        |  FROM documents),
        |st AS (SELECT doc_id, codes, least(32, len(codes)) AS k,
        |    greatest(1, len(codes) // 32) AS stride FROM cs),
        |px AS (SELECT doc_id, k, list_transform(generate_series(1, k),
        |    i -> codes[(i - 1) * stride + 1]) AS px FROM st),
        |mn AS (SELECT doc_id, k, px,
        |    CASE WHEN k = 0 THEN 0.0 ELSE
        |      list_reduce(list_prepend(0::BIGINT, px), (a, b) -> a + b)::DOUBLE / k::DOUBLE
        |    END AS mean FROM px),
        |ph AS (SELECT doc_id,
        |    CASE WHEN k = 0 THEN 0::BIGINT ELSE
        |      list_reduce(list_prepend(0::BIGINT,
        |        list_transform(generate_series(1, k),
        |          i -> CASE WHEN px[i]::DOUBLE >= mean THEN (1::BIGINT << (i - 1))
        |               ELSE 0::BIGINT END)),
        |        (a, b) -> a | b)
        |    END AS phash FROM mn),
        |bd0 AS (SELECT doc_id, phash, unnest([0, 1, 2, 3]) AS j FROM ph),
        |bd1 AS (SELECT *, (phash >> (j * 8)) & 255 AS bv FROM bd0),
        |bdc AS (SELECT *, count(*) OVER (PARTITION BY j, bv) AS bn FROM bd1),
        |bd AS (SELECT doc_id, phash, j, bv FROM bdc WHERE bn <= 64)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  bit_count(xor(x.phash, y.phash))::BIGINT AS hamming
        |FROM bd x JOIN bd y
        |  ON x.j = y.j AND x.bv = y.bv AND x.doc_id < y.doc_id
        |WHERE ((CASE WHEN ((x.phash >> 0) & 255) = ((y.phash >> 0) & 255)
        |      THEN 1 ELSE 0 END
        |    + CASE WHEN ((x.phash >> 8) & 255) = ((y.phash >> 8) & 255)
        |      THEN 2 ELSE 0 END
        |    + CASE WHEN ((x.phash >> 16) & 255) = ((y.phash >> 16) & 255)
        |      THEN 4 ELSE 0 END
        |    + CASE WHEN ((x.phash >> 24) & 255) = ((y.phash >> 24) & 255)
        |      THEN 8 ELSE 0 END)
        |   & ((1 << x.j) - 1)) = 0
        |  AND bit_count(xor(x.phash, y.phash)) <= 3""".stripMargin,

    "mm_phash_skipped" ->
      """WITH cs AS (SELECT doc_id::BIGINT AS doc_id,
        |    list_transform(regexp_extract_all(coalesce(text, ''), '.', 0, 's'),
        |      c -> unicode(c)::BIGINT) AS codes
        |  FROM documents),
        |st AS (SELECT doc_id, codes, least(32, len(codes)) AS k,
        |    greatest(1, len(codes) // 32) AS stride FROM cs),
        |px AS (SELECT doc_id, k, list_transform(generate_series(1, k),
        |    i -> codes[(i - 1) * stride + 1]) AS px FROM st),
        |mn AS (SELECT doc_id, k, px,
        |    CASE WHEN k = 0 THEN 0.0 ELSE
        |      list_reduce(list_prepend(0::BIGINT, px), (a, b) -> a + b)::DOUBLE / k::DOUBLE
        |    END AS mean FROM px),
        |ph AS (SELECT doc_id,
        |    CASE WHEN k = 0 THEN 0::BIGINT ELSE
        |      list_reduce(list_prepend(0::BIGINT,
        |        list_transform(generate_series(1, k),
        |          i -> CASE WHEN px[i]::DOUBLE >= mean THEN (1::BIGINT << (i - 1))
        |               ELSE 0::BIGINT END)),
        |        (a, b) -> a | b)
        |    END AS phash FROM mn),
        |bd0 AS (SELECT doc_id, phash, unnest([0, 1, 2, 3]) AS j FROM ph),
        |bd1 AS (SELECT *, (phash >> (j * 8)) & 255 AS bv FROM bd0),
        |g AS (SELECT j, bv, count(*)::BIGINT AS n FROM bd1 GROUP BY 1, 2)
        |SELECT sum(n)::BIGINT AS n_rows_total,
        |  count(CASE WHEN n > 64 THEN 1 END)::BIGINT AS n_buckets_capped,
        |  coalesce(sum(CASE WHEN n > 64 THEN n END), 0)::BIGINT
        |    AS n_rows_dropped
        |FROM g HAVING count(*) > 0""".stripMargin,

    "profile_docs" ->
      """WITH w AS (SELECT count(*)::BIGINT AS n_rows,
        |    count(text)::BIGINT AS nn_text, count(lang)::BIGINT AS nn_lang,
        |    count(source)::BIGINT AS nn_source,
        |    count(DISTINCT lang)::BIGINT AS d_lang,
        |    count(DISTINCT source)::BIGINT AS d_source,
        |    min(n_chars)::BIGINT AS min_chars,
        |    max(n_chars)::BIGINT AS max_chars
        |  FROM documents GROUP BY TRUE)
        |SELECT 'lang' AS column_name, n_rows, n_rows - nn_lang AS n_null,
        |  d_lang AS n_distinct, min_chars, max_chars FROM w
        |UNION ALL
        |SELECT 'source', n_rows, n_rows - nn_source, d_source,
        |  min_chars, max_chars FROM w
        |UNION ALL
        |SELECT 'text', n_rows, n_rows - nn_text, NULL::BIGINT,
        |  min_chars, max_chars FROM w""".stripMargin,

    "text_unigram_lp" ->
      s"""WITH $docToks,
         |tk AS (SELECT doc_id, unnest(toks) AS tok FROM dt),
         |v AS (SELECT tok, count(*)::BIGINT AS c FROM tk GROUP BY 1),
         |n AS (SELECT count(*)::DOUBLE AS nt FROM tk)
         |SELECT tk.doc_id, count(*)::BIGINT AS n_toks,
         |  (round(avg(log10(v.c::DOUBLE / n.nt)), 6) + 0.0) AS avg_lp
         |FROM tk JOIN v USING (tok) CROSS JOIN n
         |GROUP BY 1""".stripMargin,

    "emb_centroids" ->
      """WITH x AS (SELECT label::BIGINT AS label,
        |    unnest(embedding::DOUBLE[]) AS x,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings)
        |SELECT label, dim::BIGINT AS dim, count(*)::BIGINT AS n,
        |  (round(avg(x), 6) + 0.0) AS centroid
        |FROM x GROUP BY 1, 2""".stripMargin,

    "corpus_mix" ->
      s"""WITH d AS (SELECT source,
         |    len($toksDuck)::BIGINT AS n_tok FROM documents),
         |g AS (SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(n_tok)::BIGINT AS n_tokens FROM d GROUP BY 1),
         |pp AS (SELECT *, CAST(n_tokens AS DOUBLE)
         |    / CAST(sum(n_tokens) OVER () AS DOUBLE) AS p FROM g),
         |ww AS (SELECT *, sqrt(p) / sum(sqrt(p)) OVER () AS w FROM pp)
         |SELECT source, n_docs, n_tokens,
         |  (round(p, 6) + 0.0) AS p, (round(w, 6) + 0.0) AS w,
         |  (round(w / p, 6) + 0.0) AS epochs
         |FROM ww""".stripMargin,

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

    "corpus_split" ->
      s"""WITH d AS (SELECT source, doc_id::BIGINT AS doc_id,
         |    len($toksDuck)::BIGINT AS n_tok FROM documents),
         |b AS (SELECT source, n_tok,
         |    (((doc_id % $P) * 2654435761) % $P) % 100 AS bucket FROM d),
         |sp AS (SELECT source, n_tok,
         |    CASE WHEN bucket < 98 THEN 'train'
         |         WHEN bucket = 98 THEN 'valid'
         |         ELSE 'test' END AS split FROM b),
         |g AS (SELECT source, split, count(*)::BIGINT AS n_docs,
         |    sum(n_tok)::BIGINT AS n_tokens FROM sp GROUP BY 1, 2)
         |SELECT source, split, n_docs, n_tokens,
         |  (round((CAST(n_docs AS DOUBLE)
         |    / CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS doc_share,
         |  (round((CAST(n_tokens AS DOUBLE)
         |    / CAST(sum(n_tokens) OVER (PARTITION BY source) AS DOUBLE))
         |   * 1000000.0) / 1000000.0 + 0.0) AS tok_share
         |FROM g""".stripMargin,

    "corpus_ngrams" ->
      s"""WITH t AS (SELECT $toksDuck AS toks FROM documents),
         |f AS (SELECT toks FROM t WHERE len(toks) >= 2),
         |bg AS (SELECT unnest(list_transform(
         |    generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM f)
         |SELECT bigram, count(*)::BIGINT AS n FROM bg GROUP BY 1
         |ORDER BY n DESC, bigram LIMIT 25""".stripMargin,

    "text_dsir" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, lang,
         |    $toksDuck AS toks FROM documents),
         |dh AS (SELECT doc_id, lang,
         |    list_transform(${wordHashesDuck("toks")}, h -> h % 1024) AS f
         |  FROM dt WHERE len(toks) > 0),
         |ex AS (SELECT lang, unnest(f) AS b FROM dh),
         |cnt AS (SELECT b, count(*)::BIGINT AS n_all,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_t
         |  FROM ex GROUP BY 1),
         |st AS (SELECT b, CAST(round(
         |    CAST((n_t + 1) * (sum(n_all) OVER () + 1024) AS DOUBLE)
         |    / CAST((n_all + 1) * (sum(n_t) OVER () + 1024) AS DOUBLE)
         |    * 1000000.0) AS BIGINT) AS r_i6
         |  FROM cnt),
         |dx AS (SELECT doc_id, lang, unnest(f) AS b FROM dh),
         |j AS (SELECT dx.doc_id, dx.lang, st.r_i6
         |  FROM dx JOIN st USING (b)),
         |g AS (SELECT doc_id, lang, count(*)::BIGINT AS n_f,
         |    sum(r_i6)::BIGINT AS sr FROM j GROUP BY 1, 2)
         |SELECT doc_id, lang, n_f,
         |  (round((CAST(sr AS DOUBLE) / CAST(n_f AS DOUBLE) / 1000000.0)
         |   * 1000000.0) / 1000000.0 + 0.0) AS dsir_w,
         |  CAST(sr AS DOUBLE) / CAST(n_f AS DOUBLE) / 1000000.0 > 1.0 AS keep
         |FROM g""".stripMargin,

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

    "mm_audio_rms" ->
      """WITH d AS (SELECT doc_id::BIGINT AS doc_id, text,
        |    octet_length(coalesce(text, '')::BLOB) AS n FROM documents),
        |p AS (SELECT doc_id, text, n,
        |    unnest(generate_series(1, n)) AS pos FROM d),
        |b AS (SELECT doc_id, (pos - 1) // 256 AS frame_idx,
        |    unicode(substr(text, pos::INT, 1))::BIGINT AS v FROM p),
        |g AS (SELECT doc_id, frame_idx::BIGINT AS frame_idx,
        |    count(*)::BIGINT AS n_samples, sum(v * v)::BIGINT AS energy
        |  FROM b GROUP BY 1, 2)
        |SELECT doc_id, frame_idx, n_samples, energy,
        |  (round(sqrt(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE))
        |   * 1000000.0) / 1000000.0 + 0.0) AS rms
        |FROM g""".stripMargin,

    "mm_scene_cuts" ->
      """WITH d AS (SELECT doc_id::BIGINT AS doc_id, text,
        |    octet_length(coalesce(text, '')::BLOB) AS n FROM documents),
        |p AS (SELECT doc_id, text, n,
        |    unnest(generate_series(1, n)) AS pos FROM d),
        |b AS (SELECT doc_id, (pos - 1) // 256 AS frame_idx,
        |    unicode(substr(text, pos::INT, 1))::BIGINT AS v FROM p),
        |g AS (SELECT doc_id, frame_idx::BIGINT AS frame_idx,
        |    sum(v * v)::BIGINT AS energy FROM b GROUP BY 1, 2),
        |l AS (SELECT doc_id, energy, lag(energy) OVER
        |    (PARTITION BY doc_id ORDER BY frame_idx) AS pe FROM g),
        |c AS (SELECT doc_id, energy, pe, abs(energy - pe) AS jump,
        |    (pe IS NOT NULL AND abs(energy - pe) * 4 > pe) AS cut FROM l)
        |SELECT doc_id, count(*)::BIGINT AS n_frames,
        |  sum(CASE WHEN cut THEN 1 ELSE 0 END)::BIGINT AS n_cuts,
        |  coalesce(max(CASE WHEN cut THEN jump END), 0)::BIGINT AS max_jump
        |FROM c GROUP BY 1""".stripMargin,

    "text_bigram_lp" ->
      s"""WITH $docToks,
         |tk AS (SELECT doc_id, unnest(toks) AS tok FROM dt),
         |c1 AS (SELECT tok AS w1, count(*)::BIGINT AS c1 FROM tk GROUP BY 1),
         |vs AS (SELECT count(*)::DOUBLE AS v FROM c1),
         |bg AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - 1),
         |      i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
         |  FROM dt WHERE len(toks) >= 2),
         |b2 AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
         |c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2
         |  FROM b2 GROUP BY 1, 2)
         |SELECT b2.doc_id, count(*)::BIGINT AS n_bigrams,
         |  (round(avg(log10((CAST(c2.c2 AS DOUBLE) + 1.0)
         |    / (CAST(c1.c1 AS DOUBLE) + vs.v))), 6) + 0.0) AS avg_lp
         |FROM b2 JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vs
         |GROUP BY 1""".stripMargin,

    "text_entropy" ->
      """WITH c AS (SELECT doc_id::BIGINT AS doc_id,
        |    unnest(regexp_extract_all(text, '.')) AS ch FROM documents),
        |g AS (SELECT doc_id, ch, count(*)::BIGINT AS n
        |  FROM c GROUP BY 1, 2),
        |t AS (SELECT doc_id, n,
        |    sum(n) OVER (PARTITION BY doc_id)::BIGINT AS nn FROM g),
        |q AS (SELECT doc_id, nn,
        |    CAST(round((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * log2(CAST(nn AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS term
        |  FROM t)
        |SELECT doc_id, max(nn)::BIGINT AS n_chars,
        |  count(*)::BIGINT AS n_distinct,
        |  (round((CAST(sum(term) AS DOUBLE) / 1000000.0)
        |   * 1000000.0) / 1000000.0 + 0.0) AS entropy
        |FROM q GROUP BY 1""".stripMargin,

    "text_readability" ->
      s"""WITH d AS (SELECT doc_id::BIGINT AS doc_id, lang,
         |    len($toksDuck)::BIGINT AS n_words,
         |    greatest(len(regexp_extract_all(text, '[.!?]')), 1)::BIGINT
         |      AS n_sents,
         |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
         |      AS n_syll
         |  FROM documents),
         |f AS (SELECT *,
         |    CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE) AS wps,
         |    CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE) AS spw
         |  FROM d WHERE n_words > 0)
         |SELECT doc_id, lang, n_words, n_sents, n_syll,
         |  (round((206.835 - 1.015 * wps - 84.6 * spw)
         |   * 1000000.0) / 1000000.0 + 0.0) AS flesch,
         |  (round((0.39 * wps + 11.8 * spw - 15.59)
         |   * 1000000.0) / 1000000.0 + 0.0) AS fk_grade
         |FROM f""".stripMargin)
}
