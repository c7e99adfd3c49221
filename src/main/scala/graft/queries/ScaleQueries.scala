package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.{PageRank, TextOps}
import graft.functions.GraftFunctions
import ExtCommon.{TopkSplit, IvfQuerySplit, HybridSplit}

/** Round-4 scale-path operators: the remaining building blocks a
  * 100 TB training-data pipeline runs that the earlier rounds had not
  * yet covered —
  *
  *  - `dedup_lines`: C4/RefinedWeb-style cross-document exact segment
  *    dedup (explode unit → global keep-first → reassemble);
  *  - `dedup_neighbors`: blocked sorted-neighborhood near-dup — the
  *    sort-based alternative to pair joins (one exchange + sort, no
  *    join at all);
  *  - `join_bloom`: bloom-filter join pruning — the broadcast bitset
  *    that keeps a selective dim filter from shuffling the fact table;
  *  - `emb_quantize`: int8 scalar quantization of the embedding
  *    column with per-dimension corpus bounds;
  *  - `sketch_cms`: count-min-sketch heavy-hitter estimates vs exact;
  *  - `ts_resample`: OHLC + VWAP bar downsampling (the reference's
  *    bar domain, data_download_yahoo.py:42-51, at a coarser grid).
  *
  * Every query has a token-equivalent DuckDB oracle; every hash is the
  * same integer arithmetic mod 1e9+7 used by [[graft.ext.TextOps]] so
  * both engines agree bit-for-bit.
  */
object ScaleQueries {

  import TextOps.{P, toksSpark, toksDuck, wordHashesDuck}

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Tokens per dedup_lines segment ("line" stand-in: the corpus has no
    * newlines, so fixed 8-token windows play the role of lines; the
    * operator shape — explode → corpus-wide keep-first → reassemble —
    * is the real C4 rule). */
  private val SegTok = 8

  /** Bloom parameters: k hashes into an m-bit space. m is sized for the
    * test corpus; at scale m grows with the build side (bits ≈ 10×keys
    * for ~1% false positives) and stays broadcast-cheap as a bitmap. */
  private val BloomK = 4
  private val BloomM = 8192L

  /** Count-min width/depth: d independent rows of w counters. */
  private val CmsD = 3
  private val CmsW = 1024L

  /** One level of the Hilbert xy2d recurrence at s = 2^i: given the
    * level-k coordinate/key column names, returns (x', y', d')
    * expression texts made of CASE/mask/integer arithmetic only —
    * valid verbatim in BOTH Spark SQL and DuckDB, so the engines run
    * the identical integer program. q is (3·rx) xor ry spelled as a
    * CASE (DuckDB's ^ is power, not xor). */
  private[graft] def hilbertLevel(i: Int, x: String, y: String, d: String)
      : (String, String, String) = {
    val s = 1L << i
    val rx = s"(CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)"
    val q = s"(CASE WHEN $rx = 0 AND $ry = 0 THEN 0 WHEN $rx = 0 THEN 1" +
      s" WHEN $ry = 1 THEN 2 ELSE 3 END)"
    val xT = s"(CASE WHEN $rx = 1 THEN ${s - 1} - $x ELSE $x END)"
    val yT = s"(CASE WHEN $rx = 1 THEN ${s - 1} - $y ELSE $y END)"
    (s"(CASE WHEN $ry = 0 THEN $yT ELSE $x END)",
      s"(CASE WHEN $ry = 0 THEN $xT ELSE $y END)",
      s"($d + ${s * s} * $q)")
  }

  /** Five-minute bars from the one-minute grid. */
  private val BarStep = 5L * EventBars.StepMicros

  // ---- join_bloom's bitmap builders ----
  // shared with EngineProps' no-false-negatives property so the test
  // exercises the PRODUCTION expressions, not a drifting replica

  /** k bit positions of `key` in the m-bit bloom space. */
  private[graft] def bloomPosOf(key: String): String =
    s"transform(sequence(0, ${BloomK - 1}), " +
      s"j -> (($key*(2*j + 1) + j*7919 + 1) % $P) % $BloomM)"

  /** The packed-word bitmap: ONE row, `bits` = m/64 longs. */
  private[graft] def bloomBits(keyed: DataFrame, keyCol: String): DataFrame =
    keyed.select(explode(expr(bloomPosOf(keyCol))).as("pos"))
      .groupBy(expr("pos DIV 64").as("w"))
      .agg(bit_or(expr("CAST(1 AS BIGINT) << CAST(pos % 64 AS INT)")).as("b"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("b"))).as("m"))
      .select(expr(
        s"transform(sequence(0, ${BloomM / 64 - 1}), w -> coalesce(m[CAST(w AS BIGINT)], 0L))")
        .as("bits"))

  /** Membership probe of `key` against the crossJoin'd `bits` column. */
  private[graft] def bloomProbe(key: String): String =
    s"forall(${bloomPosOf(key)}, " +
      "p -> (element_at(bits, CAST(p DIV 64 AS INT) + 1) >> CAST(p % 64 AS INT)) & 1 = 1)"

  // ---- emb_pq's block split + deterministic codebook ----
  // shared with sim_ivf_pq, whose ADC must score against the SAME codes

  /** (vec_id, block, sub): the 8×8-dim block split of `v`. */
  private def pqBlocks(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(expr("transform(sequence(0, 7), b -> slice(v, b*8 + 1, 8))"))
        .as(Seq("block", "sub")))

  /** (centroids, codes): 16 deterministic centroids per block (the
    * sub-vectors of vec_ids in [seedLo, seedLo+16)) and every vector's
    * argmin code with its quantization error. seedLo defaults to 0
    * (the 16 lowest vec_ids); the residual-PQ variant seeds from
    * nlist upward because the vec_ids below nlist ARE the coarse
    * centroids — their residuals are all-zero and would collapse the
    * codebook to one point. */
  private def pqCodebook(blocks: DataFrame, seedLo: Long = 0L): (DataFrame, DataFrame) = {
    val cents = blocks.filter(col("vec_id") >= seedLo && col("vec_id") < seedLo + 16)
      .select(col("vec_id").as("c_id"), col("block"), col("sub").as("csub"))
    val codes = blocks.join(broadcast(cents), "block")
      .withColumn("d2", expr(
        "aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), 0D, (a, c) -> a + c)"))
      .groupBy("vec_id", "block")
      .agg(min(struct(col("d2"), col("c_id"))).as("w"))
      .select(col("vec_id"), col("block"), col("w.c_id").as("code"),
        col("w.d2").as("dist2"))
    (cents, codes)
  }

  /** OPQ dimension allocation (the "eigenvalue allocation" step of
    * parametric OPQ, Ge et al. CVPR'13 §4, as FAISS's OPQ pre-transform
    * applies before PQ): rank dimensions by variance and deal them to
    * the 8 PQ blocks in snake order, balancing per-block variance mass
    * so no sub-quantizer's 4-bit budget is wasted on a flat subspace.
    * The permutation IS an orthogonal transform — the rotation family
    * restricted to axis swaps — which keeps every ADC distance exact
    * under the transform and (unlike a dense learned rotation, whose
    * 64×64 eigensolve has no DuckDB-expressible mirror) lets the
    * oracle reproduce the training bit-for-bit. Training is ONE
    * map-side-combinable aggregate: per-dim micro-quantized (sum,
    * sum-of-squares, n) — d rows cross the exchange per task — and the
    * d-length comparable `n·ss − s²` ranks in exact integers on the
    * driver (the d-bounded, data-independent collect posture emb_pca1
    * established). Returns perm with perm(block*8 + slot) = source dim
    * (0-based). Sums widen to DECIMAL(38,0)/HUGEINT so the comparable
    * stays exact at any corpus size (q² ≈ 1e14 per row overflows int64
    * sums past ~90k rows).
    */
  /** The one training aggregate of [[opqPerm]], exposed so PlanSpec can
    * pin its physical shape (single hash exchange on `dim`, partial
    * aggregation before it — d rows per map task cross the wire). */
  private[graft] def opqStats(e: DataFrame): DataFrame =
    e.select(posexplode(expr(
        "transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT))"))
        .as(Seq("dim", "q")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(q AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("ss"))

  private[graft] def opqPerm(e: DataFrame): Array[Int] = {
    val stats = opqStats(e)
      .collect()
      .map(r => (r.getInt(0), BigInt(r.getLong(1)),
        BigInt(r.getDecimal(2).toBigInteger),
        BigInt(r.getDecimal(3).toBigInteger)))
    val ranked = stats
      .map { case (dim, n, s2, ss) => (dim, n * ss - s2 * s2) }
      .sortBy { case (dim, c) => (-c, dim) }
    val perm = new Array[Int](ranked.length)
    ranked.zipWithIndex.foreach { case ((dim, _), r) =>
      val slot = r / 8
      val b = if ((r / 8) % 2 == 0) r % 8 else 7 - (r % 8)
      perm(b * 8 + slot) = dim
    }
    perm
  }

  /** (doc_id, seg_idx, seg text, seg hash) — one row per 8-token
    * segment. The segment hash is a base-131 fold of the word hashes,
    * so only 8-byte keys (plus the short segment text) ever shuffle. */
  private def segments(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", expr(toksSpark))
      .withColumn("wh", expr(s"graft_word_hashes($toksSpark)"))
      .filter(expr("size(wh) > 0"))
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, CAST((size(wh) - 1) DIV $SegTok AS INT)),
             |  i -> struct(
             |    concat_ws(' ', slice(toks, i*$SegTok + 1, $SegTok)) AS seg,
             |    aggregate(slice(wh, i*$SegTok + 1, $SegTok), 0L,
             |      (a, b) -> (a*131 + b) % $P) AS h))""".stripMargin))
          .as(Seq("seg_idx", "sg")))
      .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"),
        col("sg.seg").as("seg"), col("sg.h").as("h"))

  /** The residual-encoded IVF-PQ ANN tail shared by sim_ivf_pq_residual
    * (raw dimension order) and sim_ivf_opq (OPQ-permuted order): coarse
    * assign → residual vs the broadcast cell centroid → PQ codes seeded
    * from [nlist, nlist+16) → cell-probed ADC → top-3 per query. Input
    * `e` carries (vec_id, v, nrm). */
  private def ivfPqResidualAnn(e: DataFrame): DataFrame = {
    val nlist = ExtCommon.ivfNlist(e)
    val cents = e.filter(col("vec_id") < lit(nlist))
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    // (vec_id, v=residual, cell): the broadcast centroid join is the
    // only addition over sim_ivf_pq — v never re-shuffles for it
    val res = ExtCommon.assignCells(e, cents)
      .join(broadcast(cents.select(col("c_id").as("cell"), col("cv"))),
        Seq("cell"))
      .select(col("vec_id"),
        expr("zip_with(v, cv, (x, y) -> x - y)").as("v"), col("cell"))
      .localCheckpoint()
    val blocks = pqBlocks(res.select(col("vec_id"), col("v")))
    val (pqCents, codesFull) = pqCodebook(blocks, seedLo = nlist)
    val codes = codesFull.select(col("vec_id"), col("block"), col("code"))
    // ADC on residuals: query residual sub-vectors vs candidates'
    // residual-code centroids — q and its same-cell candidates share
    // the centroid, so residual ADC tracks ‖q − x‖² exactly as the
    // raw form does, minus the quantization distortion.
    val qBlocks = blocks.filter(col("vec_id") % IvfQuerySplit === 0)
      .join(res.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id").as("q_id"), col("cell"), col("block"),
        col("sub").as("qsub"))
    val cand = res.select(col("vec_id").as("n_id"), col("cell"))
      .join(codes.withColumnRenamed("vec_id", "n_id"), "n_id")
    qBlocks.join(cand, Seq("cell", "block"))
      .filter(col("q_id") =!= col("n_id"))
      .join(broadcast(pqCents.withColumnRenamed("c_id", "code")),
        Seq("block", "code"))
      .withColumn("bd", expr(
        "aggregate(zip_with(qsub, csub, (x, y) -> (x - y) * (x - y)), 0D, (a, c) -> a + c)"))
      .groupBy("q_id", "n_id")
      .agg(expr(
        "aggregate(transform(array_sort(collect_list(struct(block, bd))), p -> p.bd), 0D, (a, c) -> a + c)")
        .as("adc"))
      .withColumn("rank", expr(
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS BIGINT)"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"), col("rank"),
        Rounding.r6(col("adc")).as("adc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cross-document segment dedup (the C4/RefinedWeb line rule): each
    // distinct segment survives exactly once corpus-wide, at its first
    // occurrence (lowest (doc_id, seg_idx)); every other occurrence is
    // cut and the documents are reassembled from what remains. The
    // keep-first pick is an argmin struct — it folds in the partial
    // aggregates, so the groupBy shuffles one candidate per segment
    // hash per map task, and only surviving segment text is carried
    // into the rebuild. Docs that lose everything (or had no tokens)
    // still appear, with an empty clean_text.
    "dedup_lines" -> ((s, dir) => {
      // The segment pipeline (tokenize → hash → explode) runs ONCE:
      // the keep-first argmin struct carries the winning segment's
      // text through the partial aggregates — no join back to the
      // exploded segments — and per-doc totals come straight from the
      // token count (⌈|wh|/8⌉), a projection, not a second explode.
      val kept = segments(s, dir)
        .groupBy("h")
        .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.seg_idx").as("seg_idx"),
          col("m.seg").as("seg"))
      val totals = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(s"size($toksSpark)").as("nw"))
        .select(col("doc_id"),
          expr(s"CAST(CASE WHEN nw > 0 THEN (nw - 1) DIV $SegTok + 1" +
            " ELSE 0 END AS BIGINT)").as("n_segs"))
      val rebuilt = kept.groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(seg_idx, seg))), x -> x.seg)"))
          .as("clean_text"))
      totals
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
    }),

    // Blocked sorted-neighborhood near-dup: sort docs by (simhash,
    // doc_id) and compare each doc to its 2 predecessors — the
    // sort-based method that finds near-dups with ONE exchange + sort
    // and NO join (vs LSH's band join). Windows partition on the
    // simhash's high bits (the sort key's own prefix), so the sort is
    // fully parallel; neighbor pairs straddling a block boundary are
    // the method's documented recall trade (classic blocked SNM).
    // Similarity = hamming distance over the 16-bit simhash.
    "dedup_neighbors" -> ((s, dir) => {
      val hashed = docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(s"graft_word_hashes($toksSpark)"))
        .filter(expr("size(wh) > 0"))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("graft_simhash(wh, 16)").as("sh"))
        .withColumn("blk", expr("sh DIV 4096")) // top 4 of 16 bits
      val w = Window.partitionBy("blk").orderBy(col("sh"), col("doc_id"))
      hashed
        .withColumn("p1_id", lag(col("doc_id"), 1).over(w))
        .withColumn("p1_sh", lag(col("sh"), 1).over(w))
        .withColumn("p2_id", lag(col("doc_id"), 2).over(w))
        .withColumn("p2_sh", lag(col("sh"), 2).over(w))
        .select(col("doc_id"), col("sh"), expr(
          """stack(2, p1_id, CAST(bit_count(sh ^ p1_sh) AS BIGINT),
            |         p2_id, CAST(bit_count(sh ^ p2_sh) AS BIGINT))
            |  AS (nb_id, dist)""".stripMargin))
        .filter(col("nb_id").isNotNull && col("dist") <= 3)
        .select(col("nb_id").as("a"), col("doc_id").as("b"), col("dist"))
    }),

    // Bloom-filter join pruning: the BUILDING-segment customer keys are
    // folded into a k-hash bitmap (packed 64-bit words, built by a
    // 128-group bit_or aggregate and densified into ONE broadcast row;
    // probes are an O(1) shift-and-mask), and the orders scan drops
    // non-members BEFORE the exact semi-join. The bloom filter has no
    // false negatives, so the exact join behind it makes the result
    // identical to the plain semi-join — which is exactly what the
    // oracle runs. At 100 TB this is the difference between shuffling
    // the full fact table and shuffling the ~matching rows.
    "join_bloom" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val pruned = t(s, dir, "orders")
        .crossJoin(broadcast(bloomBits(cust, "c_custkey")))
        .filter(expr(bloomProbe("o_custkey")))
        .drop("bits")
      pruned.join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"),
          Rounding.r6(col("o_totalprice")).as("totalprice"))
    }),

    // Int8 scalar quantization of the embedding column: per-dimension
    // corpus min/max (64 rows — map-side partials collapse each task
    // to one row per dim before the shuffle), broadcast back, each
    // value mapped to 0..255 and recentered to -128..127. Output is
    // the long (vec_id, dim, q, err) shape; err is the reconstruction
    // error the quantized ANN path would pay. All bucket math is
    // identical IEEE double ops on both engines.
    "emb_quantize" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)")).as(Seq("dim", "x")))
      val bounds = e.groupBy("dim")
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      e.join(broadcast(bounds), "dim")
        .withColumn("q", expr(
          """CASE WHEN mx = mn THEN 0L
            |  ELSE CAST(least(255.0D, greatest(0.0D,
            |    floor((x - mn) / (mx - mn) * 255.0D + 0.5D))) AS BIGINT) - 128L
            |END""".stripMargin))
        .withColumn("deq", expr(
          "mn + (CAST(q + 128L AS DOUBLE) / 255.0D) * (mx - mn)"))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("q"),
          Rounding.r6(abs(col("x") - col("deq"))).as("err"))
    }),

    // Mergeable approximate QUANTILE sketch — the "swap for an approx
    // sketch at true scale" the exact-quantile comments promise, made
    // real and DETERMINISTIC: a bottom-K-by-hash value sample per
    // group. A partition's partial sketch is its K hash-smallest
    // (h, v) rows; merge(S1, S2) = bottomK(S1 ∪ S2) — commutative,
    // associative and order-independent, so ANY partitioning or merge
    // tree yields the SAME sample (a KLL compactor's coin-flips are
    // merge-order-dependent — they'd break both run-to-run determinism
    // and the DuckDB mirror). KMin.smallestBy IS that merge executed
    // two-phase: ≤K-row partial sketches per partition, one tiny merge
    // window — never a whole-group sort. Estimates are INTEGER-ranked:
    // the ⌈p·m⌉-th smallest sampled value (pure integer ceil — no
    // float rank math). The sketch's error is MEASURED, not assumed:
    // each estimate's exact rank in the full data comes back from one
    // broadcast-join pass, and max_rank_err is the number a 100 TB
    // pipeline monitors before trusting the sketch (K=512 ⇒ expected
    // rank error ~1/(2·√K) ≈ 2%; ScaleProbe re-measures at 30× rows).
    "sketch_quantile" -> ((s, dir) => {
      val K = 512
      val h = "(((l_orderkey * 71L + l_linenumber) % " +
        s"${TextOps.P}L) * 2654435761L) % ${TextOps.P}L"
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("v"),
          expr(h).as("h"), col("l_orderkey"), col("l_linenumber"))
      val samp = KMin.smallestBy(li, Seq("l_returnflag"),
        Seq("h", "l_orderkey", "l_linenumber"), K, "_rk")
      val sr = samp
        .withColumn("vr", row_number().over(Window
          .partitionBy("l_returnflag").orderBy(col("v"), col("h"))))
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy("l_returnflag")))
      def est(num: Int): org.apache.spark.sql.Column =
        max(when(col("vr") ===
          expr(s"greatest(1L, ($num * m + 99) DIV 100)"), col("v")))
      val ests = sr.groupBy("l_returnflag").agg(
        max(col("m")).cast("long").as("m_sample"),
        est(25).as("p25_est"), est(50).as("p50_est"),
        est(90).as("p90_est"), est(99).as("p99_est"))
      li.join(broadcast(ests), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), max(col("m_sample")).as("m_sample"),
          max(col("p25_est")).as("p25_est"),
          sum(when(col("v") <= col("p25_est"), 1L).otherwise(0L)).as("le25"),
          max(col("p50_est")).as("p50_est"),
          sum(when(col("v") <= col("p50_est"), 1L).otherwise(0L)).as("le50"),
          max(col("p90_est")).as("p90_est"),
          sum(when(col("v") <= col("p90_est"), 1L).otherwise(0L)).as("le90"),
          max(col("p99_est")).as("p99_est"),
          sum(when(col("v") <= col("p99_est"), 1L).otherwise(0L)).as("le99"))
        .select(col("l_returnflag"), col("n_rows"), col("m_sample"),
          col("p25_est"), col("p50_est"), col("p90_est"), col("p99_est"),
          Rounding.r6(greatest(
            abs(col("le25").cast("double") / col("n_rows").cast("double") - 0.25),
            abs(col("le50").cast("double") / col("n_rows").cast("double") - 0.50),
            abs(col("le90").cast("double") / col("n_rows").cast("double") - 0.90),
            abs(col("le99").cast("double") / col("n_rows").cast("double") - 0.99)))
            .as("max_rank_err"))
    }),

    // Count-min sketch vs ground truth: every token is hashed into d
    // independent rows of w counters (the d×w table shuffles 8-byte
    // (row, col) keys only — never tokens); a heavy hitter's estimate
    // is the min over its d cells, which can only overcount. The query
    // reports the top-20 exact tokens with their CMS estimates — the
    // sketch a 100 TB pipeline keeps when the exact vocabulary
    // aggregate is too wide to materialize per shard.
    "sketch_cms" -> ((s, dir) => {
      val cellsOf =
        s"transform(sequence(0, ${CmsD - 1}), " +
          s"j -> ((h*(2*j + 1) + j*7919 + 1) % $P) % $CmsW)"
      // token + its hash in one explode of zipped arrays — the per-token
      // hash comes from the native graft_word_hashes kernel (one pass
      // per doc), not a per-character HOF fold per exploded row
      val toks = docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(s"graft_word_hashes($toksSpark)"))
        .select(explode(arrays_zip(col("toks"), col("wh"))).as("z"))
        .select(col("z.toks").as("tok"), col("z.wh").as("h"))
      val sketch = toks
        .select(posexplode(expr(cellsOf)).as(Seq("j", "ccol")))
        .groupBy("j", "ccol").agg(count(lit(1)).as("c"))
      val top = toks.groupBy("tok", "h")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok"))
        .limit(20)
      top
        .select(col("tok"), col("n_exact"),
          posexplode(expr(cellsOf)).as(Seq("j", "ccol")))
        .join(sketch, Seq("j", "ccol"))
        .groupBy("tok", "n_exact")
        .agg(min(col("c")).as("n_est"))
        .select(col("tok"), col("n_exact"), col("n_est"))
    }),

    // SemDeDup-style semantic clustering: connected components over
    // the embedding near-dup graph (hyperplane-LSH candidate pairs at
    // cosine > 0.3 — emb_neardup_lsh's exact pair set). The composition
    // a pipeline runs to drop semantically redundant documents whose
    // TEXT never collides: vectors bucket by signature, pairs join by
    // equality, components iterate only on the (tiny) edge subgraph.
    "dedup_semantic" -> ((s, dir) => {
      val edges = ExtQueries.queries("emb_neardup_lsh")(s, dir)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("id"))
      graft.ext.ConnectedComponents(nodes, edges)
        .select(col("id").as("vec_id"), col("lbl").as("cluster_id"))
    }),

    // Product quantization (the PQ in IVF-PQ): each vector splits into
    // 8 sub-blocks of 8 dims; each block is coded as its nearest of 16
    // deterministic "trained" centroids (the sub-vectors of the 16
    // lowest vec_ids — same coarse-training stand-in as sim_ivf).
    // Output is the 8-byte-per-vector code book a 100 TB ANN index
    // actually stores, plus the per-block quantization error. The
    // centroid table is 128 tiny rows → broadcast; codes come from one
    // argmin-struct aggregate, so nothing but (vec_id, block, code)
    // ever shuffles.
    "emb_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val (_, codes) = pqCodebook(pqBlocks(e))
      codes.select(col("vec_id"), col("block").cast("long").as("block"),
        col("code"), Rounding.r6(col("dist2")).as("dist2"))
    }),

    // Fixed-iteration PageRank over the LSH near-dup graph — the
    // importance score a pipeline uses to pick canonical docs or
    // weight sampling. 5 power-iteration rounds, damping 0.85,
    // dangling mass NOT redistributed (singletons hold (1-0.85)/N);
    // the fixed round count keeps the doubles oracle-comparable.
    // Scale shape: see [[graft.ext.PageRank]] — edges materialize
    // once, each round is one exchange-aligned join + groupBy-sum,
    // singletons never iterate.
    "graph_pagerank" -> ((s, dir) => {
      val edges = ExtCommon.minhashPairs(s, dir)
        .filter(ExtCommon.jaccardExpr >= 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = docs(s, dir).select(col("doc_id").cast("long").as("id"))
      PageRank(nodes, edges, iters = 5, d = 0.85)
        .select(col("id").as("doc_id"), Rounding.r6(col("rank")).as("rank"))
    }),

    // Personalized PageRank over the same near-dup graph — TrustRank /
    // seed-expansion for data selection: rank every doc by random-walk
    // proximity to a curated seed set (here the deterministic ~1%
    // doc_id % 97 slice). Docs unreachable from the seeds hold exactly
    // 0 (no uniform teleport), so the score doubles as a reachability
    // certificate. Same fixed-round / no-dangling conventions and
    // exchange-aligned per-round shape as graph_pagerank.
    "graph_ppr" -> ((s, dir) => {
      val edges = ExtCommon.minhashPairs(s, dir)
        .filter(ExtCommon.jaccardExpr >= 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = docs(s, dir).select(col("doc_id").cast("long").as("id"))
      val seeds = nodes.filter(col("id") % 97 === 0)
      PageRank.personalized(nodes, edges, seeds, iters = 5, d = 0.85)
        .select(col("id").as("doc_id"), Rounding.r6(col("rank")).as("rank"))
    }),

    // HyperLogLog distinct sketch (m=64 registers, deterministic Knuth
    // hash): register = h mod 64, rho = leading-zero rank of h div 64
    // in a 24-bit space via the binary-string length both engines
    // print identically. The raw HLL estimate (no small-range
    // correction — libm log is not bit-portable) next to the exact
    // count. Every 2^-M term is dyadic, so the register sum is EXACT
    // in double on both engines regardless of order. The sketch
    // shuffles (type, register) pairs — 64 rows per group — which is
    // the whole point at 100 TB.
    "sketch_hll" -> ((s, dir) => {
      val hashed = EventBars.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"),
          col("user_id").cast("long").as("uid"),
          expr(s"((user_id % ${P}L) * 2654435761L) % ${P}L").as("h"))
      val regs = hashed
        .select(col("event_type"), (col("h") % 64).as("reg"),
          expr("h DIV 64").as("v"))
        .withColumn("rho",
          when(col("v") === 0, lit(25L))
            .otherwise(lit(25L) - length(bin(col("v"))).cast("long")))
        .groupBy("event_type", "reg").agg(max(col("rho")).as("m"))
      val est = regs.groupBy("event_type")
        .agg(sum(pow(lit(2.0), -col("m"))).as("sp"),
          count(lit(1)).as("nr"))
        .select(col("event_type"),
          (lit(0.709 * 64.0 * 64.0) /
            (col("sp") + (lit(64L) - col("nr")).cast("double"))).as("raw"))
      val exact = hashed.groupBy("event_type")
        .agg(countDistinct(col("uid")).as("n_exact"))
      exact.join(est, "event_type")
        .select(col("event_type"), col("n_exact"),
          Rounding.r4(col("raw")).as("est_distinct"))
    }),

    // The MERGE story sketch_hll's single pass doesn't show: per-DAY
    // (per-shard) HLL registers, merged by register-wise max into the
    // union estimate — what a 100 TB ingest persists per shard and
    // folds at read time; distinct counts don't add, registers do.
    // The report sets est_merged beside the exact global distinct AND
    // the per-shard-exact SUM (the naive number, overcounting every
    // cross-shard repeat). 2^-m terms are dyadic rationals — exact in
    // double, so even the estimate's sum is order-independent.
    "sketch_hll_merge" -> ((s, dir) => {
      val hashed = EventBars.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(expr("t DIV 86400000000").as("day"),
          col("user_id").cast("long").as("uid"),
          expr(s"((user_id % ${P}L) * 2654435761L) % ${P}L").as("h"))
        .localCheckpoint()
      val shardRegs = hashed
        .select(col("day"), (col("h") % 64).as("reg"), expr("h DIV 64").as("v"))
        .withColumn("rho",
          when(col("v") === 0, lit(25L))
            .otherwise(lit(25L) - length(bin(col("v"))).cast("long")))
        .groupBy("day", "reg").agg(max(col("rho")).as("m"))
      val est = shardRegs.groupBy("reg").agg(max(col("m")).as("m"))
        .agg(sum(pow(lit(2.0), -col("m"))).as("sp"), count(lit(1)).as("nr"))
        .select((lit(0.709 * 64.0 * 64.0) /
          (col("sp") + (lit(64L) - col("nr")).cast("double"))).as("raw"))
      val exact = hashed.agg(countDistinct(col("uid")).as("n_exact"))
      val perShard = hashed.groupBy("day")
        .agg(countDistinct(col("uid")).as("d"))
        .agg(count(lit(1)).as("n_shards"),
          sum(col("d")).as("sum_shard_exact"))
      exact.crossJoin(broadcast(perShard)).crossJoin(broadcast(est))
        // empty-in → empty-out (repo convention, cf. dq_expectations):
        // n_shards is 0 iff events is empty, so the gate is a no-op on
        // real data and suppresses the vacuous global-aggregate row
        .filter(col("n_shards") > 0)
        .select(col("n_exact"), col("n_shards"), col("sum_shard_exact"),
          Rounding.r4(col("raw")).as("est_merged"))
    }),

    // Expectations-suite DQ (the declarative cousin of dq_rules'
    // violation report): every expectation's observed statistic
    // computes as a conditional count in ONE aggregate pass over the
    // log, then unpivots to (expectation, observed, pass) rows —
    // whole-table assertions at the cost of a single scan.
    "dq_expectations" -> ((s, dir) =>
      EventBars.events(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("user_id").isNull, lit(1L)).otherwise(lit(0L)))
            .as("n_null_user"),
          sum(when(!col("event_type").isin(
            "click", "view", "purchase", "signup", "error"), lit(1L))
            .otherwise(lit(0L))).as("n_unknown_type"),
          sum(when(col("value") < 0.0, lit(1L)).otherwise(lit(0L)))
            .as("n_neg_value"),
          sum(when(col("t") < lit(1704067200000000L)
            || col("t") >= lit(1893456000000000L), lit(1L))
            .otherwise(lit(0L))).as("n_ts_oor"))
        // empty-in → empty-out (the repo-wide convention): an absent
        // log yields an absent report, not five vacuous rows
        .filter(col("n_rows") > 0)
        .selectExpr("stack(5, " +
          "'row_count_positive', n_rows, n_rows > 0, " +
          "'null_user_rate_le_1pct', n_null_user, " +
          "n_null_user * 100 <= n_rows, " +
          "'event_types_known', n_unknown_type, n_unknown_type = 0, " +
          "'value_non_negative', n_neg_value, n_neg_value = 0, " +
          "'ts_in_2024_2029', n_ts_oor, n_ts_oor = 0) " +
          "AS (expectation, observed, pass)")),

    // Day-of-week × hour activity matrix (the calendar heatmap) from
    // pure integer epoch arithmetic — no timezone/date-function parity
    // bet; value averages derive from exact cent sums. One exchange of
    // a ≤168-key rollup.
    "agg_dow_hour" -> ((s, dir) =>
      EventBars.events(s, dir)
        .select(expr("((t div 86400000000) + 3) % 7").as("dow"),
          expr("(t % 86400000000) div 3600000000").as("hour"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .groupBy("dow", "hour")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        .select(col("dow"), col("hour"), col("n"),
          Rounding.r6(expr(
            "CAST(sc AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)"))
            .as("avg_value"))),

    // Hourly unique users, exact AND sketched side by side — the
    // windowed-uniques report a warehouse serves from merged HLL
    // registers when exact distinct stops scaling. Register maxima
    // collapse map-side; the estimate's power-of-two sums are dyadic →
    // exact cross-engine.
    "agg_hourly_uniques" -> ((s, dir) => {
      val hashed = EventBars.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(expr("t div 3600000000").as("hour"),
          col("user_id").cast("long").as("uid"),
          expr(s"((user_id % ${P}L) * 2654435761L) % ${P}L").as("h"))
      val regs = hashed
        .select(col("hour"), (col("h") % 64).as("reg"),
          expr("h DIV 64").as("v"))
        .withColumn("rho",
          when(col("v") === 0, lit(25L))
            .otherwise(lit(25L) - length(bin(col("v"))).cast("long")))
        .groupBy("hour", "reg").agg(max(col("rho")).as("m"))
      val est = regs.groupBy("hour")
        .agg(sum(pow(lit(2.0), -col("m"))).as("sp"),
          count(lit(1)).as("nr"))
        .select(col("hour"),
          (lit(0.709 * 64.0 * 64.0) /
            (col("sp") + (lit(64L) - col("nr")).cast("double"))).as("raw"))
      val exact = hashed.groupBy("hour")
        .agg(countDistinct(col("uid")).as("n_exact"),
          count(lit(1)).as("n_events"))
      exact.join(est, "hour")
        .select(col("hour"), col("n_events"), col("n_exact"),
          Rounding.r4(col("raw")).as("est_distinct"))
    }),

    // MAD outlier detection: per event_type, flag rows whose absolute
    // deviation from the median exceeds 3× the median absolute
    // deviation — the robust data-quality screen that, unlike z-score,
    // a few extreme rows can't mask. Medians use the exact rank-window
    // interpolation arithmetic (bit-equal to quantile_cont, proven by
    // agg_quantiles); group keys are low-cardinality, so at 100 TB the
    // per-type sort is the cost — swap in a sketch quantile when exact
    // boundaries stop mattering.
    "anomaly_mad" -> ((s, dir) => {
      val ev = EventBars.events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("value"))
      // exact medians via the shared quantile_cont-bit-equal arithmetic
      def medianOf(df: DataFrame, v: String, out: String,
          ckpt: Boolean): DataFrame =
        ExactQuantile.grouped(df, "event_type", v, Seq(0.5 -> out), ckpt)
      val med = medianOf(ev, "value", "med", ckpt = false)
      // withDev feeds BOTH the MAD quantile pass and the final filter —
      // checkpoint it once here instead of inside the second quantile
      // pass (which would leave the final join recomputing the
      // events-join lineage a second time).
      val withDev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .localCheckpoint()
      val mad = medianOf(withDev, "dev", "mad", ckpt = false)
      withDev.join(broadcast(mad), "event_type")
        .filter(col("dev") > lit(3.0) * col("mad"))
        .select(col("event_id"), col("event_type"),
          Rounding.r6(col("value")).as("value"),
          Rounding.r6(col("med")).as("med"),
          Rounding.r6(col("mad")).as("mad"))
    }),

    // Data-quality rule summary — the ingest gate a pipeline runs
    // before training: null keys, referential orphans (broadcast
    // anti-join — the fact table never shuffles), range and freshness
    // violations, duplicate primary keys. One row per VIOLATED rule
    // (clean rules emit nothing — preserving the engine-wide
    // empty-in → empty-out invariant); each rule is a scan-side
    // filter + count, so the whole report costs one pass per table.
    "dq_rules" -> ((s, dir) => {
      def cnt(name: String, df: DataFrame): DataFrame =
        df.select(lit(name).as("rule"))
          .groupBy("rule").agg(count(lit(1)).as("n_violations"))
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val c = t(s, dir, "customer").select(col("c_custkey"))
      cnt("null_custkey", o.filter(col("o_custkey").isNull))
        .unionByName(cnt("orphan_order",
          o.filter(col("o_custkey").isNotNull)
            .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_anti")))
        .unionByName(cnt("qty_out_of_range",
          li.filter(col("l_quantity") < 1.0 || col("l_quantity") > 50.0)))
        .unionByName(cnt("nonpositive_price",
          o.filter(col("o_totalprice") <= 0.0)))
        .unionByName(cnt("dup_orderkey",
          o.groupBy("o_orderkey").agg(count(lit(1)).as("c")).filter(col("c") > 1)))
        .unionByName(cnt("late_ship",
          li.filter(col("l_shipdate") > lit("1998-12-01").cast("timestamp"))))
    }),

    // Bar-gap data-quality report — the reference domain's ingest
    // screen: per ticker, how many grid steps are missing, the gap
    // histogram (one/two-step gaps densify; 6-step gaps break
    // islands), and the worst gap. Pure integer micros math over one
    // lag window on the ticker exchange.
    "ts_gaps" -> ((s, dir) => {
      val w = Window.partitionBy("ticker").orderBy("ws", "event_id")
      EventBars.minuteBars(s, dir)
        .withColumn("gap", (col("ws") - lag(col("ws"), 1).over(w)) / EventBars.StepMicros)
        .groupBy("ticker")
        .agg(count(lit(1)).as("n_bars"),
          sum(when(col("gap") === 2, 1L).otherwise(0L)).as("n_gap2"),
          sum(when(col("gap") === 3, 1L).otherwise(0L)).as("n_gap3"),
          sum(when(col("gap") >= 4, 1L).otherwise(0L)).as("n_break"),
          coalesce(max(col("gap")), lit(0.0)).cast("long").as("max_gap_steps"),
          coalesce(sum(col("gap") - 1), lit(0.0)).cast("long").as("missing_steps"))
    }),

    // Asymmetric containment on the LSH candidate pairs: doc-in-doc
    // duplication (|A∩B| / |A|) that symmetric jaccard under-scores —
    // a short doc fully embedded in a long one scores low jaccard but
    // containment 1.0. Same candidate machinery, one extra per-pair
    // projection.
    "dedup_containment" -> ((s, dir) =>
      ExtCommon.minhashPairs(s, dir)
        .withColumn("ia", expr(
          "CAST(size(array_intersect(array_distinct(sha), array_distinct(shb))) AS DOUBLE)"))
        .select(col("a"), col("b"),
          Rounding.r6(ExtCommon.jaccardExpr).as("jaccard"),
          Rounding.r6(expr(
            "try_divide(ia, CAST(size(array_distinct(sha)) AS DOUBLE))")).as("cont_a"),
          Rounding.r6(expr(
            "try_divide(ia, CAST(size(array_distinct(shb)) AS DOUBLE))")).as("cont_b"))),

    // Per-dimension embedding profile — the vector-column face of
    // profile_docs: one posexplode + one 64-group aggregate (map-side
    // partials collapse each task to 64 rows before the shuffle).
    "profile_embeddings" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)"))
          .as(Seq("dim", "x")))
        .groupBy(col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          Rounding.r6(avg(col("x"))).as("mean"),
          Rounding.r6(min(col("x"))).as("mn"),
          Rounding.r6(max(col("x"))).as("mx"))),

    // Z-order layout clustering — the data-skipping story: interleave
    // the bits of two filter columns into one sort key, bucket the
    // sorted order, and report each bucket's min/max key ranges. Files
    // written in z-order carry TIGHT min/max stats on BOTH columns, so
    // a point/range filter on either prunes most buckets at the scan
    // (the per-bucket ranges this query emits are exactly the stats a
    // lakehouse keeps per file). Pure integer bit math — one groupBy.
    "layout_zorder" -> ((s, dir) => {
      // unrolled bit interleave (16 plain terms, stays in whole-stage
      // codegen — an HOF fold here would evaluate interpreted per row)
      val z = (0 until 8).map(i =>
        s"(shiftright(xk, $i) & 1) * ${1L << (2 * i)}L" +
          s" + (shiftright(yk, $i) & 1) * ${1L << (2 * i + 1)}L").mkString(" + ")
      t(s, dir, "lineitem")
        .select((col("l_partkey") % 256).as("xk"), (col("l_suppkey") % 256).as("yk"))
        .withColumn("zv", expr(z))
        .groupBy(expr("zv DIV 4096").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("xk")).as("min_x"), max(col("xk")).as("max_x"),
          min(col("yk")).as("min_y"), max(col("yk")).as("max_y"))
    }),

    // Hilbert-curve layout clustering — layout_zorder's companion with
    // the better space-filling curve: unlike Z-order's jump
    // discontinuities, consecutive Hilbert keys are always grid
    // neighbors (unit-step continuity), so sorted buckets carry
    // strictly tighter min/max column ranges and a range filter prunes
    // more files. The xy2d recurrence unrolls as 8 fixed levels of
    // pure integer CASE/mask arithmetic (shared text on both engines
    // via [[hilbertLevel]]) — no HOF fold, stays in whole-stage
    // codegen like the zorder interleave; one groupBy.
    "layout_hilbert" -> ((s, dir) => {
      var df = t(s, dir, "lineitem")
        .select((col("l_partkey") % 256).as("x0"),
          (col("l_suppkey") % 256).as("y0"))
        .withColumn("d0", lit(0L))
      for (k <- 0 until 8) {
        val (xe, ye, de) = hilbertLevel(7 - k, s"x$k", s"y$k", s"d$k")
        df = df.withColumn(s"x${k + 1}", expr(xe))
          .withColumn(s"y${k + 1}", expr(ye))
          .withColumn(s"d${k + 1}", expr(de))
      }
      df.groupBy(expr("d8 DIV 4096").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x0")).as("min_x"), max(col("x0")).as("max_x"),
          min(col("y0")).as("min_y"), max(col("y0")).as("max_y"))
    }),

    // Data-skipping MEASURED: the same selective 2-D box filter
    // (x ∈ [32,47], y ∈ [96,127] — ~0.8% of the key space) priced
    // against per-bucket min/max stats under three physical layouts —
    // natural (orderkey-contiguous files: both filter columns span
    // every bucket, nothing prunes), Z-order, and Hilbert. A bucket is
    // scanned iff its [min,max] ranges intersect the box — exactly the
    // file-skipping test a lakehouse runs against footer stats — and
    // the emitted row_skip_ratio is the fraction of the table the scan
    // never reads. This turns layout_zorder/layout_hilbert's stats
    // tables into the claim they exist for, as one oracle-gated
    // number per layout. All integer bit math + one groupBy per
    // layout; the natural layout's bucket width rides a one-row max
    // broadcast.
    "layout_prune_compare" -> ((s, dir) => {
      val z = (0 until 8).map(i =>
        s"(shiftright(xk, $i) & 1) * ${1L << (2 * i)}L" +
          s" + (shiftright(yk, $i) & 1) * ${1L << (2 * i + 1)}L")
        .mkString(" + ")
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_partkey") % 256).as("xk"), (col("l_suppkey") % 256).as("yk"))
        .localCheckpoint()
      val zb = base.withColumn("zv", expr(z))
        .select(expr("zv DIV 4096").as("bucket"), col("xk"), col("yk"))
      var hdf = base.withColumn("x0", col("xk"))
        .withColumn("y0", col("yk")).withColumn("d0", lit(0L))
      for (k <- 0 until 8) {
        val (xe, ye, de) = hilbertLevel(7 - k, s"x$k", s"y$k", s"d$k")
        hdf = hdf.withColumn(s"x${k + 1}", expr(xe))
          .withColumn(s"y${k + 1}", expr(ye))
          .withColumn(s"d${k + 1}", expr(de))
      }
      val hb = hdf.select(expr("d8 DIV 4096").as("bucket"),
        col("xk"), col("yk"))
      val mx = base.agg(max(col("l_orderkey")).as("mok"))
      val nb = base.crossJoin(broadcast(mx))
        .select(expr("l_orderkey DIV (mok DIV 16 + 1)").as("bucket"),
          col("xk"), col("yk"))
      def prune(df: DataFrame, name: String): DataFrame = df
        .groupBy("bucket").agg(count(lit(1)).as("n"),
          min(col("xk")).as("min_x"), max(col("xk")).as("max_x"),
          min(col("yk")).as("min_y"), max(col("yk")).as("max_y"))
        .withColumn("hit", col("min_x") <= 47 && col("max_x") >= 32 &&
          col("min_y") <= 127 && col("max_y") >= 96)
        .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_rows"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("hit_buckets"),
          sum(when(col("hit"), col("n")).otherwise(0L)).as("hit_rows"))
        .filter(col("n_rows").isNotNull)
        .select(lit(name).as("layout"), col("n_buckets"),
          col("hit_buckets"), col("n_rows"), col("hit_rows"),
          Rounding.r6(expr("CAST(1.0 AS DOUBLE)" +
            " - CAST(hit_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)"))
            .as("row_skip_ratio"))
      prune(nb, "natural").unionByName(prune(zb, "zorder"))
        .unionByName(prune(hb, "hilbert"))
    }),

    // The composed IVF-PQ ANN query — the index structure a 100 TB
    // vector store actually serves: queries probe their IVF cell
    // (equi-join on cell id — candidates shrink K×), and distances are
    // ADC (asymmetric distance computation) against candidates' 8-byte
    // PQ codes instead of raw vectors — the scan reads codes, not
    // embeddings. Per-pair block distances fold in block order via a
    // sorted-array aggregate, so the ADC doubles are bit-identical to
    // the oracle's ordered list_reduce and ranking can't flip on a
    // summation-order ulp.
    "sim_ivf_pq" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${"graft_dot(v, v)"})"))
      // IVF cells: sim_ivf's deterministic coarse quantizer with the
      // SAME adaptive nlist (~√n, power of two in [16, 4096]) — a
      // fixed cell count would leave per-cell candidate lists growing
      // linearly and the ADC join degrading toward (n/k)² at scale.
      // (The 16 in pqCodebook below is the PQ codebook SIZE — 2⁴
      // codes per block, fixed by design like any PQ bit width — not
      // a partition count, so it does not grow with n.)
      val cents = e.filter(col("vec_id") < lit(ExtCommon.ivfNlist(e)))
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
      val assigned = ExtCommon.assignCells(e, cents)
        .select(col("vec_id"), col("v"), col("cell"))
      // PQ codes — the SAME codebook emb_pq emits (shared helper)
      val blocks = pqBlocks(e)
      val (pqCents, codesFull) = pqCodebook(blocks)
      val codes = codesFull.select(col("vec_id"), col("block"), col("code"))
      // ADC: query sub-vectors vs candidates' code centroids
      val qBlocks = blocks.filter(col("vec_id") % IvfQuerySplit === 0)
        .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
        .select(col("vec_id").as("q_id"), col("cell"), col("block"),
          col("sub").as("qsub"))
      val cand = assigned.select(col("vec_id").as("n_id"), col("cell"))
        .join(codes.withColumnRenamed("vec_id", "n_id"), "n_id")
      qBlocks.join(cand, Seq("cell", "block"))
        .filter(col("q_id") =!= col("n_id"))
        .join(broadcast(pqCents.withColumnRenamed("c_id", "code")),
          Seq("block", "code"))
        .withColumn("bd", expr(
          "aggregate(zip_with(qsub, csub, (x, y) -> (x - y) * (x - y)), 0D, (a, c) -> a + c)"))
        .groupBy("q_id", "n_id")
        .agg(expr(
          "aggregate(transform(array_sort(collect_list(struct(block, bd))), p -> p.bd), 0D, (a, c) -> a + c)")
          .as("adc"))
        .withColumn("rank", expr(
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS BIGINT)"))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), col("rank"),
          Rounding.r6(col("adc")).as("adc"))
    }),

    // Recall@3 of the composed IVF-PQ index against the brute-force
    // cosine ground truth — the number published before anyone trusts
    // the approximate path (sim_recall's pattern, applied to the
    // two-level index: cell probe AND PQ distance distortion both eat
    // recall, so this measures the COMPOSED loss). Queries are the
    // shared split q_id % 50 = 0 (sim_topk's %10 ∩ sim_ivf_pq's %25);
    // hits resolve by an exchange-aligned left join, counts exact.
    "sim_ivf_pq_recall" -> ((s, dir) => {
      val exact = ExtQueries.queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
      val ann = queries("sim_ivf_pq")(s, dir)
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

    // Residual-encoded IVF-PQ — the composition production vector
    // stores actually serve (FAISS IndexIVFPQ's encode-by-residual):
    // PQ quantizes r = v − centroid(cell) instead of the raw vector,
    // so the 4-bit-per-block budget only has to cover each cell's
    // residual ball rather than the whole space — a strictly finer
    // quantizer at identical code size, with the recall lift measured
    // by sim_ivf_pq_residual_recall. Plan shape is sim_ivf_pq's
    // exactly: the residual subtraction is ONE broadcast join against
    // the ≤nlist centroid table (zero new exchanges), codes stay
    // 8 bytes, and the ADC scan still reads codes, not embeddings.
    // Codebook seeds start at nlist (vec_ids below it ARE the coarse
    // centroids; their residuals are all-zero).
    "sim_ivf_pq_residual" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr(s"sqrt(${"graft_dot(v, v)"})"))
      ivfPqResidualAnn(e)
    }),

    // OPQ-transformed residual IVF-PQ: identical index and probe
    // budget to sim_ivf_pq_residual, but vectors pass through the
    // learned [[opqPerm]] allocation first, so each 8-dim PQ block
    // carries a balanced share of the corpus variance instead of
    // whatever 8 adjacent dims happen to hold. Cell geometry is
    // unchanged (permutation preserves every distance); only the
    // block split — and therefore the codebook's coverage of it —
    // moves. Recall lift vs the unrotated residual form is measured
    // by sim_ivf_opq_recall against the same exact ground truth.
    "sim_ivf_opq" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e0 = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val perm = opqPerm(e0)
      // literal gather projection — no shuffle, stays in codegen; the
      // d-length permutation is data-independent metadata like mArr
      // in emb_pca1
      val pv =
        if (perm.isEmpty) "CAST(array() AS ARRAY<DOUBLE>)"
        else perm.map(d => s"v[$d]").mkString("array(", ", ", ")")
      // materialize the gathered arrays ONCE: downstream assignCells
      // evaluates graft_dot(v, cv) n×nlist times, and an unmaterialized
      // pv would re-run the 64-element CreateArray per evaluation
      val e = e0.select(col("vec_id"), expr(pv).as("v"))
        .withColumn("nrm", expr(s"sqrt(${"graft_dot(v, v)"})"))
        .localCheckpoint()
      ivfPqResidualAnn(e)
    }),

    // Recall@3 of the OPQ-allocated index vs the SAME exact cosine
    // ground truth and query split as sim_ivf_pq_residual_recall —
    // the pair of rows that turns "OPQ helps" into a measured number
    // at every gate SF.
    "sim_ivf_opq_recall" -> ((s, dir) => {
      val exact = ExtQueries.queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
      val ann = queries("sim_ivf_opq")(s, dir)
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

    // Recall@3 of the residual-encoded index against the same exact
    // ground truth and query split as sim_ivf_pq_recall — published
    // side by side so the residual form's lift (or its absence on
    // near-isotropic data) is a measured number, not folklore.
    // Measured on the gate data: within noise of the raw form
    // (mean recall ±0.03 across the three SFs) — residual encoding
    // only pays when cells capture real structure, and the synthetic
    // embeddings are near-isotropic (the sim_ivf_kmeans_recall
    // caveat); on clustered production corpora this is the variant
    // FAISS defaults to.
    "sim_ivf_pq_residual_recall" -> ((s, dir) => {
      val exact = ExtQueries.queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3 && col("q_id") % IvfQuerySplit === 0)
        .select(col("q_id"), col("n_id"))
      val ann = queries("sim_ivf_pq_residual")(s, dir)
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

    // Farthest-point (k-center greedy) coreset selection — the
    // diversity-maximizing subset pick (Gonzalez's 2-approximation to
    // k-center; the "coreset" step of active-learning / data-pruning
    // pipelines): seed with vec_id 0, then 4 rounds each add the
    // vector FARTHEST from the chosen set. Fully distributed: the
    // per-round argmax is a map-side-combinable min-of-struct global
    // aggregate (one row crosses the exchange per task), the new
    // center flows back as a broadcast single row (the sanctioned
    // 1-row crossJoin), and the running (mind2, nearest) state
    // checkpoints per round — k rounds cost k linear passes at ANY
    // corpus size, never a k×n join. Output: every vector with its
    // nearest selected center and the distance (the k-center
    // assignment + its radius profile).
    "sample_fps" -> ((s, dir) => {
      val en = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      val l2 = "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y))," +
        " 0D, (a, c) -> a + c)"
      val c0 = en.filter(col("vec_id") === 0L)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      var state = en.crossJoin(broadcast(c0))
        .select(col("vec_id"), col("v"),
          expr(l2).as("mind2"), col("cid").as("nearest"))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val pick = state.groupBy()
          .agg(min(struct(negate(col("mind2")).as("nd"), col("vec_id"))).as("m"))
          .select(col("m.vec_id").as("vec_id"))
        val ctr = state.join(broadcast(pick), Seq("vec_id"))
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        state = state.crossJoin(broadcast(ctr))
          .withColumn("d2n", expr(l2))
          .select(col("vec_id"), col("v"),
            when(col("d2n") < col("mind2"), col("d2n"))
              .otherwise(col("mind2")).as("mind2"),
            when(col("d2n") < col("mind2"), col("cid"))
              .otherwise(col("nearest")).as("nearest"))
          .localCheckpoint()
      }
      state.select(col("vec_id"), col("nearest"),
        Rounding.r6(col("mind2")).as("d2"))
    }),

    // OHLC + VWAP downsampling: one-minute bars → five-minute bars.
    // Open/close are argmin/argmax structs on the (ws, event_id) total
    // order — they ride the partial aggregates, so the shuffle carries
    // one candidate per bar per map task and there is no per-bar sort
    // or window. This is the reference's bar domain one grid level up.
    "ts_resample" -> ((s, dir) =>
      EventBars.minuteBars(s, dir)
        .withColumn("bar", expr(s"ws DIV $BarStep"))
        .groupBy("ticker", "bar")
        .agg(
          min(struct(col("ws"), col("event_id"), col("open"))).as("o"),
          max(struct(col("ws"), col("event_id"), col("close"))).as("c"),
          max(col("high")).as("mx_high"),
          min(col("low")).as("mn_low"),
          sum(col("volume")).as("sum_vol"),
          sum(col("close") * col("volume")).as("cv"),
          count(lit(1)).as("n_bars"))
        .select(col("ticker"), (col("bar") * BarStep).as("bar_start"),
          Rounding.r6(col("o.open")).as("open"),
          Rounding.r6(col("mx_high")).as("high"),
          Rounding.r6(col("mn_low")).as("low"),
          Rounding.r6(col("c.close")).as("close"),
          Rounding.r6(col("sum_vol")).as("volume"),
          Rounding.r4(col("cv") / col("sum_vol")).as("vwap"),
          col("n_bars"))))

  // ---- DuckDB oracles ----

  private val segsDuck =
    s"""dt AS (SELECT doc_id::BIGINT AS doc_id, $toksDuck AS toks FROM documents),
       |dh AS (SELECT doc_id, toks, ${wordHashesDuck("toks")} AS wh FROM dt
       |  WHERE len(toks) > 0),
       |si AS (SELECT doc_id, toks, wh,
       |    unnest(generate_series(0, (len(wh) - 1) // $SegTok)) AS seg_idx
       |  FROM dh),
       |sg AS (SELECT doc_id, seg_idx::BIGINT AS seg_idx,
       |    array_to_string(toks[seg_idx*$SegTok + 1 : seg_idx*$SegTok + $SegTok], ' ') AS seg,
       |    list_reduce(list_prepend(0::BIGINT,
       |      wh[seg_idx*$SegTok + 1 : seg_idx*$SegTok + $SegTok]),
       |      (a, b) -> (a*131 + b) % $P) AS h
       |  FROM si)""".stripMargin

  private def ivfDotD(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"generate_series(1, len($a)), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  private def ivfL2D(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"generate_series(1, 8), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))," +
      s" (x, y) -> x + y)"

  /** Shared oracle prefix: embeddings → norms → coarse centroids →
    * argmax-cosine cell assignment, ending in
    * `assigned(vec_id, v, cell)`. Both IVF-PQ chains splice onto it. */
  private def ivfAssignFromDuck(ebBody: String): String =
    s"""eb AS (SELECT $ebBody),
       |en AS (SELECT *, sqrt(${ivfDotD("v", "v")}) AS nrm FROM eb),
       |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en
       |  WHERE vec_id < ${ExtCommon.ivfNlistD}),
       |asg0 AS (SELECT e.vec_id, e.v, c.c_id,
       |    ${ivfDotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN cents c),
       |asg1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, c_id) AS crank FROM asg0),
       |assigned AS (SELECT vec_id, v, c_id AS cell FROM asg1
       |  WHERE crank = 1)""".stripMargin

  private val ivfAssignDuck: String = ivfAssignFromDuck(
    """vec_id::BIGINT AS vec_id,
      |    embedding::DOUBLE[] AS v FROM embeddings""".stripMargin)

  /** The PQ → ADC → rank suffix both chains share, parameterized on
    * the table carrying `(vec_id, v, cell)` rows to encode (`eb` +
    * `assigned` for the raw form, `res` for the residual form) and on
    * the codebook seed band. Ends in `r(q_id, n_id, adc, rank)`. */
  private def ivfPqSuffixDuck(vecs: String, seedPred: String): String =
    s"""bl AS (SELECT vec_id, b AS block, v[b*8 + 1 : b*8 + 8] AS sub
       |  FROM $vecs, unnest(generate_series(0, 7)) AS u(b)),
       |ct AS (SELECT vec_id AS c_id, block, sub AS csub FROM bl
       |  WHERE $seedPred),
       |d AS (SELECT bl.vec_id, bl.block, ct.c_id,
       |    ${ivfL2D("bl.sub", "ct.csub")} AS dist2
       |  FROM bl JOIN ct USING (block)),
       |cr AS (SELECT *, row_number() OVER (PARTITION BY vec_id, block
       |    ORDER BY dist2, c_id) AS rn FROM d),
       |codes AS (SELECT vec_id, block, c_id AS code FROM cr WHERE rn = 1),
       |qb AS (SELECT bl.vec_id AS q_id, a.cell, bl.block, bl.sub AS qsub
       |  FROM bl JOIN $vecs a ON a.vec_id = bl.vec_id
       |  WHERE bl.vec_id % $IvfQuerySplit = 0),
       |cand AS (SELECT a.vec_id AS n_id, a.cell, c.block, c.code
       |  FROM $vecs a JOIN codes c ON c.vec_id = a.vec_id),
       |bd AS (SELECT qb.q_id, cand.n_id, qb.block,
       |    ${ivfL2D("qb.qsub", "ct2.csub")} AS bd
       |  FROM qb
       |  JOIN cand ON cand.cell = qb.cell AND cand.block = qb.block
       |    AND cand.n_id <> qb.q_id
       |  JOIN ct ct2 ON ct2.block = qb.block AND ct2.c_id = cand.code),
       |adc AS (SELECT q_id, n_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(bd ORDER BY block)),
       |      (a, c) -> a + c) AS adc
       |  FROM bd GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY adc, n_id) AS rank FROM adc)""".stripMargin

  /** Raw-vector IVF-PQ chain (sim_ivf_pq): PQ on the embeddings
    * themselves, codebook seeded from the 16 lowest vec_ids. */
  private val ivfPqChainDuck: String =
    s"""$ivfAssignDuck,
       |${ivfPqSuffixDuck("assigned", "vec_id < 16")}""".stripMargin

  /** Residual IVF-PQ chain (sim_ivf_pq_residual): PQ on
    * v − centroid(cell), codebook seeded from [nlist, nlist+16) —
    * the sub-nlist vec_ids are the centroids themselves, with
    * all-zero residuals. */
  private val ivfResDuck: String =
    """res AS (SELECT a.vec_id,
      |    list_transform(generate_series(1, len(a.v)),
      |      i -> a.v[i] - c.cv[i]) AS v, a.cell
      |  FROM assigned a JOIN cents c ON c.c_id = a.cell)""".stripMargin

  private val ivfPqResChainDuck: String =
    s"""$ivfAssignDuck,
       |$ivfResDuck,
       |${ivfPqSuffixDuck("res",
          s"vec_id >= ${ExtCommon.ivfNlistD} AND vec_id < ${ExtCommon.ivfNlistD} + 16")}""".stripMargin

  /** OPQ training mirror: per-dim micro-quantized (n, Σq, Σq²) in
    * HUGEINT, variance comparable n·ss − s², snake allocation of the
    * ranked dims over (block, slot), ending in `opm(pl)` — the ONE-row
    * permutation list with pl[k] = 1-based source dim of permuted
    * position k (exactly [[opqPerm]]'s integers). */
  private val opqPermDuck: String =
    s"""eb0 AS (SELECT vec_id::BIGINT AS vec_id,
       |    embedding::DOUBLE[] AS v FROM embeddings),
       |oq AS (SELECT generate_subscripts(v, 1) - 1 AS dim,
       |    CAST(round(unnest(v) * 1000000.0) AS BIGINT) AS q FROM eb0),
       |ost AS (SELECT dim, count(*)::HUGEINT AS n, sum(q)::HUGEINT AS s,
       |    sum(q::HUGEINT * q) AS ss FROM oq GROUP BY 1),
       |ork AS (SELECT dim, row_number() OVER
       |    (ORDER BY (n * ss - s * s) DESC, dim) - 1 AS r FROM ost),
       |ops AS (SELECT dim,
       |    (CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END) * 8
       |      + (r // 8) + 1 AS p FROM ork),
       |opm AS (SELECT list(dim + 1 ORDER BY p) AS pl FROM ops)""".stripMargin

  /** OPQ-allocated residual IVF-PQ chain (sim_ivf_opq): the residual
    * chain verbatim, over the permuted vectors. `eb0` stays available
    * for the recall twin's RAW-order exact ground truth (the permuted
    * dot's different summation order could flip an exact-top-3 tie). */
  private val ivfOpqChainDuck: String =
    s"""$opqPermDuck,
       |${ivfAssignFromDuck(
          "eb0.vec_id, list_transform(opm.pl, d -> eb0.v[d]) AS v FROM eb0, opm")},
       |$ivfResDuck,
       |${ivfPqSuffixDuck("res",
          s"vec_id >= ${ExtCommon.ivfNlistD} AND vec_id < ${ExtCommon.ivfNlistD} + 16")}""".stripMargin

  val oracles: Map[String, String] = Map(

    "dedup_lines" ->
      s"""WITH $segsDuck,
         |kept AS (SELECT * FROM (SELECT *, row_number() OVER
         |    (PARTITION BY h ORDER BY doc_id, seg_idx) AS rn FROM sg)
         |  WHERE rn = 1),
         |tot AS (SELECT doc_id, count(*)::BIGINT AS n_segs FROM sg GROUP BY 1),
         |reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
         |    string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
         |  FROM kept GROUP BY 1)
         |SELECT d.doc_id::BIGINT AS doc_id,
         |  coalesce(tot.n_segs, 0)::BIGINT AS n_segs,
         |  coalesce(reb.n_kept, 0)::BIGINT AS n_kept,
         |  coalesce(reb.clean_text, '') AS clean_text
         |FROM documents d
         |LEFT JOIN tot ON tot.doc_id = d.doc_id::BIGINT
         |LEFT JOIN reb ON reb.doc_id = d.doc_id::BIGINT""".stripMargin,

    "dedup_neighbors" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, $toksDuck AS toks
         |    FROM documents),
         |dh AS (SELECT doc_id, ${wordHashesDuck("toks")} AS wh FROM dt
         |  WHERE len(toks) > 0),
         |ex AS (SELECT doc_id, unnest(wh) AS h FROM dh),
         |sm AS (SELECT doc_id,
         |  ${(0 until 16).map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n  ")}
         |  FROM ex GROUP BY doc_id),
         |sv AS (SELECT doc_id,
         |  (${(0 until 16).map(b => s"(CASE WHEN s$b >= 0 THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)").mkString(" + ")}) AS sh
         |  FROM sm),
         |blk AS (SELECT doc_id, sh, sh // 4096 AS blk FROM sv),
         |lg AS (SELECT doc_id, sh,
         |    lag(doc_id, 1) OVER w AS p1_id, lag(sh, 1) OVER w AS p1_sh,
         |    lag(doc_id, 2) OVER w AS p2_id, lag(sh, 2) OVER w AS p2_sh
         |  FROM blk WINDOW w AS (PARTITION BY blk ORDER BY sh, doc_id)),
         |pairs AS (
         |  SELECT p1_id AS a, doc_id AS b,
         |    bit_count(xor(sh, p1_sh))::BIGINT AS dist FROM lg
         |  UNION ALL
         |  SELECT p2_id AS a, doc_id AS b,
         |    bit_count(xor(sh, p2_sh))::BIGINT AS dist FROM lg)
         |SELECT a, b, dist FROM pairs
         |WHERE a IS NOT NULL AND dist <= 3""".stripMargin,

    "join_bloom" ->
      """SELECT o_orderkey, o_custkey,
        |  (round(o_totalprice, 6) + 0.0) AS totalprice
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,

    "emb_quantize" ->
      """WITH x AS (SELECT vec_id::BIGINT AS vec_id,
        |    unnest(embedding::DOUBLE[]) AS x,
        |    (generate_subscripts(embedding, 1) - 1)::BIGINT AS dim
        |  FROM embeddings),
        |b AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1),
        |q AS (SELECT x.vec_id, x.dim, x.x, b.mn, b.mx,
        |    CASE WHEN b.mx = b.mn THEN 0
        |      ELSE least(255.0, greatest(0.0,
        |        floor((x.x - b.mn) / (b.mx - b.mn) * 255.0 + 0.5)))::BIGINT - 128
        |    END AS q
        |  FROM x JOIN b USING (dim))
        |SELECT vec_id, dim, q,
        |  (round(abs(x - (mn + ((q + 128)::DOUBLE / 255.0) * (mx - mn))), 6) + 0.0)
        |    AS err
        |FROM q""".stripMargin,

    // Naive single-window mirror of the two-phase KMin sketch: the
    // union-of-partition-minima provably equals the global bottom-K,
    // so one flat row_number reproduces the engine's sample exactly.
    "sketch_quantile" ->
      s"""WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS v,
         |    (((l_orderkey * 71 + l_linenumber) % $P) * 2654435761) % $P AS h,
         |    l_orderkey, l_linenumber FROM lineitem),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY g
         |    ORDER BY h, l_orderkey, l_linenumber) AS _rk FROM li),
         |samp AS (SELECT g, v, h FROM rk WHERE _rk <= 512),
         |sr AS (SELECT g, v,
         |    row_number() OVER (PARTITION BY g ORDER BY v, h) AS vr,
         |    count(*) OVER (PARTITION BY g) AS m FROM samp),
         |est AS (SELECT g, max(m)::BIGINT AS m_sample,
         |    max(CASE WHEN vr = greatest(1, (25 * m + 99) // 100) THEN v END) AS p25_est,
         |    max(CASE WHEN vr = greatest(1, (50 * m + 99) // 100) THEN v END) AS p50_est,
         |    max(CASE WHEN vr = greatest(1, (90 * m + 99) // 100) THEN v END) AS p90_est,
         |    max(CASE WHEN vr = greatest(1, (99 * m + 99) // 100) THEN v END) AS p99_est
         |  FROM sr GROUP BY g),
         |ex AS (SELECT li.g, count(*)::BIGINT AS n_rows,
         |    max(e.m_sample) AS m_sample,
         |    max(e.p25_est) AS p25_est,
         |    sum(CASE WHEN li.v <= e.p25_est THEN 1 ELSE 0 END)::BIGINT AS le25,
         |    max(e.p50_est) AS p50_est,
         |    sum(CASE WHEN li.v <= e.p50_est THEN 1 ELSE 0 END)::BIGINT AS le50,
         |    max(e.p90_est) AS p90_est,
         |    sum(CASE WHEN li.v <= e.p90_est THEN 1 ELSE 0 END)::BIGINT AS le90,
         |    max(e.p99_est) AS p99_est,
         |    sum(CASE WHEN li.v <= e.p99_est THEN 1 ELSE 0 END)::BIGINT AS le99
         |  FROM li JOIN est e ON e.g = li.g GROUP BY li.g)
         |SELECT g AS l_returnflag, n_rows, m_sample,
         |  p25_est, p50_est, p90_est, p99_est,
         |  (round(greatest(
         |    abs(le25::DOUBLE / n_rows::DOUBLE - 0.25),
         |    abs(le50::DOUBLE / n_rows::DOUBLE - 0.50),
         |    abs(le90::DOUBLE / n_rows::DOUBLE - 0.90),
         |    abs(le99::DOUBLE / n_rows::DOUBLE - 0.99)), 6) + 0.0)
         |    AS max_rank_err
         |FROM ex""".stripMargin,

    "sketch_cms" ->
      s"""WITH tk AS (SELECT unnest($toksDuck) AS tok FROM documents),
         |th AS (SELECT tok, list_reduce(list_prepend(7::BIGINT,
         |    list_transform(regexp_extract_all(tok, '.'), c -> unicode(c)::BIGINT)),
         |    (a, b) -> (a*131 + b) % $P) AS h FROM tk),
         |cells AS (SELECT j, ((h*(2*j + 1) + j*7919 + 1) % $P) % $CmsW AS ccol,
         |    count(*)::BIGINT AS c
         |  FROM th, unnest(generate_series(0, ${CmsD - 1})) AS u(j)
         |  GROUP BY 1, 2),
         |top AS (SELECT tok, h, count(*)::BIGINT AS n_exact FROM th
         |  GROUP BY 1, 2 ORDER BY n_exact DESC, tok LIMIT 20),
         |est AS (SELECT t.tok, t.n_exact, min(c.c) AS n_est
         |  FROM top t, unnest(generate_series(0, ${CmsD - 1})) AS u(j)
         |  JOIN cells c ON c.j = u.j
         |    AND c.ccol = ((t.h*(2*u.j + 1) + u.j*7919 + 1) % $P) % $CmsW
         |  GROUP BY 1, 2)
         |SELECT tok, n_exact, n_est FROM est""".stripMargin,

    "dedup_semantic" ->
      s"""WITH RECURSIVE ${ExtCommon.embPairsDuck},
         |e AS (SELECT a, b FROM epr UNION SELECT b, a FROM epr),
         |reach(id, lbl) AS (
         |  SELECT vec_id::BIGINT, vec_id::BIGINT FROM embeddings
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id)
         |SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id""".stripMargin,

    "emb_pq" ->
      """WITH eb AS (SELECT vec_id::BIGINT AS vec_id,
        |    embedding::DOUBLE[] AS v FROM embeddings),
        |bl AS (SELECT vec_id, b AS block, v[b*8 + 1 : b*8 + 8] AS sub
        |  FROM eb, unnest(generate_series(0, 7)) AS u(b)),
        |ct AS (SELECT vec_id AS c_id, block, sub AS csub FROM bl
        |  WHERE vec_id < 16),
        |d AS (SELECT bl.vec_id, bl.block, ct.c_id,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(generate_series(1, 8),
        |        i -> (bl.sub[i] - ct.csub[i]) * (bl.sub[i] - ct.csub[i]))),
        |      (a, c) -> a + c) AS dist2
        |  FROM bl JOIN ct USING (block)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id, block
        |    ORDER BY dist2, c_id) AS rn FROM d)
        |SELECT vec_id, block::BIGINT AS block, c_id AS code,
        |  (round(dist2, 6) + 0.0) AS dist2
        |FROM r WHERE rn = 1""".stripMargin,

    "graph_pagerank" -> {
      val iters = (1 to 5).map { k =>
        s"""r$k AS (SELECT nd.id,
           |    (1.0 - 0.85)/(SELECT n FROM cnt) + 0.85 * coalesce(s.c, 0.0) AS r
           |  FROM nd LEFT JOIN (SELECT e.b AS id, sum(r${k - 1}.r / dg.deg) AS c
           |    FROM e JOIN r${k - 1} ON e.a = r${k - 1}.id
           |    JOIN dg ON dg.src = e.a GROUP BY 1) s USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ExtCommon.lshPairsDuck},
         |e AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
         |dg AS (SELECT a AS src, count(*)::DOUBLE AS deg FROM e GROUP BY 1),
         |nd AS (SELECT doc_id::BIGINT AS id FROM documents),
         |cnt AS (SELECT count(*)::DOUBLE AS n FROM nd),
         |r0 AS (SELECT id, 1.0/(SELECT n FROM cnt) AS r FROM nd),
         |$iters
         |SELECT id AS doc_id, (round(r, 6) + 0.0) AS rank FROM r5""".stripMargin
    },

    "graph_ppr" -> {
      val iters = (1 to 5).map { k =>
        s"""r$k AS (SELECT act.id,
           |    (1.0 - 0.85) * act.sb + 0.85 * coalesce(s.c, 0.0) AS r,
           |    act.sb
           |  FROM act LEFT JOIN (SELECT e.b AS id, sum(r${k - 1}.r / dg.deg) AS c
           |    FROM e JOIN r${k - 1} ON e.a = r${k - 1}.id
           |    JOIN dg ON dg.src = e.a GROUP BY 1) s USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ExtCommon.lshPairsDuck},
         |e AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
         |dg AS (SELECT a AS src, count(*)::DOUBLE AS deg FROM e GROUP BY 1),
         |nd AS (SELECT doc_id::BIGINT AS id FROM documents),
         |sd AS (SELECT id FROM nd WHERE id % 97 = 0),
         |scnt AS (SELECT count(*)::DOUBLE AS ns FROM sd),
         |ep AS (SELECT DISTINCT a AS id FROM e),
         |act AS (SELECT coalesce(ep.id, sd.id) AS id,
         |    CASE WHEN sd.id IS NOT NULL
         |      THEN 1.0 / (SELECT ns FROM scnt) ELSE 0.0 END AS sb
         |  FROM ep FULL OUTER JOIN sd ON ep.id = sd.id),
         |r0 AS (SELECT id, sb AS r, sb FROM act),
         |$iters
         |SELECT nd.id AS doc_id, (round(coalesce(r5.r, 0.0), 6) + 0.0) AS rank
         |FROM nd LEFT JOIN r5 USING (id)""".stripMargin
    },

    "sketch_hll" ->
      s"""WITH h AS (SELECT event_type, user_id::BIGINT AS uid,
         |    ((user_id % ${P}) * 2654435761) % ${P} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, h % 64 AS reg, h // 64 AS v FROM h),
         |m AS (SELECT event_type, reg,
         |    max(CASE WHEN v = 0 THEN 25 ELSE 25 - length(bin(v)) END)::BIGINT AS m
         |  FROM r GROUP BY 1, 2),
         |e AS (SELECT event_type, sum(power(2.0, -m)) AS sp,
         |    count(*)::BIGINT AS nr FROM m GROUP BY 1),
         |x AS (SELECT event_type, count(DISTINCT uid)::BIGINT AS n_exact
         |  FROM h GROUP BY 1)
         |SELECT x.event_type, x.n_exact,
         |  (round(0.709 * 64.0 * 64.0 / (e.sp + (64 - e.nr)::DOUBLE), 4) + 0.0)
         |    AS est_distinct
         |FROM x JOIN e USING (event_type)""".stripMargin,

    "sketch_hll_merge" ->
      s"""WITH h AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |    user_id::BIGINT AS uid,
         |    ((user_id % ${P}) * 2654435761) % ${P} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT day, h % 64 AS reg, h // 64 AS v FROM h),
         |m AS (SELECT day, reg,
         |    max(CASE WHEN v = 0 THEN 25 ELSE 25 - length(bin(v)) END)::BIGINT AS m
         |  FROM r GROUP BY 1, 2),
         |mm AS (SELECT reg, max(m)::BIGINT AS m FROM m GROUP BY 1),
         |e AS (SELECT sum(power(2.0, -m)) AS sp, count(*)::BIGINT AS nr
         |  FROM mm),
         |x AS (SELECT count(DISTINCT uid)::BIGINT AS n_exact FROM h),
         |ps AS (SELECT count(*)::BIGINT AS n_shards,
         |    sum(d)::BIGINT AS sum_shard_exact FROM (
         |    SELECT day, count(DISTINCT uid)::BIGINT AS d FROM h GROUP BY 1))
         |SELECT x.n_exact, ps.n_shards, ps.sum_shard_exact,
         |  (round(0.709 * 64.0 * 64.0 / (e.sp + (64 - e.nr)::DOUBLE), 4) + 0.0)
         |    AS est_merged
         |FROM x, ps, e WHERE ps.n_shards > 0""".stripMargin,

    "dq_expectations" ->
      """WITH e AS (SELECT user_id, event_type, value,
        |    epoch_us(ts) AS t FROM events),
        |a AS (SELECT count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS n_null_user,
        |    sum(CASE WHEN event_type NOT IN
        |      ('click', 'view', 'purchase', 'signup', 'error')
        |      THEN 1 ELSE 0 END)::BIGINT AS n_unknown_type,
        |    sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_neg_value,
        |    sum(CASE WHEN t < 1704067200000000
        |      OR t >= 1893456000000000 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_ts_oor
        |  FROM e),
        |an AS (SELECT * FROM a WHERE n_rows > 0)
        |SELECT 'row_count_positive' AS expectation, n_rows AS observed,
        |  n_rows > 0 AS pass FROM an
        |UNION ALL SELECT 'null_user_rate_le_1pct', n_null_user,
        |  n_null_user * 100 <= n_rows FROM an
        |UNION ALL SELECT 'event_types_known', n_unknown_type,
        |  n_unknown_type = 0 FROM an
        |UNION ALL SELECT 'value_non_negative', n_neg_value,
        |  n_neg_value = 0 FROM an
        |UNION ALL SELECT 'ts_in_2024_2029', n_ts_oor,
        |  n_ts_oor = 0 FROM an""".stripMargin,

    "agg_dow_hour" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, value FROM events),
        |b AS (SELECT ((t // 86400000000) + 3) % 7 AS dow,
        |    (t % 86400000000) // 3600000000 AS hour,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM e)
        |SELECT dow, hour, count(*)::BIGINT AS n,
        |  (round((CAST(sum(c) AS DOUBLE) / 100.0
        |    / CAST(count(*) AS DOUBLE))
        |   * 1000000.0) / 1000000.0 + 0.0) AS avg_value
        |FROM b GROUP BY 1, 2""".stripMargin,

    "agg_hourly_uniques" ->
      s"""WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour,
         |    user_id::BIGINT AS uid,
         |    ((user_id % ${P}) * 2654435761) % ${P} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT hour, h % 64 AS reg, h // 64 AS v FROM h),
         |m AS (SELECT hour, reg,
         |    max(CASE WHEN v = 0 THEN 25
         |      ELSE 25 - length(bin(v)) END)::BIGINT AS m
         |  FROM r GROUP BY 1, 2),
         |e AS (SELECT hour, sum(power(2.0, -m)) AS sp,
         |    count(*)::BIGINT AS nr FROM m GROUP BY 1),
         |x AS (SELECT hour, count(DISTINCT uid)::BIGINT AS n_exact,
         |    count(*)::BIGINT AS n_events FROM h GROUP BY 1)
         |SELECT x.hour, x.n_events, x.n_exact,
         |  (round(0.709 * 64.0 * 64.0 / (e.sp + (64 - e.nr)::DOUBLE), 4)
         |   + 0.0) AS est_distinct
         |FROM x JOIN e USING (hour)""".stripMargin,

    "anomaly_mad" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id, event_type, value
        |    FROM events WHERE value IS NOT NULL),
        |m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS dev FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type,
        |  (round(d.value, 6) + 0.0) AS value,
        |  (round(d.med, 6) + 0.0) AS med,
        |  (round(md.mad, 6) + 0.0) AS mad
        |FROM d JOIN md USING (event_type)
        |WHERE d.dev > 3.0 * md.mad""".stripMargin,

    "dq_rules" ->
      """SELECT 'null_custkey' AS rule, count(*)::BIGINT AS n_violations
        |  FROM orders WHERE o_custkey IS NULL HAVING count(*) > 0
        |UNION ALL
        |SELECT 'orphan_order', count(*)::BIGINT FROM orders o
        |  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  HAVING count(*) > 0
        |UNION ALL
        |SELECT 'qty_out_of_range', count(*)::BIGINT FROM lineitem
        |  WHERE l_quantity < 1.0 OR l_quantity > 50.0 HAVING count(*) > 0
        |UNION ALL
        |SELECT 'nonpositive_price', count(*)::BIGINT FROM orders
        |  WHERE o_totalprice <= 0.0 HAVING count(*) > 0
        |UNION ALL
        |SELECT 'dup_orderkey', count(*)::BIGINT FROM
        |  (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |  HAVING count(*) > 0
        |UNION ALL
        |SELECT 'late_ship', count(*)::BIGINT FROM lineitem
        |  WHERE l_shipdate > TIMESTAMP '1998-12-01' HAVING count(*) > 0""".stripMargin,

    "ts_gaps" ->
      s"""WITH ${EventBars.sqlMinuteBars},
         |g AS (SELECT ticker, (ws - lag(ws) OVER (PARTITION BY ticker
         |    ORDER BY ws, event_id)) / ${EventBars.StepMicros} AS gap
         |  FROM minute_bars)
         |SELECT ticker, count(*)::BIGINT AS n_bars,
         |  sum(CASE WHEN gap = 2 THEN 1 ELSE 0 END)::BIGINT AS n_gap2,
         |  sum(CASE WHEN gap = 3 THEN 1 ELSE 0 END)::BIGINT AS n_gap3,
         |  sum(CASE WHEN gap >= 4 THEN 1 ELSE 0 END)::BIGINT AS n_break,
         |  coalesce(max(gap), 0)::BIGINT AS max_gap_steps,
         |  coalesce(sum(gap - 1), 0)::BIGINT AS missing_steps
         |FROM g GROUP BY 1""".stripMargin,

    "dedup_containment" ->
      s"""WITH ${ExtCommon.candPairsDuck},
         |m AS (SELECT a, b,
         |    len(list_distinct(list_intersect(list_distinct(sha), list_distinct(shb))))::DOUBLE AS ia,
         |    len(list_distinct(list_concat(list_distinct(sha), list_distinct(shb))))::DOUBLE AS iu,
         |    len(list_distinct(sha))::DOUBLE AS na,
         |    len(list_distinct(shb))::DOUBLE AS nb
         |  FROM cp)
         |SELECT a, b,
         |  (round(ia / iu, 6) + 0.0) AS jaccard,
         |  (round(ia / na, 6) + 0.0) AS cont_a,
         |  (round(ia / nb, 6) + 0.0) AS cont_b
         |FROM m""".stripMargin,

    "profile_embeddings" ->
      """WITH x AS (SELECT unnest(embedding::DOUBLE[]) AS x,
        |    (generate_subscripts(embedding, 1) - 1)::BIGINT AS dim
        |  FROM embeddings)
        |SELECT dim, count(*)::BIGINT AS n,
        |  (round(avg(x), 6) + 0.0) AS mean,
        |  (round(min(x), 6) + 0.0) AS mn,
        |  (round(max(x), 6) + 0.0) AS mx
        |FROM x GROUP BY 1""".stripMargin,

    "layout_hilbert" -> {
      val lvls = (0 until 8).map { k =>
        val (xe, ye, de) = hilbertLevel(7 - k, s"x$k", s"y$k", s"d$k")
        s"""h${k + 1} AS (SELECT *, $xe AS x${k + 1}, $ye AS y${k + 1},
           |  $de AS d${k + 1} FROM h$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH h0 AS (SELECT l_partkey % 256 AS x0, l_suppkey % 256 AS y0,
         |    0::BIGINT AS d0 FROM lineitem),
         |$lvls
         |SELECT d8 // 4096 AS bucket, count(*)::BIGINT AS n,
         |  min(x0) AS min_x, max(x0) AS max_x,
         |  min(y0) AS min_y, max(y0) AS max_y
         |FROM h8 GROUP BY 1""".stripMargin
    },

    "layout_zorder" -> {
      val z = (0 until 8).map(i =>
        s"((xk >> $i) & 1) * ${1L << (2 * i)}" +
          s" + ((yk >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")
      s"""WITH k AS (SELECT l_partkey % 256 AS xk, l_suppkey % 256 AS yk
         |    FROM lineitem),
         |z AS (SELECT xk, yk, ($z) AS zv FROM k)
         |SELECT zv // 4096 AS bucket, count(*)::BIGINT AS n,
         |  min(xk) AS min_x, max(xk) AS max_x,
         |  min(yk) AS min_y, max(yk) AS max_y
         |FROM z GROUP BY 1""".stripMargin
    },

    "layout_prune_compare" -> {
      val z = (0 until 8).map(i =>
        s"((xk >> $i) & 1) * ${1L << (2 * i)}" +
          s" + ((yk >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")
      val lvls = (0 until 8).map { k =>
        val (xe, ye, de) = hilbertLevel(7 - k, s"x$k", s"y$k", s"d$k")
        s"""lp${k + 1} AS (SELECT *, $xe AS x${k + 1}, $ye AS y${k + 1},
           |  $de AS d${k + 1} FROM lp$k)""".stripMargin
      }.mkString(",\n")
      def pruneD(src: String, name: String): String =
        s"""SELECT '$name' AS layout, count(*)::BIGINT AS n_buckets,
           |  sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS hit_buckets,
           |  sum(n)::BIGINT AS n_rows,
           |  sum(CASE WHEN hit THEN n ELSE 0 END)::BIGINT AS hit_rows,
           |  (round((CAST(1.0 AS DOUBLE) - CAST(sum(CASE WHEN hit THEN n
           |    ELSE 0 END) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
           |    * 1000000.0) / 1000000.0 + 0.0) AS row_skip_ratio
           |FROM (SELECT bucket, count(*)::BIGINT AS n,
           |    min(xk) <= 47 AND max(xk) >= 32
           |      AND min(yk) <= 127 AND max(yk) >= 96 AS hit
           |  FROM $src GROUP BY bucket)
           |HAVING count(*) > 0""".stripMargin
      s"""WITH lpk AS (SELECT l_orderkey, l_partkey % 256 AS xk,
         |    l_suppkey % 256 AS yk FROM lineitem),
         |lpz AS (SELECT ($z) // 4096 AS bucket, xk, yk FROM lpk),
         |lp0 AS (SELECT xk, yk, xk AS x0, yk AS y0, 0::BIGINT AS d0
         |  FROM lpk),
         |$lvls,
         |lph AS (SELECT d8 // 4096 AS bucket, xk, yk FROM lp8),
         |lpn AS (SELECT l_orderkey // ((SELECT max(l_orderkey)
         |    FROM lineitem) // 16 + 1) AS bucket, xk, yk FROM lpk)
         |${pruneD("lpn", "natural")}
         |UNION ALL ${pruneD("lpz", "zorder")}
         |UNION ALL ${pruneD("lph", "hilbert")}""".stripMargin
    },

    "sim_ivf_pq" ->
      s"""WITH $ivfPqChainDuck
         |SELECT q_id, n_id, rank::BIGINT AS rank,
         |  (round(adc, 6) + 0.0) AS adc
         |FROM r WHERE rank <= 3""".stripMargin,

    // IVF-PQ recall@3 vs the exact cosine ground truth on the shared
    // query split (q_id % 50 = 0): the ivf chain is the sim_ivf_pq
    // oracle verbatim; the exact side is one window over the split.
    "sim_ivf_pq_recall" ->
      s"""WITH $ivfPqChainDuck,
         |ivf AS (SELECT q_id, n_id FROM r
         |  WHERE rank <= 3 AND q_id % $TopkSplit = 0),
         |xq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${ivfDotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN en y ON x.vec_id <> y.vec_id),
         |xrk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id) AS rank FROM xsims),
         |ex AS (SELECT q_id, n_id FROM xrk WHERE rank <= 3)
         |SELECT ex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM ex LEFT JOIN ivf ON ivf.q_id = ex.q_id AND ivf.n_id = ex.n_id
         |GROUP BY ex.q_id""".stripMargin,

    "sim_ivf_pq_residual" ->
      s"""WITH $ivfPqResChainDuck
         |SELECT q_id, n_id, rank::BIGINT AS rank,
         |  (round(adc, 6) + 0.0) AS adc
         |FROM r WHERE rank <= 3""".stripMargin,

    "sim_ivf_pq_residual_recall" ->
      s"""WITH $ivfPqResChainDuck,
         |ivf AS (SELECT q_id, n_id FROM r
         |  WHERE rank <= 3 AND q_id % $TopkSplit = 0),
         |xq AS (SELECT * FROM en WHERE vec_id % $HybridSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${ivfDotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN en y ON x.vec_id <> y.vec_id),
         |xrk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id) AS rank FROM xsims),
         |ex AS (SELECT q_id, n_id FROM xrk WHERE rank <= 3)
         |SELECT ex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM ex LEFT JOIN ivf ON ivf.q_id = ex.q_id AND ivf.n_id = ex.n_id
         |GROUP BY ex.q_id""".stripMargin,

    "sim_ivf_opq" ->
      s"""WITH $ivfOpqChainDuck
         |SELECT q_id, n_id, rank::BIGINT AS rank,
         |  (round(adc, 6) + 0.0) AS adc
         |FROM r WHERE rank <= 3""".stripMargin,

    // Exact side deliberately on eb0 (raw dim order), NOT en: the
    // Spark twin's ground truth is sim_topk over unpermuted vectors,
    // and a permuted-order float dot could flip a top-3 tie by an ulp.
    "sim_ivf_opq_recall" ->
      s"""WITH $ivfOpqChainDuck,
         |ivf AS (SELECT q_id, n_id FROM r
         |  WHERE rank <= 3 AND q_id % $TopkSplit = 0),
         |enr AS (SELECT vec_id, v, sqrt(${ivfDotD("v", "v")}) AS nrm
         |  FROM eb0),
         |xq AS (SELECT * FROM enr WHERE vec_id % $HybridSplit = 0),
         |xsims AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id,
         |    ${ivfDotD("x.v", "y.v")} / (x.nrm * y.nrm) AS sim
         |  FROM xq x JOIN enr y ON x.vec_id <> y.vec_id),
         |xrk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id) AS rank FROM xsims),
         |ex AS (SELECT q_id, n_id FROM xrk WHERE rank <= 3)
         |SELECT ex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM ex LEFT JOIN ivf ON ivf.q_id = ex.q_id AND ivf.n_id = ex.n_id
         |GROUP BY ex.q_id""".stripMargin,

    "sample_fps" -> {
      def l2(a: String, b: String): String =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
          s"generate_series(1, len($a)), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))," +
          s" (x, y) -> x + y)"
      def round(k: Int): String = {
        val (prev, p, x, next) = (s"m${k - 1}", s"p$k", s"x$k", s"m$k")
        s"""$p AS (SELECT vec_id AS cid, v AS cv FROM $prev
           |  ORDER BY mind2 DESC, vec_id LIMIT 1),
           |$x AS (SELECT m.vec_id, m.v, m.mind2, m.nearest, p.cid,
           |    ${l2("m.v", "p.cv")} AS d2n
           |  FROM $prev m CROSS JOIN $p p),
           |$next AS MATERIALIZED (SELECT vec_id, v,
           |    CASE WHEN d2n < mind2 THEN d2n ELSE mind2 END AS mind2,
           |    CASE WHEN d2n < mind2 THEN cid ELSE nearest END AS nearest
           |  FROM $x)""".stripMargin
      }
      s"""WITH eb AS (SELECT vec_id::BIGINT AS vec_id,
         |    embedding::DOUBLE[] AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM eb WHERE vec_id = 0),
         |m0 AS MATERIALIZED (SELECT e.vec_id, e.v,
         |    ${l2("e.v", "c.cv")} AS mind2, c.cid AS nearest
         |  FROM eb e CROSS JOIN c0 c),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)}
         |SELECT vec_id, nearest, (round(mind2, 6) + 0.0) AS d2
         |FROM m4""".stripMargin
    },

    "ts_resample" ->
      s"""WITH ${EventBars.sqlMinuteBars},
         |bb AS (SELECT *, ws // $BarStep AS bar FROM minute_bars)
         |SELECT ticker, (bar * $BarStep)::BIGINT AS bar_start,
         |  (round(first(open ORDER BY ws, event_id), 6) + 0.0) AS open,
         |  (round(max(high), 6) + 0.0) AS high,
         |  (round(min(low), 6) + 0.0) AS low,
         |  (round(last(close ORDER BY ws, event_id), 6) + 0.0) AS close,
         |  (round(sum(volume), 6) + 0.0) AS volume,
         |  (round(sum(close * volume) / sum(volume), 4) + 0.0) AS vwap,
         |  count(*)::BIGINT AS n_bars
         |FROM bb GROUP BY 1, 2""".stripMargin)
}
