package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.functions.GraftFunctions

/** Corpus-curation operators, batch 3: duplicated-span mass, shingle
  * novelty, CCNet-style commonness bucketing, and bag-of-words dedup
  * (builder prompt "training-data pipeline" surface; extends the
  * ExtQueries / CorpusQueries / Corpus2Queries families).
  *
  * Scale notes (100 TB design point):
  *  - span/novelty stats explode shingles once, then every join keys
  *    on the 8-byte shingle hash — shuffle width is O(tokens) ids and
  *    hashes, never text; the per-(doc, shingle) table checkpoints
  *    once and feeds both the global-frequency build and the join
  *    back (one evaluation of the tokenize→hash lineage);
  *  - commonness bucketing joins tokens to a broadcast vocabulary and
  *    takes per-LANG tercile thresholds via [[ExactQuantile.grouped]]
  *    — lang is low-cardinality (5 values), exactly the shape whose
  *    naive `Window.partitionBy(lang)` form would funnel n/5 of the
  *    corpus through single tasks;
  *  - bag-of-words dedup reduces each doc to a 16-byte digest of its
  *    sorted token list in the scan task; only (source, digest) pairs
  *    shuffle.
  */
object Corpus3Queries {

  import TextOps._
  import Rounding.r6

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  // Spark-side shingle fragments (mirror ExtQueries' private whS/shS).
  private val whS = whNativeSpark
  private val shS = shNativeSpark

  /** Per-(doc, shingle-hash) occurrence counts — the shared skeleton
    * of the span/novelty stats. Checkpointed: consumers join it
    * against aggregates of itself, and without the checkpoint each
    * side would re-run the tokenize→hash→explode scan. */
  private def docShingleCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("wh", expr(whS))
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(expr(shS)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .localCheckpoint()

  /** Token budget for the greedy corpus selection — generous enough
    * that the gate SFs keep a meaningful prefix, not everything. */
  private val TokenBudget = 20000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // Greedy corpus selection under a TOKEN BUDGET: rank every doc by
    // lexical-diversity score (distinct/total tokens — deterministic,
    // one division) and keep the prefix whose cumulative token count
    // fits the budget — the data-mixing step that turns "score every
    // doc" into "pick what we can afford to train on". The global
    // rank + running sum go through [[DistRank]]'s range-bucketed
    // two-phase (no single-partition window at any corpus size);
    // integer token counts make the running sum exact.
    "corpus_token_budget" -> ((s, dir) => {
      val d = docs(s, dir)
        // NULL text folds to the empty doc on BOTH engines (the
        // dedup_bow contract): without this, Spark's NULL token array
        // gives a NULL score that hard-fails DistRank's non-null
        // bucket-key guard while DuckDB silently drops the row.
        .withColumn("text", coalesce(col("text"), lit("")))
        .withColumn("toks", expr(toksSpark))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("CAST(size(toks) AS BIGINT)").as("n_toks"),
          expr("CASE WHEN size(toks) = 0 THEN 0.0D ELSE " +
            "CAST(size(array_distinct(toks)) AS DOUBLE)" +
            " / CAST(size(toks) AS DOUBLE) END").as("score"))
      DistRank.rowNumber(d, "rn", negate(col("score")),
          Seq(col("score").desc, col("doc_id")), runSumCols = Seq("n_toks")).df
        .filter(col("run_n_toks") <= TokenBudget)
        .select(col("doc_id"), col("n_toks"),
          Rounding.r6(col("score")).as("score"),
          col("run_n_toks").as("run_toks"))
    }),

    // Interpolated Kneser–Ney bigram scorer (fixed discount 0.75) —
    // the LM smoothing actually used for n-gram quality filters:
    // P(w₂|w₁) = max(c₁₂−d,0)/c₁• + d·N₁₊(w₁,·)/c₁• · N₁₊(·,w₂)/N₁₊(·,·),
    // where the continuation counts are bigram-TYPE counts, so "of the"
    // stops inflating P(the|·) the way add-one smoothing lets it.
    // Same plan shape as text_bigram_lp: every statistic is a groupBy
    // over the bigram-type table (map-side partials, counts exact
    // longs), the three dictionaries broadcast back onto the per-doc
    // bigram stream, and each doc's positions fold in explode order
    // inside one map task — documents never shuffle. λ > 0 for every
    // observed history, so the log never sees zero.
    "text_kn_bigram" -> ((s, dir) => {
      val dt = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(toksSpark).as("toks"))
      val bg = dt.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1," +
            " element_at(toks, i + 1) AS w2))")).as(Seq("pos", "b")))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .localCheckpoint()
      val hist = c2.groupBy("w1")
        .agg(sum(col("c2")).as("c1h"), count(lit(1)).as("n1f"))
      val cont = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
      val tot = c2.agg(count(lit(1)).cast("double").as("n1a"))
      bg.join(broadcast(c2), Seq("w1", "w2"))
        .join(broadcast(hist), Seq("w1"))
        .join(broadcast(cont), Seq("w2"))
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          Rounding.r6(avg(log10(
            greatest(col("c2").cast("double") - lit(0.75), lit(0.0))
              / col("c1h").cast("double")
              + (lit(0.75) * col("n1f").cast("double")
                / col("c1h").cast("double"))
                * (col("n1b").cast("double") / col("n1a")))))
            .as("avg_lp"))
    }),


    // Duplicated-span mass (the groupBy form of suffix-array exact
    // substring dedup à la "Deduplicating Training Data Makes
    // Language Models Better"): a 3-gram shingle occurrence is
    // duplicated when its hash appears in ≥ 2 DISTINCT docs; per doc
    // the report carries total shingle occurrences, duplicated
    // occurrences, and the duplicated fraction — the number a span
    // removal pass would act on. Shingle-frequency build and join
    // both key on the hash; docs without shingles (< 3 tokens)
    // re-attach from the cheap id scan with zero mass.
    "text_dup_spans" -> ((s, dir) => {
      val pdg = docShingleCounts(s, dir)
      val gd = pdg.groupBy("g").agg(count(lit(1)).as("nd"))
      val agg = pdg.join(gd, Seq("g"))
        .groupBy("doc_id").agg(
          sum(col("c")).as("n_sh"),
          sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_dup"))
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_sh"), lit(0L)).as("n_shingles"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          r6(coalesce(
            try_divide(col("n_dup").cast("double"), col("n_sh").cast("double")),
            lit(0.0))).as("dup_frac"))
    }),

    // Shingle novelty: the fraction of a doc's shingle occurrences
    // whose shingle FIRST appears in this doc (owner = min doc_id over
    // the corpus). High novelty = fresh content; low = assembled from
    // already-seen spans. Corpus-growth curation reads this ordered by
    // doc_id. Same skeleton as text_dup_spans; the ownership table is
    // one groupBy of the checkpointed (doc, g, c) counts.
    "text_novelty" -> ((s, dir) => {
      val pdg = docShingleCounts(s, dir)
      val own = pdg.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      val agg = pdg.join(own, Seq("g"))
        .groupBy("doc_id").agg(
          sum(col("c")).as("n_sh"),
          sum(when(col("doc_id") === col("first_doc"), col("c"))
            .otherwise(0L)).as("n_novel"))
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_sh"), lit(0L)).as("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          r6(coalesce(
            try_divide(col("n_novel").cast("double"),
              col("n_sh").cast("double")),
            lit(0.0))).as("novelty_frac"))
    }),

    // CCNet-style corpus bucketing by per-language commonness
    // terciles: score(doc) = (Σ_tok corpus-frequency(tok)) / n_toks —
    // an exact-integer sum (order-independent, unlike a float logprob
    // sum) with ONE final division, so both engines produce identical
    // doubles. Thresholds are per-lang exact interpolated terciles via
    // the range-bucketed grouped quantile (lang is 5-valued — the
    // low-cardinality shape). head = most common tokens (CCNet's
    // low-perplexity bucket). Per-(lang, bucket) masses aggregate
    // integers only; the single mean division happens post-agg.
    "corpus_commonness_buckets" -> ((s, dir) => {
      val tk = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          explode(expr(toksSpark)).as("tok"))
      val vocab = tk.groupBy("tok").agg(count(lit(1)).as("c"))
      val perDoc = tk.join(broadcast(vocab), Seq("tok"))
        .groupBy("doc_id", "lang").agg(
          count(lit(1)).as("n_toks"),
          sum(col("c")).as("sum_c"))
        .withColumn("score",
          col("sum_c").cast("double") / col("n_toks").cast("double"))
        .localCheckpoint()
      val th = ExactQuantile.grouped(perDoc, "lang", "score",
        Seq((1.0 / 3, "q33"), (2.0 / 3, "q67")), checkpoint = false)
      perDoc.join(broadcast(th), Seq("lang"))
        .withColumn("bucket",
          when(col("score") >= col("q67"), "head")
            .when(col("score") >= col("q33"), "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("tok_mass"),
          r6(sum(col("sum_c")).cast("double")
            / sum(col("n_toks")).cast("double")).as("mean_commonness"))
    }),

    // Bag-of-words dedup: two docs are BoW-equal when their sorted
    // token lists match — catches token-shuffled copies that exact
    // (byte) dedup misses (and this corpus' generator does produce
    // them). Each doc reduces to a 16-byte digest in the scan task;
    // the per-source report compares raw rows vs exact-distinct vs
    // BoW-distinct, with shuffle_dups = the extra copies only the BoW
    // key finds.
    "dedup_bow" -> ((s, dir) =>
      docs(s, dir)
        // NULL text folds to the empty doc on BOTH engines — without
        // this, Spark's concat_ws maps a null token array to "" (md5
        // counted) while DuckDB's array_to_string stays NULL (skipped
        // by count DISTINCT) and n_bow drifts by one per null doc.
        .withColumn("text", coalesce(col("text"), lit("")))
        .select(col("source"), col("text"),
          md5(concat_ws(" ", array_sort(expr(toksSpark)))).as("bow_h"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_exact"),
          countDistinct(col("bow_h")).as("n_bow"))
        .select(col("source"), col("n_docs"), col("n_exact"), col("n_bow"),
          (col("n_exact") - col("n_bow")).as("shuffle_dups"))),

    // Vocabulary coverage curve: what share of corpus token MASS the
    // top-k most frequent types cover, at k ∈ {100, 1k, 10k} — the
    // curve that sizes a tokenizer's vocab (tok_vocab_coverage checks
    // one fixed vocab; this emits the frontier). Ranking the vocab by
    // frequency rides the range-bucketed DistRank (a global ORDER BY
    // over the type table would single-task at web-scale vocabularies);
    // the three cutoffs are conditional integer sums over the ranked
    // table, one scan each.
    "tok_coverage_curve" -> ((s, dir) => {
      val vf = docs(s, dir).select(explode(expr(toksSpark)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .withColumn("neg", negate(col("cnt")))
      val ranked = DistRank.rowNumber(vf, "_rk", col("neg"),
        Seq(col("neg"), col("tok"))).df.localCheckpoint()
      Seq(100L, 1000L, 10000L).map { k =>
        ranked.groupBy(lit(k).as("k"))
          .agg(sum(when(col("_rk") <= k, lit(1L)).otherwise(lit(0L)))
            .as("vocab_k"),
            r6(expr(s"CAST(sum(CASE WHEN _rk <= $k THEN cnt ELSE 0 END)" +
              " AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)")).as("coverage"))
      }.reduce(_ unionAll _)
    }),

    // Cross-doc exact-substring DEDUP (the removal pass text_dup_spans
    // only measures): every 3-token shingle occurrence that is not the
    // corpus-global FIRST occurrence of its shingle (keeper = min
    // (doc_id, pos) struct — one map-side-combinable argmin per hash)
    // marks its three token positions for removal; each doc rebuilds
    // from the surviving tokens. Ownership and the join back both key
    // on the 8-byte shingle hash; removal positions shuffle as
    // (doc_id, int) pairs bounded by token count; the rebuild is one
    // projection over the checkpointed token table — text never rides
    // a shuffle twice.
    "dedup_substring" -> ((s, dir) => {
      val base = docs(s, dir)
        // NULL text folds to the empty doc on BOTH engines (the
        // dedup_bow / corpus_token_budget contract): without this a
        // NULL-text doc yields NULL n_toks/clean_text on Spark while
        // the oracle coalesces clean_text to ''.
        .withColumn("text", coalesce(col("text"), lit("")))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(toksSpark).as("toks"))
        .withColumn("wh", expr("graft_word_hashes(toks)"))
        .localCheckpoint()
      val occ = base
        .select(col("doc_id"),
          posexplode(expr("graft_shingles(wh)")).as(Seq("p0", "g")))
        .select(col("doc_id"), (col("p0") + 1).as("i"), col("g"))
      val own = occ.groupBy("g")
        .agg(min(struct(col("doc_id"), col("i"))).as("k"))
      val rm = occ.join(own, Seq("g"))
        .filter(col("doc_id") =!= col("k.doc_id") || col("i") =!= col("k.i"))
        .select(col("doc_id"), explode(expr("sequence(i, i + 2)")).as("p"))
        .groupBy("doc_id").agg(collect_set(col("p")).as("rm"))
      base.join(rm, Seq("doc_id"), "left")
        .select(col("doc_id"),
          expr("CAST(size(toks) AS BIGINT)").as("n_toks"),
          expr("CAST(coalesce(size(rm), 0) AS BIGINT)").as("n_removed"),
          expr("CASE WHEN size(toks) = 0 THEN '' ELSE " +
            "array_join(filter(transform(sequence(1, size(toks)), p -> " +
            "CASE WHEN coalesce(array_contains(rm, p), false) THEN NULL " +
            "ELSE element_at(toks, p) END), x -> x IS NOT NULL), ' ') END")
            .as("clean_text"))
    }),

    // Content-defined chunking (the FastCDC shape at token
    // granularity): a chunk boundary falls AFTER any token whose hash
    // ≡ 0 (mod 8) — boundaries move with CONTENT, not position, so an
    // insertion redraws only the chunk it lands in, where the
    // fixed-stride text_chunk redraws every later chunk (the property
    // that makes CDC the standard for storage/corpus dedup of long,
    // lightly-edited documents). Chunk identity = ordered base-31 fold
    // of its token hashes; the cross-corpus chunk-dedup readout
    // reports each doc's chunk count and duplicated chunk/token mass.
    // Scale shape: one posexplode, ONE hash(doc_id) window exchange
    // (docs are bounded length — this is not an unpartitioned window),
    // the chunk-key table shuffles (doc_id, chunk, 2 longs) — never
    // text; copies is a key-keyed count joined back by key.
    "text_cdc_chunks" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          posexplode(expr(whS)).as(Seq("pos", "h")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val keys = tok
        .withColumn("b", when(col("h") % 8 === 0, 1L).otherwise(0L))
        .withColumn("chunk", coalesce(sum(col("b")).over(wd), lit(0L)))
        .groupBy("doc_id", "chunk")
        .agg(count(lit(1)).as("n_toks"),
          expr("aggregate(transform(array_sort(collect_list(struct(pos, h)))," +
            s" x -> x.h), CAST(7 AS BIGINT), (a, b) -> (a*31 + b) % $P)")
            .as("ck"))
        .localCheckpoint()
      val copies = keys.groupBy("ck").agg(count(lit(1)).as("n_copies"))
      keys.join(copies, Seq("ck"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_chunks"),
          sum(col("n_toks")).as("n_toks"),
          sum(when(col("n_copies") > 1, 1L).otherwise(0L))
            .as("n_dup_chunks"),
          sum(when(col("n_copies") > 1, col("n_toks")).otherwise(0L))
            .as("dup_toks"))
    }))


  // ---- DuckDB oracles ----

  private val docSh =
    s"""dh AS (SELECT doc_id::BIGINT AS doc_id,
       |    ${wordHashesDuck(toksDuck)} AS wh FROM documents),
       |occ AS (SELECT doc_id, unnest(${shinglesDuck("wh")}) AS g FROM dh),
       |pdg AS (SELECT doc_id, g, count(*)::BIGINT AS c
       |  FROM occ GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(

    "text_cdc_chunks" ->
      s"""WITH dh AS (SELECT doc_id::BIGINT AS doc_id,
         |    ${wordHashesDuck(toksDuck)} AS wh FROM documents),
         |tk AS (SELECT doc_id, unnest(wh) AS h,
         |    generate_subscripts(wh, 1) AS pos FROM dh),
         |cb AS (SELECT doc_id, pos, h,
         |    coalesce(sum(CASE WHEN h % 8 = 0 THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY doc_id ORDER BY pos
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS chunk FROM tk),
         |ks AS (SELECT doc_id, chunk, count(*)::BIGINT AS n_toks,
         |    list_reduce(list_prepend(7::BIGINT, list(h ORDER BY pos)),
         |      (a, b) -> (a*31 + b) % $P) AS ck
         |  FROM cb GROUP BY doc_id, chunk),
         |cp AS (SELECT ck, count(*)::BIGINT AS n_copies FROM ks GROUP BY ck)
         |SELECT doc_id, count(*)::BIGINT AS n_chunks,
         |  sum(n_toks)::BIGINT AS n_toks,
         |  sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_dup_chunks,
         |  sum(CASE WHEN n_copies > 1 THEN n_toks ELSE 0 END)::BIGINT
         |    AS dup_toks
         |FROM ks JOIN cp USING (ck) GROUP BY doc_id""".stripMargin,

    "tok_coverage_curve" ->
      s"""WITH tk AS (SELECT unnest($toksDuck) AS tok FROM documents),
         |vf AS (SELECT tok, count(*)::BIGINT AS cnt FROM tk GROUP BY 1),
         |rk AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, tok)
         |    ::BIGINT AS rk FROM vf)
         |SELECT k::BIGINT AS k,
         |  sum(CASE WHEN rk <= k THEN 1 ELSE 0 END)::BIGINT AS vocab_k,
         |  (round((sum(CASE WHEN rk <= k THEN cnt ELSE 0 END)::DOUBLE
         |    / sum(cnt)::DOUBLE) * 1000000.0) / 1000000.0 + 0.0) AS coverage
         |FROM rk, (VALUES (100), (1000), (10000)) AS ks(k)
         |GROUP BY 1""".stripMargin,

    "dedup_substring" ->
      s"""WITH d0 AS (SELECT doc_id, coalesce(text, '') AS text
         |    FROM documents),
         |dt AS (SELECT doc_id::BIGINT AS doc_id, $toksDuck AS toks
         |    FROM d0),
         |dh AS (SELECT *, ${wordHashesDuck("toks")} AS wh FROM dt),
         |occ0 AS (SELECT doc_id, wh,
         |    unnest(generate_series(1, len(wh) - 2)) AS i FROM dh),
         |occ AS (SELECT doc_id, i,
         |    (((wh[i]*131 + wh[i+1]) % $P)*131 + wh[i+2]) % $P AS g FROM occ0),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY g
         |    ORDER BY doc_id, i) AS rn FROM occ),
         |rmp0 AS (SELECT doc_id, unnest([i, i + 1, i + 2]) AS p
         |  FROM rk WHERE rn > 1),
         |rmp AS (SELECT DISTINCT doc_id, p FROM rmp0),
         |rmagg AS (SELECT doc_id, count(*)::BIGINT AS n_removed,
         |    list(p) AS rm FROM rmp GROUP BY 1)
         |SELECT dt.doc_id, len(dt.toks)::BIGINT AS n_toks,
         |  coalesce(rmagg.n_removed, 0)::BIGINT AS n_removed,
         |  CASE WHEN len(dt.toks) = 0 THEN '' ELSE
         |    coalesce(array_to_string(list_filter(list_transform(
         |      generate_series(1, len(dt.toks)),
         |      p -> CASE WHEN coalesce(list_contains(rmagg.rm, p), false)
         |        THEN NULL ELSE dt.toks[p] END),
         |      x -> x IS NOT NULL), ' '), '') END AS clean_text
         |FROM dt LEFT JOIN rmagg ON rmagg.doc_id = dt.doc_id""".stripMargin,

    "text_kn_bigram" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, $toksDuck AS toks
         |    FROM documents),
         |bg AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - 1),
         |      i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
         |  FROM dt WHERE len(toks) >= 2),
         |b2 AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
         |c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM b2 GROUP BY 1, 2),
         |hist AS (SELECT w1, sum(c2)::BIGINT AS c1h, count(*)::BIGINT AS n1f
         |  FROM c2 GROUP BY 1),
         |cont AS (SELECT w2, count(*)::BIGINT AS n1b FROM c2 GROUP BY 1),
         |tot AS (SELECT count(*)::DOUBLE AS n1a FROM c2)
         |SELECT b2.doc_id, count(*)::BIGINT AS n_bigrams,
         |  (round(avg(log10(
         |    greatest(CAST(c2.c2 AS DOUBLE) - 0.75, 0.0)
         |      / CAST(hist.c1h AS DOUBLE)
         |    + (0.75 * CAST(hist.n1f AS DOUBLE) / CAST(hist.c1h AS DOUBLE))
         |      * (CAST(cont.n1b AS DOUBLE) / tot.n1a))), 6) + 0.0) AS avg_lp
         |FROM b2 JOIN c2 USING (w1, w2) JOIN hist USING (w1)
         |  JOIN cont USING (w2) CROSS JOIN tot
         |GROUP BY 1""".stripMargin,

    "corpus_token_budget" ->
      s"""WITH dn AS (SELECT doc_id, coalesce(text, '') AS text
         |  FROM documents),
         |dt AS (SELECT doc_id::BIGINT AS doc_id,
         |    $toksDuck AS toks FROM dn),
         |sc AS (SELECT doc_id, len(toks)::BIGINT AS n_toks,
         |    CASE WHEN len(toks) = 0 THEN 0.0::DOUBLE
         |      ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE
         |    END AS score FROM dt),
         |r AS (SELECT *, sum(n_toks) OVER (ORDER BY score DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING)::BIGINT AS run_toks FROM sc)
         |SELECT doc_id, n_toks, (round(score, 6) + 0.0) AS score, run_toks
         |FROM r WHERE run_toks <= $TokenBudget""".stripMargin,

    "text_dup_spans" ->
      s"""WITH $docSh,
         |gd AS (SELECT g, count(*)::BIGINT AS nd FROM pdg GROUP BY 1),
         |agg AS (SELECT pdg.doc_id, sum(pdg.c)::BIGINT AS n_sh,
         |    sum(CASE WHEN gd.nd >= 2 THEN pdg.c ELSE 0 END)::BIGINT AS n_dup
         |  FROM pdg JOIN gd USING (g) GROUP BY 1)
         |SELECT d.doc_id::BIGINT AS doc_id,
         |  coalesce(agg.n_sh, 0)::BIGINT AS n_shingles,
         |  coalesce(agg.n_dup, 0)::BIGINT AS n_dup,
         |  (round(coalesce(agg.n_dup::DOUBLE / agg.n_sh::DOUBLE, 0.0), 6) + 0.0)
         |    AS dup_frac
         |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id::BIGINT""".stripMargin,

    "text_novelty" ->
      s"""WITH $docSh,
         |own AS (SELECT g, min(doc_id) AS first_doc FROM pdg GROUP BY 1),
         |agg AS (SELECT pdg.doc_id, sum(pdg.c)::BIGINT AS n_sh,
         |    sum(CASE WHEN pdg.doc_id = own.first_doc THEN pdg.c ELSE 0 END)::BIGINT
         |      AS n_novel
         |  FROM pdg JOIN own USING (g) GROUP BY 1)
         |SELECT d.doc_id::BIGINT AS doc_id,
         |  coalesce(agg.n_sh, 0)::BIGINT AS n_shingles,
         |  coalesce(agg.n_novel, 0)::BIGINT AS n_novel,
         |  (round(coalesce(agg.n_novel::DOUBLE / agg.n_sh::DOUBLE, 0.0), 6) + 0.0)
         |    AS novelty_frac
         |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id::BIGINT""".stripMargin,

    "corpus_commonness_buckets" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, lang,
         |    $toksDuck AS toks FROM documents),
         |tk AS (SELECT doc_id, lang, unnest(toks) AS tok FROM dt),
         |v AS (SELECT tok, count(*)::BIGINT AS c FROM tk GROUP BY 1),
         |pd AS (SELECT tk.doc_id, tk.lang, count(*)::BIGINT AS n_toks,
         |    sum(v.c)::BIGINT AS sum_c
         |  FROM tk JOIN v USING (tok) GROUP BY 1, 2),
         |sc AS (SELECT *, sum_c::DOUBLE / n_toks::DOUBLE AS score FROM pd),
         |th AS (SELECT lang, quantile_cont(score, 1.0/3) AS q33,
         |    quantile_cont(score, 2.0/3) AS q67 FROM sc GROUP BY 1)
         |SELECT sc.lang,
         |  CASE WHEN score >= q67 THEN 'head'
         |       WHEN score >= q33 THEN 'middle' ELSE 'tail' END AS bucket,
         |  count(*)::BIGINT AS n_docs,
         |  sum(n_toks)::BIGINT AS tok_mass,
         |  (round(sum(sum_c)::DOUBLE / sum(n_toks)::DOUBLE, 6) + 0.0)
         |    AS mean_commonness
         |FROM sc JOIN th USING (lang) GROUP BY 1, 2""".stripMargin,

    "dedup_bow" ->
      s"""SELECT source, count(*)::BIGINT AS n_docs,
         |  count(DISTINCT md5(text))::BIGINT AS n_exact,
         |  count(DISTINCT md5(array_to_string(list_sort($toksDuck), ' ')))::BIGINT
         |    AS n_bow,
         |  (count(DISTINCT md5(text))
         |    - count(DISTINCT md5(array_to_string(list_sort($toksDuck), ' '))))::BIGINT
         |    AS shuffle_dups
         |FROM (SELECT source, coalesce(text, '') AS text FROM documents) d
         |GROUP BY 1""".stripMargin)
}
