package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, ConnectedComponents, Multimodal, TextOps}
import graft.functions.GraftFunctions

import TextOps._
import ExtCommon._

/** Text analysis / curation family (SURVEY.md §7.4; split out of
  * ExtQueries r11): stats, language-ID, fingerprints, quality + PII
  * reports, packing, TF-IDF, decontamination, DSIR, n-gram LMs, and the
  * corpus sampling/mixing suite. Token/shingle SQL fragments live in
  * [[ExtCommon]]. */
object TextCurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
      val highQuality = ExtQueries.queries("text_stats")(s, dir)
        .select(col("doc_id"), col("quality"))
        .filter(col("quality") >= 0.5)
      val notRepetitive = ExtQueries.queries("text_repetition")(s, dir)
        .filter(!col("repetitive")).select("doc_id")
      val exactKeep = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(col("text")).as("h"))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val nearKeep = ExtQueries.queries("dedup_keep")(s, dir).select("doc_id")
      val contaminated = ExtQueries.queries("text_decontaminate")(s, dir)
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

    // Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    // SIGMOD'03 — the MOSS algorithm): over each doc's 3-gram shingle
    // hashes, slide a w=4 window and keep the window's minimum hash
    // (leftmost on ties — deterministic; ties only arise from repeated
    // identical shingles), dedup the selected (pos, hash) set. The
    // guarantee winnowing buys at 100 TB: any shared substring of
    // ≥ w+2 tokens yields at least one shared fingerprint, at ~2/(w+1)
    // the density of keeping every shingle. (hash, pos) packs into ONE
    // BIGINT key (h < 2^30·4, pos < 2^32) so the frame-min is a single
    // native min — no struct compare, no self-join; the per-doc window
    // is pos-ordered and bounded, the same exchange shape as every
    // other per-doc op. Docs shorter than w keep their global min
    // (the truncated first frame), matching the reference algorithm's
    // degenerate case.
    "text_winnow" -> ((s, dir) => {
      val ex = docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(whS))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("CAST(size(graft_shingles(wh)) AS BIGINT)").as("m"),
          posexplode(expr(shS)).as(Seq("i", "h")))
        .select(col("doc_id"), col("m"),
          (col("i").cast("long") + 1L).as("pos"), col("h"))
      ex.withColumn("key", expr("h * 4294967296 + pos"))
        .withColumn("mk", min(col("key")).over(
          Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)))
        .filter(col("pos") <= greatest(lit(1L), col("m") - 3L))
        .select(col("doc_id"),
          expr("mk % 4294967296").as("fp_pos"),
          expr("mk DIV 4294967296").as("fp_hash"))
        .distinct()
    }),

    // Pairwise Jensen-Shannon divergence between the sources' unigram
    // distributions — the mixture-design readout next to corpus_doremi
    // (how REDUNDANT two sources are, 0 = identical LM, ln 2 =
    // disjoint). Decomposition dodges the per-pair full-outer join:
    // JS = ½Σp·ln p + ½Σq·ln q − Σm·ln m with m = (p+q)/2 splits into
    // two PER-SOURCE scalars plus an INNER token join correction
    // (tokens present in only one side fold into the per-source
    // Σ(p/2)ln(p/2) scalar exactly). Every term is nano-quantized at
    // the token row, so all sums are exact longs; the pair assembly
    // is an S²-row broadcast of per-source aggregates. Scale shape:
    // one (source, token) collapse, one token-keyed inner join with
    // S-bounded fan, S²/2 output rows.
    "corpus_js_sources" -> ((s, dir) => {
      val ct = docs(s, dir)
        .select(col("source"), explode(expr(toksSpark)).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("source")))
        .localCheckpoint()
      val perSrc = ct
        .withColumn("p", expr("CAST(c AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("t1", expr(
          "CAST(round(p * ln(p) * 1000000000.0) AS BIGINT)"))
        .withColumn("t2", expr(
          "CAST(round((p / 2.0) * ln(p / 2.0) * 1000000000.0) AS BIGINT)"))
        .groupBy("source").agg(max(col("n")).as("n_toks"),
          sum(col("t1")).as("sp"), sum(col("t2")).as("sp2"))
        .localCheckpoint()
      val both = ct.as("x").join(ct.as("y"),
          col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
        .withColumn("p", expr("CAST(x.c AS DOUBLE) / CAST(x.n AS DOUBLE)"))
        .withColumn("q", expr("CAST(y.c AS DOUBLE) / CAST(y.n AS DOUBLE)"))
        .withColumn("tb", expr(
          "CAST(round((((p + q) / 2.0) * ln((p + q) / 2.0)" +
            " - (p / 2.0) * ln(p / 2.0) - (q / 2.0) * ln(q / 2.0))" +
            " * 1000000000.0) AS BIGINT)"))
        .select(col("x.source").as("source_a"),
          col("y.source").as("source_b"), col("tb"))
        .groupBy("source_a", "source_b").agg(sum(col("tb")).as("sboth"))
      perSrc.as("a")
        .join(broadcast(perSrc.as("b")), col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"),
          col("b.source").as("source_b"),
          col("a.n_toks").as("n_a"), col("b.n_toks").as("n_b"),
          col("a.sp").as("spa"), col("a.sp2").as("sp2a"),
          col("b.sp").as("spb"), col("b.sp2").as("sp2b"))
        .join(broadcast(both), Seq("source_a", "source_b"), "left")
        .withColumn("js", expr(
          "(CAST(spa + spb AS DOUBLE) / 2.0" +
            " - CAST(sp2a + sp2b + coalesce(sboth, 0) AS DOUBLE))" +
            " / 1000000000.0"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          Rounding.r6(col("js")).as("js"),
          Rounding.r6(expr("js / ln(CAST(2.0 AS DOUBLE))")).as("js_norm"))
    }),

    // Winnowing-index dedup — the MOSS pipeline end-to-end: the
    // selected fingerprints become an inverted index, docs sharing
    // ≥ 2 fingerprints become candidate pairs, and candidates verify
    // by exact 3-gram jaccard. The substring-robust dedup path next
    // to MinHash's bag-of-shingles: winnowing GUARANTEES a shared
    // fingerprint for any shared run of ≥ w+2 tokens, so a long
    // verbatim quote inside otherwise-different docs is caught where
    // whole-doc MinHash dilutes it. Posting lists are capped at
    // [[ExtCommon.MaxBandBucket]] docs (boilerplate phrases — the
    // same flood guard as the LSH bands, window keyed on the join
    // key); pair counts and the verify join carry ids only. Derived
    // from text_winnow so index and report can never drift.
    "dedup_winnow" -> ((s, dir) => {
      val fps = queries("text_winnow")(s, dir)
        .select(col("doc_id"), col("fp_hash")).distinct()
        .localCheckpoint()
      val capped = fps
        .withColumn("ndw",
          count(lit(1)).over(Window.partitionBy("fp_hash")))
        .filter(col("ndw") <= MaxBandBucket)
        .select("doc_id", "fp_hash")
      val pairs = capped.as("x").hint("shuffle_hash")
        .join(capped.as("y").hint("shuffle_hash"),
          col("x.fp_hash") === col("y.fp_hash") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
      val shq = docs(s, dir)
        .withColumn("toks", expr(toksSpark))
        .withColumn("wh", expr(whS))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("array_distinct(graft_shingles(wh))").as("shd"))
      pairs
        .join(shq.select(col("doc_id").as("a"), col("shd").as("sha")),
          Seq("a"))
        .join(shq.select(col("doc_id").as("b"), col("shd").as("shb")),
          Seq("b"))
        .withColumn("jac", jaccardExpr)
        .select(col("a"), col("b"), col("n_shared"),
          Rounding.r6(col("jac")).as("jaccard"),
          (col("jac") >= 0.5).as("is_dup"))
    }),

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
      val nk = ExtQueries.queries("dedup_keep")(s, dir).select("doc_id")
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
      ExtQueries.queries("text_langid")(s, dir).select(col("doc_id"), col("pred"))
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

    // Token BURSTINESS (variance-to-mean ratio of per-doc counts,
    // zeros included): the template/boilerplate detector -- a Poisson
    // token has VMR ~ 1, a token that appears 40x in a handful of
    // templated docs has VMR >> 1. Top-200 tokens by corpus count
    // (deterministic cut), VMR = (N*Sum(c^2) - C^2) / (N*C) computed
    // entirely in exact integers (widened to DECIMAL(38,0)/HUGEINT --
    // doc-count x count-square products wrap BIGINT at 100 TB) with
    // ONE double division at the end. Scale shape: one (doc, token)
    // count pass that collapses map-side, a vocab-sized moment
    // aggregate, a 200-row TakeOrdered; N rides a one-row broadcast.
    "corpus_burstiness" -> ((s, dir) => {
      val dt = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          explode(expr(toksSpark)).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val nd = docs(s, dir).agg(count(lit(1)).as("nd"))
      dt.groupBy("tok")
        .agg(sum(col("c")).as("ct"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("c2"),
          count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .select(col("tok"), col("ct"), col("df"),
          Rounding.r6(expr("CAST(CAST(nd AS DECIMAL(38,0)) * c2" +
            " - CAST(ct AS DECIMAL(38,0)) * ct AS DOUBLE)" +
            " / (CAST(nd AS DOUBLE) * CAST(ct AS DOUBLE))")).as("vmr"))
        .orderBy(col("ct").desc, col("tok"))
        .limit(200)
    }),

    // DoReMi-style domain reweighting (Xie et al., NeurIPS'23
    // posture, reduced to its measurable core): each source's EXCESS
    // loss -- the cross-entropy of its tokens under the corpus-wide
    // unigram LM minus under the source's own LM (the divergence
    // domain-aware training could reclaim) -- becomes the mixture
    // weight, normalized across sources. Both LMs are add-one-smoothed
    // over the GLOBAL vocabulary so every token has mass in both.
    // Every ln quantizes to integer micro-nats BEFORE the weighted
    // sums, and the count x log products widen to DECIMAL(38,0) (the
    // sums stay exact at 100 TB token frequencies where BIGINT
    // products would wrap); each per-source division happens once at
    // the end. Scale shape: the corpus collapses to (source, token)
    // counts in one map-side-combinable pass (vocab x sources
    // bounded); the corpus LM joins by token hash (vocab-sized, never
    // the corpus); the final frame is |sources| rows.
    "corpus_doremi" -> ((s, dir) => {
      val st = docs(s, dir)
        .select(col("source"), explode(expr(toksSpark)).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c_st"))
        .localCheckpoint() // feeds the corpus LM, the source LM, and the join
      val g = st.groupBy("tok").agg(sum(col("c_st")).as("c_t"))
      val tot = g.agg(sum(col("c_t")).as("ct"), count(lit(1)).as("v"))
      val glm = g.crossJoin(broadcast(tot))
        .select(col("tok"), expr("CAST(round(ln(CAST(c_t + 1 AS DOUBLE)" +
          " / CAST(ct + v AS DOUBLE)) * 1000000.0) AS BIGINT)").as("lnp_q"))
      val cs = st.groupBy("source").agg(sum(col("c_st")).as("c_s"))
      val ex = st.join(glm, "tok")
        .join(broadcast(cs), "source")
        .crossJoin(broadcast(tot))
        .withColumn("lnq_q", expr("CAST(round(ln(CAST(c_st + 1 AS DOUBLE)" +
          " / CAST(c_s + v AS DOUBLE)) * 1000000.0) AS BIGINT)"))
        .groupBy("source")
        .agg(max(col("c_s")).as("n_tokens"),
          sum(expr("CAST(c_st AS DECIMAL(38,0)) * lnp_q")).as("s1"),
          sum(expr("CAST(c_st AS DECIMAL(38,0)) * lnq_q")).as("s2"))
        .withColumn("kl_micro", expr("CAST(round(CAST(s2 - s1 AS DOUBLE)" +
          " / CAST(n_tokens AS DOUBLE)) AS BIGINT)"))
        .localCheckpoint()
      ex.crossJoin(broadcast(ex.agg(sum(col("kl_micro")).as("tkl"))))
        .select(col("source"), col("n_tokens"),
          Rounding.r6(expr("-CAST(s1 AS DOUBLE)" +
            " / CAST(n_tokens AS DOUBLE) / 1000000.0")).as("ce_corpus"),
          Rounding.r6(expr("-CAST(s2 AS DOUBLE)" +
            " / CAST(n_tokens AS DOUBLE) / 1000000.0")).as("ce_domain"),
          col("kl_micro"),
          // a one-source (or distribution-identical) corpus has zero
          // total excess: weight is undefined, NULL on both engines
          when(col("tkl") === 0, lit(null).cast("double"))
            .otherwise(Rounding.r6(expr(
              "CAST(kl_micro AS DOUBLE) / CAST(tkl AS DOUBLE)")))
            .as("weight"))
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

    "text_winnow" ->
      s"""WITH $docHashes,
         |wex AS (SELECT doc_id, len(sh)::BIGINT AS m,
         |    generate_subscripts(sh, 1)::BIGINT AS pos, unnest(sh) AS h
         |  FROM ds),
         |wky AS (SELECT doc_id, m, pos, h * 4294967296 + pos AS key
         |  FROM wex),
         |wmn AS (SELECT doc_id, m, pos, min(key) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
         |  FROM wky)
         |SELECT DISTINCT doc_id, mk % 4294967296 AS fp_pos,
         |  mk // 4294967296 AS fp_hash
         |FROM wmn WHERE pos <= greatest(1, m - 3)""".stripMargin,

    "corpus_js_sources" ->
      s"""WITH jdt AS (SELECT source, unnest($toksDuck) AS tok
         |  FROM documents),
         |jct AS (SELECT source, tok, count(*)::BIGINT AS c FROM jdt
         |  GROUP BY 1, 2),
         |jcn AS (SELECT *, (sum(c) OVER (PARTITION BY source))::BIGINT AS n
         |  FROM jct),
         |jpp AS (SELECT source, n,
         |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM jcn),
         |jps AS (SELECT source, max(n)::BIGINT AS n_toks,
         |    sum(CAST(round(p * ln(p) * 1000000000.0) AS BIGINT))::BIGINT
         |      AS sp,
         |    sum(CAST(round((p / 2.0) * ln(p / 2.0) * 1000000000.0)
         |      AS BIGINT))::BIGINT AS sp2
         |  FROM jpp GROUP BY 1),
         |jbt AS (SELECT x.source AS source_a, y.source AS source_b,
         |    CAST(x.c AS DOUBLE) / CAST(x.n AS DOUBLE) AS p,
         |    CAST(y.c AS DOUBLE) / CAST(y.n AS DOUBLE) AS q
         |  FROM jcn x JOIN jcn y
         |    ON x.tok = y.tok AND x.source < y.source),
         |jbs AS (SELECT source_a, source_b,
         |    sum(CAST(round((((p + q) / 2.0) * ln((p + q) / 2.0)
         |      - (p / 2.0) * ln(p / 2.0) - (q / 2.0) * ln(q / 2.0))
         |      * 1000000000.0) AS BIGINT))::BIGINT AS sboth
         |  FROM jbt GROUP BY 1, 2),
         |jpr AS (SELECT a.source AS source_a, b.source AS source_b,
         |    a.n_toks AS n_a, b.n_toks AS n_b, a.sp AS spa, a.sp2 AS sp2a,
         |    b.sp AS spb, b.sp2 AS sp2b
         |  FROM jps a JOIN jps b ON a.source < b.source),
         |jfn AS (SELECT source_a, source_b, n_a, n_b,
         |    (CAST(spa + spb AS DOUBLE) / 2.0
         |      - CAST(sp2a + sp2b + coalesce(jbs.sboth, 0) AS DOUBLE))
         |      / 1000000000.0 AS js
         |  FROM jpr LEFT JOIN jbs USING (source_a, source_b))
         |SELECT source_a, source_b, n_a, n_b,
         |  (round(js * 1000000.0) / 1000000.0 + 0.0) AS js,
         |  (round(js / ln(CAST(2.0 AS DOUBLE)) * 1000000.0) / 1000000.0
         |    + 0.0) AS js_norm
         |FROM jfn""".stripMargin,

    "dedup_winnow" ->
      s"""WITH $docHashes,
         |wex AS (SELECT doc_id, len(sh)::BIGINT AS m,
         |    generate_subscripts(sh, 1)::BIGINT AS pos, unnest(sh) AS h
         |  FROM ds),
         |wky AS (SELECT doc_id, m, pos, h * 4294967296 + pos AS key
         |  FROM wex),
         |wmn AS (SELECT doc_id, m, pos, min(key) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
         |  FROM wky),
         |wfp AS (SELECT DISTINCT doc_id, mk // 4294967296 AS fp_hash
         |  FROM wmn WHERE pos <= greatest(1, m - 3)),
         |wcap AS (SELECT doc_id, fp_hash FROM (SELECT *,
         |    count(*) OVER (PARTITION BY fp_hash) AS ndw FROM wfp)
         |  WHERE ndw <= $MaxBandBucket),
         |wpr AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |    count(*)::BIGINT AS n_shared
         |  FROM wcap x JOIN wcap y
         |    ON x.fp_hash = y.fp_hash AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |wsh AS (SELECT doc_id, list_distinct(sh) AS shd FROM ds),
         |wjx AS (SELECT p.a, p.b, p.n_shared,
         |    len(list_distinct(list_intersect(xa.shd, yb.shd)))::DOUBLE
         |      / len(list_distinct(list_concat(xa.shd, yb.shd)))::DOUBLE
         |      AS jac
         |  FROM wpr p JOIN wsh xa ON xa.doc_id = p.a
         |  JOIN wsh yb ON yb.doc_id = p.b)
         |SELECT a, b, n_shared,
         |  (round(jac * 1000000.0) / 1000000.0 + 0.0) AS jaccard,
         |  jac >= 0.5 AS is_dup
         |FROM wjx""".stripMargin,

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

    "corpus_burstiness" ->
      s"""WITH btk AS (SELECT doc_id::BIGINT AS doc_id,
         |    unnest($toksDuck) AS tok FROM documents),
         |bdt AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM btk
         |  GROUP BY 1, 2),
         |bnd AS (SELECT count(*)::BIGINT AS nd FROM documents),
         |bm AS (SELECT tok, sum(c)::BIGINT AS ct,
         |    sum(c::HUGEINT * c) AS c2, count(*)::BIGINT AS df
         |  FROM bdt GROUP BY 1)
         |SELECT tok, ct, df,
         |  (round((bnd.nd::HUGEINT * c2 - ct::HUGEINT * ct)::DOUBLE
         |    / (bnd.nd::DOUBLE * ct::DOUBLE) * 1000000.0)
         |   / 1000000.0 + 0.0) AS vmr
         |FROM bm CROSS JOIN bnd
         |ORDER BY ct DESC, tok LIMIT 200""".stripMargin,

    "corpus_doremi" ->
      s"""WITH tks AS (SELECT source, unnest($toksDuck) AS tok
         |  FROM documents),
         |st AS (SELECT source, tok, count(*)::BIGINT AS c_st FROM tks
         |  GROUP BY 1, 2),
         |g AS (SELECT tok, sum(c_st)::BIGINT AS c_t FROM st GROUP BY 1),
         |tot AS (SELECT sum(c_t)::BIGINT AS ct, count(*)::BIGINT AS v
         |  FROM g),
         |glm AS (SELECT tok, round(ln((c_t + 1)::DOUBLE
         |    / (ct + v)::DOUBLE) * 1000000.0)::BIGINT AS lnp_q
         |  FROM g CROSS JOIN tot),
         |cs AS (SELECT source, sum(c_st)::BIGINT AS c_s FROM st
         |  GROUP BY 1),
         |ex AS (SELECT st.source, max(cs.c_s)::BIGINT AS n_tokens,
         |    sum(st.c_st::HUGEINT * glm.lnp_q) AS s1,
         |    sum(st.c_st::HUGEINT * round(ln((st.c_st + 1)::DOUBLE
         |      / (cs.c_s + tot.v)::DOUBLE) * 1000000.0)::BIGINT) AS s2
         |  FROM st JOIN glm USING (tok) JOIN cs USING (source)
         |  CROSS JOIN tot GROUP BY 1),
         |ex2 AS (SELECT source, n_tokens, s1, s2,
         |    round((s2 - s1)::DOUBLE / n_tokens::DOUBLE)::BIGINT
         |      AS kl_micro FROM ex)
         |SELECT source, n_tokens,
         |  (round(-(s1::DOUBLE) / n_tokens::DOUBLE / 1000000.0, 6) + 0.0)
         |    AS ce_corpus,
         |  (round(-(s2::DOUBLE) / n_tokens::DOUBLE / 1000000.0, 6) + 0.0)
         |    AS ce_domain,
         |  kl_micro,
         |  CASE WHEN (SELECT sum(kl_micro) FROM ex2) = 0 THEN NULL
         |    ELSE (round(kl_micro::DOUBLE
         |      / (SELECT sum(kl_micro)::DOUBLE FROM ex2), 6) + 0.0)
         |  END AS weight
         |FROM ex2""".stripMargin,

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
