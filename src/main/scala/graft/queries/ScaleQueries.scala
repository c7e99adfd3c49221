package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.TextOps
import graft.functions.GraftFunctions

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

  /** Five-minute bars from the one-minute grid. */
  private val BarStep = 5L * EventBars.StepMicros

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
      val sg = segments(s, dir)
      val first = sg.groupBy("h")
        .agg(min(struct(col("doc_id"), col("seg_idx"))).as("m"))
      val kept = sg.join(first, "h")
        .filter(col("doc_id") === col("m.doc_id") &&
          col("seg_idx") === col("m.seg_idx"))
      val totals = sg.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
      val rebuilt = kept.groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(seg_idx, seg))), x -> x.seg)"))
          .as("clean_text"))
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"))
        .join(totals, Seq("doc_id"), "left")
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_segs"), lit(0L)).as("n_segs"),
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
      val posOf = (key: String) =>
        s"transform(sequence(0, ${BloomK - 1}), " +
          s"j -> (($key*(2*j + 1) + j*7919 + 1) % $P) % $BloomM)"
      val bloom = cust
        .select(explode(expr(posOf("c_custkey"))).as("pos"))
        .groupBy(expr("pos DIV 64").as("w"))
        .agg(bit_or(expr("CAST(1 AS BIGINT) << CAST(pos % 64 AS INT)")).as("b"))
        .agg(map_from_arrays(collect_list(col("w")), collect_list(col("b"))).as("m"))
        .select(expr(
          s"transform(sequence(0, ${BloomM / 64 - 1}), w -> coalesce(m[CAST(w AS BIGINT)], 0L))")
          .as("bits"))
      val pruned = t(s, dir, "orders")
        .crossJoin(broadcast(bloom))
        .filter(expr(
          s"forall(${posOf("o_custkey")}, " +
            "p -> (element_at(bits, CAST(p DIV 64 AS INT) + 1) >> CAST(p % 64 AS INT)) & 1 = 1)"))
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
