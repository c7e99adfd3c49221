package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, ConnectedComponents, Multimodal, TextOps}
import graft.functions.GraftFunctions

import TextOps._
import ExtCommon._

/** Multimodal + as-of alignment family (SURVEY.md §7.4; split out of
  * ExtQueries r11): binary-column decode/resize/frame-sample/audio-RMS
  * plumbing over [[graft.ext.Multimodal]], banded pHash near-dup, scene
  * cuts — plus the as-of joins that align modality streams by time. */
object MmQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Audio SILENCE segmentation: the multimodal face of the F1
    // gaps-and-islands pattern (etl/Sessionize) -- a 64-sample frame
    // is "quiet" when its mean square energy falls strictly below the
    // doc's own (exact integer cross-multiply: energy*tot_n <
    // tot_e*n -- no double threshold crosses an engine); consecutive
    // quiet frames (run length >= 2) collapse to segments via the
    // frame_idx - row_number island key, renumbered per doc. Frames
    // never leave their doc partition; the per-doc totals join is
    // doc_id-keyed.
    "mm_silence" -> ((s, dir) => {
      val fr = Multimodal.audioRms(Multimodal.mediaTable(docs(s, dir)), 64)
        .localCheckpoint() // feeds totals and the quiet filter
      val tot = fr.groupBy("doc_id")
        .agg(sum(col("energy")).as("te"), sum(col("n_samples")).as("tn"))
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      val wd = Window.partitionBy("doc_id").orderBy("start_frame")
      fr.join(tot, "doc_id")
        .filter(expr("energy * tn < te * n_samples"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("isl", col("frame_idx") - col("rn"))
        .groupBy("doc_id", "isl")
        .agg(min(col("frame_idx")).as("start_frame"),
          max(col("frame_idx")).as("end_frame"),
          count(lit(1)).as("n_frames"))
        .filter(col("n_frames") >= 2)
        .withColumn("seg_id", row_number().over(wd).cast("long"))
        .select(col("doc_id"), col("seg_id"), col("start_frame"),
          col("end_frame"), col("n_frames"))
    }),

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
    }))

  val oracles: Map[String, String] = Map(

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

    "mm_silence" ->
      """WITH d AS (SELECT doc_id::BIGINT AS doc_id, text,
        |    octet_length(coalesce(text, '')::BLOB) AS n FROM documents),
        |p AS (SELECT doc_id, text, n,
        |    unnest(generate_series(1, n)) AS pos FROM d),
        |b AS (SELECT doc_id, (pos - 1) // 64 AS frame_idx,
        |    unicode(substr(text, pos::INT, 1))::BIGINT AS v FROM p),
        |g AS (SELECT doc_id, frame_idx::BIGINT AS frame_idx,
        |    count(*)::BIGINT AS n_samples, sum(v * v)::BIGINT AS energy
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT doc_id, sum(energy)::BIGINT AS te,
        |    sum(n_samples)::BIGINT AS tn FROM g GROUP BY 1),
        |q AS (SELECT g.doc_id, g.frame_idx FROM g JOIN t USING (doc_id)
        |  WHERE g.energy * t.tn < t.te * g.n_samples),
        |i AS (SELECT doc_id, frame_idx,
        |    frame_idx - row_number() OVER (PARTITION BY doc_id
        |      ORDER BY frame_idx) AS isl FROM q),
        |seg AS (SELECT doc_id, isl, min(frame_idx)::BIGINT AS start_frame,
        |    max(frame_idx)::BIGINT AS end_frame,
        |    count(*)::BIGINT AS n_frames
        |  FROM i GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT doc_id, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY start_frame)::BIGINT AS seg_id,
        |  start_frame, end_frame, n_frames
        |FROM seg""".stripMargin,

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
        |FROM c GROUP BY 1""".stripMargin)
}
