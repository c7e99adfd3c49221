package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.TextOps
import graft.functions.GraftFunctions

/** Round-4 corpus-analytics additions: theta-sketch-style set
  * operations over KMV sketches (union / intersection / jaccard
  * estimates between event cohorts), SimHash hamming-distance near-dup
  * (the pigeonhole band join — the bounded-distance alternative to
  * MinHash LSH), and chi-square token-distribution drift between two
  * corpus halves (the DQ screen that catches a source mix shifting
  * between snapshots).
  *
  * Scale notes: sketch_theta shuffles only 8-byte hashes and collapses
  * to one row per cohort pair; dedup_hamming is an equi-join on (band,
  * value) buckets — never all-pairs; text_drift_chi2 reduces to one row
  * per vocabulary token before the (broadcast) totals join. All double
  * outputs are r4/r6-rounded; every formula is mirrored
  * token-for-token in [[CorpusQueries.oracles]].
  */
object CorpusQueries {

  import TextOps.P

  private def docsT(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** KMV sketch size (matches sketch_kmv). */
  private val K = 64

  /** SimHash width and band split for dedup_hamming: word hashes live
    * below 2^30, so 30 of the 32 signature bits carry votes; 4 bands of
    * 8 bits make a hamming-3 match share ≥ 1 exact band (pigeonhole).
    */
  private val HamBits = 32
  private val HamBands = 4
  private val HamMax = 3L

  private val r4 = Rounding.r4 _
  private val r6 = Rounding.r6 _

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Theta-sketch-style set operations between every pair of event
    // cohorts (the user sets of two event types): exact |A∪B| and
    // |A∩B| beside the KMV estimates — est_union from the k-th union
    // hash, ρ = sketch-intersection fraction, est_inter = ρ·est_union.
    // Everything after the per-type distinct is 8-byte hashes; the
    // type pairs and per-type k-th values broadcast.
    "sketch_theta" -> ((s, dir) => {
      val h = s"((user_id % ${P}L) * 2654435761L) % ${P}L"
      val hashes = EventBars.events(s, dir)
        .select(col("event_type"), expr(h).as("h")).distinct()
      val types = hashes.select("event_type").distinct()
      val pairs = types.select(col("event_type").as("ea")).as("ta")
        .join(types.select(col("event_type").as("eb")).as("tb"),
          col("ea") < col("eb"))
      // Per-type and per-pair-union k-th hashes via the two-phase KMin
      // (per-partition k-minima → ≤ k·P-row window) — no whole-group
      // sort anywhere. Hashes are distinct within a type and within a
      // pair union, so `rank ≤ K` ⟺ `h ≤ h_(K)` exactly.
      val kth = KMin.kth(hashes, Seq("event_type"), "h", K, "hk")
      val ha = broadcast(pairs).join(hashes,
        col("event_type") === col("ea")).select("ea", "eb", "h")
      val hb = broadcast(pairs).join(hashes,
        col("event_type") === col("eb")).select("ea", "eb", "h")
      val m = ha.withColumn("ia", lit(1L))
        .join(hb.withColumn("ib", lit(1L)), Seq("ea", "eb", "h"), "full_outer")
        .select(col("ea"), col("eb"), col("h"),
          coalesce(col("ia"), lit(0L)).as("ia"),
          coalesce(col("ib"), lit(0L)).as("ib"))
        .localCheckpoint()
      val hku = KMin.kth(m, Seq("ea", "eb"), "h", K, "hku")
      val inK = col("h") <= coalesce(col("hku"), lit(P))
      m.join(broadcast(hku), Seq("ea", "eb"), "left")
        .join(broadcast(kth.select(col("event_type").as("ea"),
          col("hk").as("hka"))), Seq("ea"), "left")
        .join(broadcast(kth.select(col("event_type").as("eb"),
          col("hk").as("hkb"))), Seq("eb"), "left")
        .groupBy("ea", "eb")
        .agg(count(lit(1)).as("n_union"),
          sum(col("ia") * col("ib")).as("n_inter"),
          max(col("hku")).as("hku"),
          sum(when(inK, 1L).otherwise(0L)).as("mm"),
          sum(when(inK && col("ia") === 1 && col("ib") === 1
            && col("h") <= coalesce(col("hka"), lit(P))
            && col("h") <= coalesce(col("hkb"), lit(P)), 1L).otherwise(0L))
            .as("rho"))
        .select(col("ea"), col("eb"), col("n_union"), col("n_inter"),
          r4(when(col("hku").isNotNull,
            lit((K - 1).toDouble) * lit(P.toDouble) / col("hku").cast("double"))
            .otherwise(col("n_union").cast("double"))).as("est_union"),
          r4(col("rho").cast("double") / col("mm").cast("double"))
            .as("est_jaccard"),
          r4(col("rho").cast("double") / col("mm").cast("double")
            * when(col("hku").isNotNull,
              lit((K - 1).toDouble) * lit(P.toDouble) / col("hku").cast("double"))
              .otherwise(col("n_union").cast("double"))).as("est_inter"))
    }),

    // Deterministic fixed-n-per-source sample — the "n docs from every
    // stratum" training-data op, reproducible on any engine (hash
    // order, no RNG state). Rides KMin.smallest: per-partition top-100
    // prune, then the rank window sees ≤ 100·P candidate rows per
    // source — never a whole-source sort. doc_id < P (prime) makes the
    // multiplicative hash injective, so ranks are tie-free.
    "corpus_sample_fixed" -> ((s, dir) => {
      val d = docsT(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"))
        .withColumn("h", expr(s"((doc_id % ${P}L) * 2654435761L) % ${P}L"))
      // doc_id tie-break: keeps the draw deterministic even when ids
      // exceed P and the injective-hash assumption breaks.
      KMin.smallestBy(d, Seq("source"), Seq("h", "doc_id"), 100, "rk")
        .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
    }),

    // SimHash near-dup with a hamming-distance bound: 32-bit signature,
    // 4 bands of 8 bits — any pair within hamming 3 agrees exactly on
    // ≥ 1 band (pigeonhole), so the candidate join is an equi-join on
    // (band, value) buckets, and the exact bit_count(xor) check runs
    // per candidate only. The bounded-distance complement to the
    // jaccard-threshold MinHash LSH path.
    //
    // The signature table (doc_id, sig — 16 bytes/doc) materializes
    // ONCE before the self-join: without the checkpoint each join side
    // re-runs the tokenize→hash→simhash pipeline over the full corpus
    // (2× the dominant cost; the [[graft.ext.PageRank]] edge-list
    // treatment). The broadcast is SIZE-GATED on the checkpointed doc
    // count (free — the checkpoint is already materialized): under
    // [[HamBroadcastMaxDocs]] the banded side ships to every executor;
    // above it the same plan falls back to a shuffle-hash equi-join on
    // the (band, value) bucket key — both sides exchange 28-byte
    // bucket rows, never text, so the fallback survives any corpus.
    "dedup_hamming" -> ((s, dir) => dedupHamming(s, dir)),

    // Chi-square token-frequency drift between the even- and
    // odd-numbered source halves: per-token 2×2 occurrence test against
    // the half totals — the full drift report (every token with ≥ 20
    // occurrences, with its chi²), which a DQ screen then thresholds.
    // Counts are exact longs, so the chi² doubles are bit-identical on
    // both engines; tokens shuffle as 8-byte hashes and collapse to one
    // row each before the broadcast totals join.
    "text_drift_chi2" -> ((s, dir) => {
      val ex = docsT(s, dir)
        .withColumn("grp", expr("CAST(substring(source, 4) AS INT) % 2"))
        .withColumn("toks", expr(TextOps.toksSpark))
        .withColumn("wh", expr(TextOps.wordHashesSpark("toks")))
        .select(col("grp"), explode(col("wh")).as("h"))
      val counts = ex.groupBy("grp", "h").agg(count(lit(1)).as("n"))
      val tot = counts.groupBy(lit(1).as("_one"))
        .agg(sum(when(col("grp") === 0, col("n"))).as("ta"),
          sum(when(col("grp") === 1, col("n"))).as("tb"))
        .drop("_one")
      counts.groupBy("h")
        .agg(sum(when(col("grp") === 0, col("n")).otherwise(0L)).as("na"),
          sum(when(col("grp") === 1, col("n")).otherwise(0L)).as("nb"))
        .filter(col("na") + col("nb") >= 20)
        .crossJoin(broadcast(tot))
        .filter(col("ta") > 0 && col("tb") > 0)
        .withColumn("ea", (col("na") + col("nb")).cast("double")
          * col("ta").cast("double")
          / (col("ta") + col("tb")).cast("double"))
        .withColumn("eb", (col("na") + col("nb")).cast("double")
          * col("tb").cast("double")
          / (col("ta") + col("tb")).cast("double"))
        .withColumn("chi2",
          (col("na").cast("double") - col("ea"))
            * (col("na").cast("double") - col("ea")) / col("ea")
          + (col("nb").cast("double") - col("eb"))
            * (col("nb").cast("double") - col("eb")) / col("eb"))
        .select(col("h"), col("na"), col("nb"), r6(col("chi2")).as("chi2"))
    }))

  /** DuckDB CTE chain computing the 32-bit simhash per doc; exposes
    * `sg(doc_id, sig)` — the dedup_simhash oracle's vote rule at
    * [[HamBits]] width. */
  /** Banded side fits one executor comfortably below this: 4 bands ×
    * ~28 B/row ≈ 112 MB at the cap. Above it, broadcast would OOM the
    * executors long before 100 TB — the gate swaps in a shuffle-hash
    * join on the same (band, value) equi-keys. */
  private[graft] val HamBroadcastMaxDocs = 1000000L

  /** `dedup_hamming` body; `broadcastMaxDocs` is exposed so PlanSpec
    * can pin BOTH plan shapes on the same small fixture. */
  private[graft] def dedupHamming(s: SparkSession, dir: String,
      broadcastMaxDocs: Long = HamBroadcastMaxDocs): DataFrame = {
    GraftFunctions.register(s)
    val sg = docsT(s, dir)
      .withColumn("toks", expr(TextOps.toksSpark))
      .withColumn("wh", expr(TextOps.wordHashesSpark("toks")))
      .filter(expr("size(wh) > 0"))
      .select(col("doc_id").cast("long").as("doc_id"),
        expr(s"graft_simhash(wh, $HamBits)").as("sig"))
      .localCheckpoint()
    val banded = sg
      .select(col("doc_id"), col("sig"),
        explode(expr(s"sequence(0, ${HamBands - 1})")).as("j"))
      .withColumn("bv", expr("shiftright(sig, j * 8) & 255"))
    // A pair matching on k bands would surface k times; instead of a
    // distinct() (a full extra shuffle of every candidate row), each
    // pair is emitted ONLY from its lowest matching band — the match
    // mask is four integer compares on the sigs already in hand.
    val firstBandOnly =
      (0 until HamBands).map(b =>
        s"IF((shiftright(x.sig, ${b * 8}) & 255) = " +
          s"(shiftright(y.sig, ${b * 8}) & 255), ${1 << b}, 0)")
        .mkString("((", " + ", ") & (shiftleft(1, CAST(x.j AS INT)) - 1)) = 0")
    val cond = col("x.j") === col("y.j") && col("x.bv") === col("y.bv") &&
      col("x.doc_id") < col("y.doc_id")
    val joined =
      if (sg.count() <= broadcastMaxDocs)
        banded.as("x").join(broadcast(banded.as("y")), cond)
      else
        banded.as("x").join(banded.as("y").hint("shuffle_hash"), cond)
    joined
      .filter(expr(firstBandOnly))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("CAST(bit_count(x.sig ^ y.sig) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= HamMax)
  }

  private val sigDuck: String = {
    val whD = TextOps.wordHashesDuck(TextOps.toksDuck)
    val sums = (0 until HamBits).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n  ")
    val packs = (0 until HamBits).map(b =>
      s"(CASE WHEN s$b >= 0 THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""dh0 AS (SELECT doc_id::BIGINT AS doc_id, $whD AS wh FROM documents),
       |dh AS (SELECT * FROM dh0 WHERE len(wh) > 0),
       |hx AS (SELECT doc_id, unnest(wh) AS h FROM dh),
       |sm AS (SELECT doc_id,
       |  $sums
       |  FROM hx GROUP BY doc_id),
       |sg AS (SELECT doc_id, ($packs) AS sig FROM sm)""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "sketch_theta" ->
      s"""WITH hashes AS (
         |  SELECT DISTINCT event_type, ((user_id % $P) * 2654435761) % $P AS h
         |  FROM events),
         |types AS (SELECT DISTINCT event_type FROM hashes),
         |pairs AS (SELECT a.event_type AS ea, b.event_type AS eb
         |  FROM types a JOIN types b ON a.event_type < b.event_type),
         |kth AS (SELECT event_type, h AS hk FROM (
         |    SELECT event_type, h, row_number() OVER (
         |      PARTITION BY event_type ORDER BY h) AS rn FROM hashes) z
         |  WHERE rn = $K),
         |ha AS (SELECT p.ea, p.eb, s.h FROM pairs p
         |  JOIN hashes s ON s.event_type = p.ea),
         |hb AS (SELECT p.ea, p.eb, s.h FROM pairs p
         |  JOIN hashes s ON s.event_type = p.eb),
         |m0 AS (SELECT coalesce(a.ea, b.ea) AS ea, coalesce(a.eb, b.eb) AS eb,
         |    coalesce(a.h, b.h) AS h,
         |    CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS ia,
         |    CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS ib
         |  FROM ha a FULL OUTER JOIN hb b
         |    ON a.ea = b.ea AND a.eb = b.eb AND a.h = b.h),
         |m1 AS (SELECT *, row_number() OVER (
         |    PARTITION BY ea, eb ORDER BY h) AS rn FROM m0),
         |m AS (SELECT m1.*, ka.hk AS hka, kb.hk AS hkb FROM m1
         |  LEFT JOIN kth ka ON ka.event_type = m1.ea
         |  LEFT JOIN kth kb ON kb.event_type = m1.eb),
         |g AS (SELECT ea, eb,
         |    count(*)::BIGINT AS n_union,
         |    sum(ia * ib)::BIGINT AS n_inter,
         |    max(CASE WHEN rn = $K THEN h END) AS hku,
         |    sum(CASE WHEN rn <= $K THEN 1 ELSE 0 END)::BIGINT AS mm,
         |    sum(CASE WHEN rn <= $K AND ia = 1 AND ib = 1
         |      AND h <= coalesce(hka, $P) AND h <= coalesce(hkb, $P)
         |      THEN 1 ELSE 0 END)::BIGINT AS rho
         |  FROM m GROUP BY ea, eb)
         |SELECT ea, eb, n_union, n_inter,
         |  (round(CASE WHEN hku IS NOT NULL
         |     THEN ${(K - 1).toDouble} * ${P}.0 / hku::DOUBLE
         |     ELSE n_union::DOUBLE END, 4) + 0.0) AS est_union,
         |  (round(rho::DOUBLE / mm::DOUBLE, 4) + 0.0) AS est_jaccard,
         |  (round(rho::DOUBLE / mm::DOUBLE * (CASE WHEN hku IS NOT NULL
         |     THEN ${(K - 1).toDouble} * ${P}.0 / hku::DOUBLE
         |     ELSE n_union::DOUBLE END), 4) + 0.0) AS est_inter
         |FROM g""".stripMargin,

    "corpus_sample_fixed" ->
      s"""WITH d AS (SELECT doc_id::BIGINT AS doc_id, source,
         |    ((doc_id::BIGINT % $P) * 2654435761) % $P AS h FROM documents),
         |r AS (SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk FROM d)
         |SELECT source, doc_id, rk::BIGINT AS rk FROM r
         |WHERE rk <= 100""".stripMargin,

    "dedup_hamming" -> {
      val maskDuck = (0 until HamBands).map(b =>
        s"(CASE WHEN ((x.sig >> ${b * 8}) & 255) = ((y.sig >> ${b * 8}) & 255)" +
          s" THEN ${1 << b} ELSE 0 END)").mkString(" + ")
      s"""WITH $sigDuck,
         |bd AS (SELECT doc_id, sig, j, (sig >> (j * 8)) & 255 AS bv
         |  FROM sg CROSS JOIN (SELECT unnest(generate_series(0, ${HamBands - 1})) AS j) js)
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  bit_count(xor(x.sig, y.sig))::BIGINT AS hamming
         |FROM bd x JOIN bd y ON x.j = y.j AND x.bv = y.bv
         |  AND x.doc_id < y.doc_id
         |WHERE (($maskDuck) & ((1 << x.j) - 1)) = 0
         |  AND bit_count(xor(x.sig, y.sig)) <= $HamMax""".stripMargin
    },

    "text_drift_chi2" -> {
      val whD = TextOps.wordHashesDuck(TextOps.toksDuck)
      s"""WITH ex AS (
         |  SELECT CAST(substr(source, 4) AS INT) % 2 AS grp, unnest(wh) AS h
         |  FROM (SELECT source, $whD AS wh FROM documents) z),
         |counts AS (SELECT grp, h, count(*)::BIGINT AS n FROM ex GROUP BY 1, 2),
         |tot AS (SELECT
         |    sum(CASE WHEN grp = 0 THEN n END)::BIGINT AS ta,
         |    sum(CASE WHEN grp = 1 THEN n END)::BIGINT AS tb
         |  FROM counts),
         |bytok AS (SELECT h,
         |    sum(CASE WHEN grp = 0 THEN n ELSE 0 END)::BIGINT AS na,
         |    sum(CASE WHEN grp = 1 THEN n ELSE 0 END)::BIGINT AS nb
         |  FROM counts GROUP BY h),
         |j AS (SELECT * FROM bytok CROSS JOIN tot
         |  WHERE na + nb >= 20 AND ta > 0 AND tb > 0),
         |e AS (SELECT *,
         |    (na + nb)::DOUBLE * ta::DOUBLE / (ta + tb)::DOUBLE AS ea,
         |    (na + nb)::DOUBLE * tb::DOUBLE / (ta + tb)::DOUBLE AS eb
         |  FROM j),
         |c AS (SELECT *,
         |    (na::DOUBLE - ea) * (na::DOUBLE - ea) / ea
         |      + (nb::DOUBLE - eb) * (nb::DOUBLE - eb) / eb AS chi2
         |  FROM e)
         |SELECT h, na, nb, (round(chi2, 6) + 0.0) AS chi2
         |FROM c""".stripMargin
    })
}
