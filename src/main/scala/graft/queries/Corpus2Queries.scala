package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.functions.GraftFunctions

/** Corpus-curation operators, batch 2: bloom-filter decontamination,
  * sequence-length bucketing, and a deterministic quality-score keep
  * gate (builder prompt "training-data pipeline" surface; extends
  * ExtQueries' text_decontaminate / text_pack / corpus_gopher family).
  *
  * Scale notes (100 TB design point):
  *  - the bloom position set is built from the SMALL held-out side and
  *    broadcast — the corpus side computes positions in-row and probes
  *    the broadcast; its shingles never shuffle;
  *  - length bucketing is a scan-local projection plus a ≤64-group agg;
  *  - quality scoring is a pure per-row projection feeding a per-source
  *    count agg — exact integer features, fixed-order double math, no
  *    libm calls (exp/log round differently across engines).
  */
object Corpus2Queries {

  import TextOps._
  import Rounding.r6

  /** Bloom bit-array size (2^20) and hash count. */
  private val M = 1048576L
  private val K = 3

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  // Spark-side shingle fragments (mirrors ExtQueries' private whS/shS).
  private val whS = whNativeSpark
  private val shS = shNativeSpark

  /** Stoplist for the quality gate — the corpus' structural filler
    * tokens: the ONE definition in TextOps.LangMarkers (duplicating
    * the four literals here would silently desynchronize this gate
    * from the langid family on any edit). */
  private[queries] val Stop: Seq[String] =
    LangMarkers.find(_._1 == "determiner").get._2

  private[queries] val ntS = s"CAST(size($toksSpark) AS BIGINT)"
  private[queries] val ntD = s"len($toksDuck)::BIGINT"
  // BIGINT accumulator on BOTH engines: an INT seed would make Spark's
  // fold wrap at 2^31 chars of token mass while DuckDB stays exact —
  // the outer cast cannot repair a wrapped sum.
  private[queries] val ncS = "CAST(aggregate(" + toksSpark +
    ", CAST(0 AS BIGINT), (acc, t) -> acc + length(t)) AS BIGINT)"
  private[queries] val ncD =
    s"list_reduce(list_prepend(0::BIGINT, list_transform($toksDuck, " +
      "t -> length(t)::BIGINT)), (a, b) -> a + b)"

  /** Bloom double-hash position j of shingle hash g — the single
    * point of truth for BOTH engines and both sides (filter build +
    * probe). g < 1e9+7 and 2j+1 ≤ 5, so g·(2j+1) < 2^33: no overflow
    * on either engine. (Same permutation family as TextOps' minhash,
    * reduced mod the bit-array size instead of P.) */
  private def bloomPos(g: String, j: String): String =
    s"($g * (2*$j + 1) + $j*7919 + 1) % $M"

  /** Fixed-order quality logit over exact integer features — identical
    * expression tree on both engines, division/abs only (IEEE-exact). */
  private[queries] def logitSql(nt: String, nc: String, nstop: String): String =
    s"CASE WHEN $nt = 0 THEN -1.0 ELSE " +
      s"2.0 * (CAST($nstop AS DOUBLE) / CAST($nt AS DOUBLE)) " +
      s"- 0.25 * abs(CAST($nc AS DOUBLE) / CAST($nt AS DOUBLE) - 5.0) " +
      s"+ (CASE WHEN $nt BETWEEN 50 AND 1000 THEN 0.5 ELSE -0.5 END) END"
  private[queries] def logitDuck(nt: String, nc: String, nstop: String): String =
    s"CASE WHEN $nt = 0 THEN -1.0 ELSE " +
      s"2.0 * ($nstop::DOUBLE / $nt::DOUBLE) " +
      s"- 0.25 * abs($nc::DOUBLE / $nt::DOUBLE - 5.0) " +
      s"+ (CASE WHEN $nt BETWEEN 50 AND 1000 THEN 0.5 ELSE -0.5 END) END"

  /** Smallest power of two ≥ nt (nt ≤ 1 → 1) in pure integer
    * arithmetic: floor(log2) comes from the binary-string length, so no
    * libm log2 (whose ulps differ across engines at exact powers). */
  private val bucketS =
    "CASE WHEN nt <= 1 THEN CAST(1 AS BIGINT) " +
      "WHEN (nt & (nt - 1)) = 0 THEN nt " +
      "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(nt))) END"
  private val bucketD =
    "CASE WHEN nt <= 1 THEN 1::BIGINT " +
      "WHEN (nt & (nt - 1)) = 0 THEN nt " +
      "ELSE (1::BIGINT << length(bin(nt))) END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-filter benchmark decontamination: the held-out set's
    // shingles (doc_id % 50 == 0, as in text_decontaminate) are folded
    // into a 2^20-bit bloom filter via K=3 integer double-hashes; a
    // training doc is flagged for every distinct shingle whose K
    // positions are ALL set. The filter is represented as its distinct
    // set-bit positions (≤ K·|bench shingles| rows, broadcast) — the
    // corpus side computes its positions in-row and probes, so at
    // 100 TB the big side never shuffles text or shingles. n_exact
    // (true n-gram overlap) rides along, so the report also exhibits
    // the bloom false-positive count (n_bloom - n_exact).
    "text_bloom_contam" -> ((s, dir) => {
      val sh = docs(s, dir)
        .withColumn("wh", expr(whS))
        .withColumn("sh", expr(shS))
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("array_distinct(sh)").as("shd"))
        .localCheckpoint()
      val benchG = sh.filter(col("doc_id") % 50 === 0)
        .select(explode(col("shd")).as("g")).distinct()
      val bpos = benchG
        .select(explode(expr("sequence(0, " + (K - 1) + ")")).as("j"),
          col("g"))
        .select(expr(bloomPos("g", "j")).as("pos"))
        .distinct()
      val train = sh.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), explode(col("shd")).as("g"))
      val hit = train
        .select(col("doc_id"), col("g"),
          explode(expr("sequence(0, " + (K - 1) + ")")).as("j"))
        .withColumn("pos", expr(bloomPos("g", "j")))
        .join(broadcast(bpos), Seq("pos"))
        .groupBy("doc_id", "g").agg(countDistinct(col("j")).as("nj"))
        .filter(col("nj") === K)
      hit.join(broadcast(benchG.withColumn("ex", lit(1))), Seq("g"), "left")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_bloom"),
          sum(when(col("ex").isNotNull, 1L).otherwise(0L)).as("n_exact"))
    }),

    // Sequence-length bucketing for batch packing: each doc lands in
    // the smallest power-of-two token bucket; per bucket the report
    // carries doc/token mass and the padding waste of padding every
    // doc to the bucket size — the table a batching scheduler reads.
    // Scan-local projection + ≤64-group aggregate; no wide shuffle.
    "corpus_length_buckets" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(ntS).as("nt"))
        .withColumn("bucket", expr(bucketS))
        .groupBy("bucket").agg(
          count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"),
          sum(expr("bucket - nt")).as("pad_tokens"))
        .select(col("bucket"), col("n_docs"), col("n_tokens"),
          col("pad_tokens"),
          r6(col("pad_tokens").cast("double")
            / (col("bucket") * col("n_docs")).cast("double"))
            .as("pad_ratio"))),

    // Deterministic quality-score keep gate: exact integer features
    // (token count, char mass, stopword hits) → fixed-order double
    // logit (no exp/log — libm rounds differently per engine) → keep
    // iff logit > 0; per-source keep rates. The per-row score is the
    // quality-classifier stand-in; the per-source rate table is what a
    // curation run reports.
    "corpus_quality_logit" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"),
          expr(ntS).as("nt"), expr(ncS).as("nc"),
          expr(s"CAST(${langScoreSpark(toksSpark, Stop)} AS BIGINT)")
            .as("nstop"))
        .withColumn("z", expr(logitSql("nt", "nc", "nstop")))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("z") > 0.0, 1L).otherwise(0L)).as("n_keep"))
        .select(col("source"), col("n_docs"), col("n_keep"),
          r6(col("n_keep").cast("double") / col("n_docs").cast("double"))
            .as("keep_rate"))))

  private val docToks =
    s"dt AS (SELECT doc_id::BIGINT AS doc_id, text, source, " +
      s"$toksDuck AS toks FROM documents)"

  private val whD = wordHashesDuck(toksDuck)
  private val shD = shinglesDuck("wh")

  val oracles: Map[String, String] = Map(

    "text_bloom_contam" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, text FROM documents),
         |dh AS (SELECT *, $whD AS wh FROM dt),
         |ds AS (SELECT *, $shD AS sh FROM dh),
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM ds),
         |bg AS (SELECT DISTINCT unnest(shd) AS g FROM shd WHERE doc_id % 50 = 0),
         |js AS (SELECT unnest(generate_series(0, ${K - 1})) AS j),
         |bpos AS (SELECT DISTINCT ${bloomPos("g", "j")} AS pos
         |  FROM bg CROSS JOIN js),
         |tg AS (SELECT doc_id, unnest(shd) AS g FROM shd WHERE doc_id % 50 <> 0),
         |tp AS (SELECT doc_id, g, j, ${bloomPos("g", "j")} AS pos
         |  FROM tg CROSS JOIN js),
         |hit AS (SELECT doc_id, g FROM tp JOIN bpos USING (pos)
         |  GROUP BY doc_id, g HAVING count(DISTINCT j) = $K)
         |SELECT h.doc_id, count(*)::BIGINT AS n_bloom,
         |  sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_exact
         |FROM hit h LEFT JOIN bg ON h.g = bg.g
         |GROUP BY h.doc_id""".stripMargin,

    "corpus_length_buckets" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, $ntD AS nt FROM documents),
         |b AS (SELECT *, $bucketD AS bucket FROM dt)
         |SELECT bucket, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
         |  sum(bucket - nt)::BIGINT AS pad_tokens,
         |  (round(sum(bucket - nt)::DOUBLE
         |    / (bucket * count(*))::DOUBLE, 6) + 0.0) AS pad_ratio
         |FROM b GROUP BY bucket""".stripMargin,

    "corpus_quality_logit" ->
      s"""WITH $docToks,
         |f AS (SELECT source, $ntD AS nt, $ncD AS nc,
         |    ${langScoreDuck("toks", Stop)}::BIGINT AS nstop FROM dt),
         |z AS (SELECT source, ${logitDuck("nt", "nc", "nstop")} AS z FROM f)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN z > 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_keep,
         |  (round(sum(CASE WHEN z > 0.0 THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS keep_rate
         |FROM z GROUP BY source""".stripMargin)
}
