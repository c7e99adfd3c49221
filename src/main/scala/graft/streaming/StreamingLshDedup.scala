package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.ExtCommon

/** Streaming MinHash-LSH near-dup detection against a STATIC corpus
  * band index — the streaming twin of the batch `dedup_incremental`
  * (and of the reference's per-day incremental Airflow runs,
  * airflow_dag.py:22-26): documents arrive on a stream, hash to band
  * keys with the SAME per-row codegen'd pipeline the batch family
  * uses, and probe the persisted corpus index via TWO stream-static
  * equi-joins (band key, then signature by id).
  *
  * Scale shape: the hash pipeline is stateless projections; the only
  * streaming STATE is the pair-dedup keyed by (doc_id, corpus_id),
  * bounded by the watermark horizon (`dropDuplicatesWithinWatermark`
  * — a plain dropDuplicates would grow forever at a 100 TB/day
  * ingest). The static sides are the index a daily batch job
  * maintains: bucket-capped (bk, corpus_id) band rows and the
  * (corpus_id, shd) signature table — broadcast or storage-partitioned
  * at the planner's choice, never per-micro-batch recomputed work when
  * persisted. Jaccard verification is exact, per candidate, on the
  * stream side — a short-lived row, never state.
  */
object StreamingLshDedup {

  /** Build the static index from an at-rest corpus (doc_id, text):
    * (bandIndex(bk, corpus_id), sigs(corpus_id, shc)). The bucket cap
    * is applied HERE, over the whole corpus — the one window in the
    * family runs at index-build time, not on the stream. */
  def buildIndex(corpus: DataFrame): (DataFrame, DataFrame) = {
    val s = ExtCommon.lshDocSigs(
      corpus.select(col("doc_id").cast("long").as("corpus_id"),
        col("text")))
      .localCheckpoint()
    val banded = s.select(col("corpus_id"), explode(col("bks")).as("bk"))
      .withColumn("_bn", expr("count(1) OVER (PARTITION BY bk)"))
      .filter(col("_bn") <= ExtCommon.maxBandBucket)
      .drop("_bn")
      .localCheckpoint()
    (banded, s.select(col("corpus_id"), col("shd").as("shc")))
  }

  /** stream (eventTimeCol, doc_id, text) → one row per (arriving doc,
    * matched corpus doc) with jaccard ≥ tau, deduped across band
    * collisions and across micro-batches within the watermark
    * horizon. */
  def apply(stream: DataFrame, bandIndex: DataFrame, sigs: DataFrame,
      eventTimeCol: String = "ts", horizon: String = "10 minutes",
      tau: Double = 0.8): DataFrame =
    ExtCommon.lshDocSigs(
        stream.select(col(eventTimeCol),
          col("doc_id").cast("long").as("doc_id"), col("text")))
      .select(col(eventTimeCol), col("doc_id"), col("shd").as("shq"),
        explode(col("bks")).as("bk"))
      .join(bandIndex, Seq("bk"))
      .filter(col("doc_id") =!= col("corpus_id"))
      .join(sigs, Seq("corpus_id"))
      .withColumn("jaccard", expr(
        "CAST(size(array_intersect(shq, shc)) AS DOUBLE)" +
          " / CAST(size(array_union(shq, shc)) AS DOUBLE)"))
      .filter(col("jaccard") >= lit(tau))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
      .select(col(eventTimeCol), col("doc_id"), col("corpus_id"),
        graft.queries.Rounding.r6(col("jaccard")).as("jaccard"))
}
