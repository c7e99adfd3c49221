package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the incremental face of the batch
  * `dedup_exact` / `dedup_keep` family: drop any row whose key (e.g.
  * a document content hash) was already seen within the watermark
  * horizon.
  *
  * `dropDuplicatesWithinWatermark` keeps ONE state row per key and
  * evicts it once the watermark passes the horizon — a plain
  * `dropDuplicates` on a stream retains every key forever, which is
  * unbounded state at a 100 TB/day ingest. State is therefore bounded
  * by arrival-rate × horizon, and the key shuffles once — exactly the
  * batch hash-groupBy exchange, made incremental. Exactness holds
  * within the horizon; re-admittance after eviction is the documented
  * trade (run the batch dedup over the at-rest corpus for the global
  * guarantee).
  */
object StreamingDedup {

  def apply(docs: DataFrame, eventTimeCol: String, horizon: String,
      keyCols: Seq[String]): DataFrame =
    docs.withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)
}
