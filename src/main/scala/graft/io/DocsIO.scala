package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Document-corpus sources and sinks. JSONL (one JSON object per line,
  * usually gzip'd) is the de-facto interchange format for LLM training
  * corpora; parquet is the processing format. Both directions keep the
  * same explicit schema — schema inference over JSON is a full extra
  * pass at 100 TB and can silently widen types between shards, so it is
  * never used here.
  */
object DocsIO {

  /** The documents-table schema (matches the parquet fixture). */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL corpus with the explicit schema. `mode=FAILFAST`
    * surfaces malformed lines instead of nulling them — corrupt shards
    * should fail the job, not poison the corpus.
    */
  def readJsonl(spark: SparkSession, path: String,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(documents)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** Write a corpus as gzip'd JSONL partitioned by `source` — the
    * layout downstream samplers prune by (per-source quotas read only
    * their partitions).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .partitionBy("source")
      .json(path)
}
