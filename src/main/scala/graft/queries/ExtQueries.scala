package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extended LLM-data-pipeline operators (builder prompt; SURVEY.md §7.4)
  * — facade over the four family modules this object was split into in
  * r11 (DedupQueries, SimQueries, MmQueries, TextCurationQueries; the
  * shared helpers live in [[ExtCommon]]).
  *
  * Scale design (100 TB north star):
  *  - text ops are per-row codegen'd HOF projections (no shuffle);
  *  - dedup groupBys shuffle short hashes, not documents;
  *  - MinHash-LSH banding turns O(n²) near-dup into an equi-join on
  *    band keys (the classic shingle→minhash→band→bucket-join);
  *  - brute-force cosine is the correctness baseline; the LSH-bucketed
  *    ANN variant is the scale path (hyperplane sig equi-join);
  *  - multimodal decode streams per-partition, no driver collection.
  */
object ExtQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.queries ++ SimQueries.queries ++ SimSearchQueries.queries ++
      MmQueries.queries ++ TextCurationQueries.queries

  val oracles: Map[String, String] =
    DedupQueries.oracles ++ SimQueries.oracles ++ SimSearchQueries.oracles ++
      MmQueries.oracles ++ TextCurationQueries.oracles
}
