package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The faithful E2 pipeline: sessionize → densify → interpolate →
    * frame + recursive indicators → 18-column feature table. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.queries("pipeline_full")(spark, "/root/testdata/sf0.001")

  /** Every query module with its oracle map — the single list both
    * registries merge from, so RegistrySpec can pin that no module
    * silently shadows another's query name (Map ++ keeps the later
    * entry and the loser just vanishes from the suite). */
  private[graft] val modules: Seq[
      (Map[String, (SparkSession, String) => DataFrame],
        Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracles),
    (IndicatorQueries.queries, IndicatorQueries.oracles),
    (EtlQueries.queries, EtlQueries.oracles),
    (ExtQueries.queries, ExtQueries.oracles),
    (AnalyticsQueries.queries, AnalyticsQueries.oracles),
    (ScaleQueries.queries, ScaleQueries.oracles),
    (TsQueries.queries, TsQueries.oracles),
    (CorpusQueries.queries, CorpusQueries.oracles),
    (Ts2Queries.queries, Ts2Queries.oracles),
    (BehaviorQueries.queries, BehaviorQueries.oracles),
    (Ts3Queries.queries, Ts3Queries.oracles),
    (TsRiskQueries.queries, TsRiskQueries.oracles),
    (Behavior2Queries.queries, Behavior2Queries.oracles),
    (TpchFeatQueries.queries, TpchFeatQueries.oracles),
    (GraphStlQueries.queries, GraphStlQueries.oracles),
    (Tpch2Queries.queries, Tpch2Queries.oracles),
    (CandleQueries.queries, CandleQueries.oracles),
    (Corpus2Queries.queries, Corpus2Queries.oracles),
    (Corpus3Queries.queries, Corpus3Queries.oracles),
    (TokQueries.queries, TokQueries.oracles),
    (ClassifyQueries.queries, ClassifyQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
