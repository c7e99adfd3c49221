package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The faithful E2 pipeline: sessionize → densify → interpolate →
    * frame + recursive indicators → 18-column feature table. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.queries("pipeline_full")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ IndicatorQueries.queries ++
      EtlQueries.queries ++ ExtQueries.queries ++ AnalyticsQueries.queries ++
      ScaleQueries.queries ++ TsQueries.queries ++ CorpusQueries.queries ++
      Ts2Queries.queries ++ BehaviorQueries.queries ++ Ts3Queries.queries ++
      TsRiskQueries.queries ++ Behavior2Queries.queries ++ TpchFeatQueries.queries ++ GraphStlQueries.queries ++
      Tpch2Queries.queries ++ CandleQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ IndicatorQueries.oracles ++
      EtlQueries.oracles ++ ExtQueries.oracles ++ AnalyticsQueries.oracles ++
      ScaleQueries.oracles ++ TsQueries.oracles ++ CorpusQueries.oracles ++
      Ts2Queries.oracles ++ BehaviorQueries.oracles ++ Ts3Queries.oracles ++
      TsRiskQueries.oracles ++ Behavior2Queries.oracles ++ TpchFeatQueries.oracles ++ GraphStlQueries.oracles ++
      Tpch2Queries.oracles ++ CandleQueries.oracles
}
