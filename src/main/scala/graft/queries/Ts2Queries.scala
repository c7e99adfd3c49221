package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Facade preserving the registry shape for the former 2,188-line
  * round-4 time-series module, split in round 13 — the same move the
  * r11 split made for [[ExtQueries]] — into:
  *
  *   - [[Ind2Queries]] — the `ind_*` TA-indicator surface (EMA family,
  *     SAR, SuperTrend, channels, oscillators, KAMA, linreg, VWAP);
  *   - [[TsStatQueries]] — the `ts_*`/`drift_*` series-statistics and
  *     monitoring layer (Hurst, beta, pairs, DTW, vol estimators,
  *     seasonality, CUSUM, PSI/KS drift).
  *
  * Query bodies and oracle SQL moved verbatim (RegistrySpec's shadow
  * pin plus the full oracle gate re-verified the merge); shared
  * ordering/rounding helpers live in [[Ts2Shared]]. */
object Ts2Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Ind2Queries.queries ++ TsStatQueries.queries

  val oracles: Map[String, String] =
    Ind2Queries.oracles ++ TsStatQueries.oracles
}
