package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F2 — time-grid densification ("add_missing_timestamps",
  * reference stockdata/indicators.py:196-211, helper :69-94).
  *
  * Per (ticker, island), generates every grid timestamp between the
  * island's min and max at a fixed step and left-joins the observed rows
  * onto it; generated rows carry null OHLCV (interpolated by F3).
  * Because F1 guarantees internal gaps ∈ {1,2,3} steps, each gap inserts
  * at most 2 rows.
  *
  * Scale: the grid is built from a per-island min/max aggregate — both
  * sides of the join are hash-partitioned on the same (ticker, island)
  * key, so AQE plans a co-partitioned join with no extra exchange on the
  * fact side beyond the one F1 already created. Grid cardinality is
  * ≤ 3× the observed rows, never materialized on the driver.
  */
object Densify {

  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      stepUnits: Long): DataFrame = {
    val keys = keyCols.map(col)
    val grid = df.groupBy(keys: _*)
      .agg(min(col(tsCol)).as("_mn"), max(col(tsCol)).as("_mx"))
      .select(keys :+ explode(sequence(col("_mn"), col("_mx"),
        lit(stepUnits))).as(tsCol): _*)
    grid.join(df, keyCols :+ tsCol, "left")
  }

  /** DuckDB CTE chain mirroring [[apply]]; exposes `dz_final`. */
  def sqlStages(
      from: String,
      keyCols: Seq[String],
      tsCol: String,
      stepUnits: Long): String = {
    val keys = keyCols.mkString(", ")
    s"""dz_bounds AS (
       |  SELECT $keys, min($tsCol) AS _mn, max($tsCol) AS _mx
       |  FROM $from GROUP BY $keys),
       |dz_grid AS (
       |  SELECT $keys, unnest(generate_series(_mn, _mx, $stepUnits)) AS $tsCol
       |  FROM dz_bounds),
       |dz_final AS (
       |  SELECT g.*, ${"f.* EXCLUDE (" + keys + ", " + tsCol + ")"}
       |  FROM dz_grid g LEFT JOIN $from f USING ($keys, $tsCol))""".stripMargin
  }
}
