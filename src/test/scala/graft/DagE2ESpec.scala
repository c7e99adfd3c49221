package graft

import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.etl.MarketCalendar
import graft.ind.IndicatorPipeline
import graft.io.BarsIO
import graft.model.Schemas

/** The reference's two-task DAG (airflow_dag.py: Downloader >> Indicators,
  * data handoff via parquet at rest) end-to-end: raw bars → partitioned
  * sink → read day → pipeline → partitioned indicator sink → read back.
  */
class DagE2ESpec extends SparkSpec {

  test("downloader sink → indicators task → indicator sink roundtrip") {
    val date = LocalDate.of(2024, 3, 5)
    val ds = date.toString
    val openNs = MarketCalendar.marketOpenCloseNanos(date)._1
    val minNs = 60L * 1000000000L
    val raw = spark.createDataFrame(
      java.util.Arrays.asList((0 until 40).map(i =>
        Row("AAPL", 1000.0, 100.0 + i, 100.0 + i, 100.5 + i, 99.5 + i,
          100.0 + i, openNs + i * minNs)): _*),
      Schemas.rawBars)

    val base = java.nio.file.Files.createTempDirectory("dag").toString
    val rawBase = s"$base/yahoo"
    val indBase = s"$base/indicators"

    // t1 "Downloader": write the day's raw bars
    BarsIO.writePartitioned(raw, rawBase, "1m", ds)
    // t2 "Indicators": read that day, transform, write features
    val dayBars = BarsIO.readDay(spark, rawBase, "1m", ds)
      .select(Schemas.rawBars.fieldNames.map(col).toIndexedSeq: _*)
    val features = IndicatorPipeline.run(dayBars, date)
    BarsIO.writePartitioned(features, indBase, "1m", ds)

    // downstream consumer: read the feature day back
    val back = BarsIO.readDay(spark, indBase, "1m", ds)
    assert(back.columns.sorted.toSeq == Schemas.indicatorColumns.sorted)
    assert(back.count() == 7)
    assert(back.agg(org.apache.spark.sql.functions.min("window_start"))
      .collect()(0).getLong(0) == openNs + 33 * minNs)
  }
}
