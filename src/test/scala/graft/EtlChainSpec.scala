package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Densify, Interpolate, Sessionize}

/** F1/F2/F3 restructuring chain invariants (SURVEY.md §5.2, §5.4):
  * island membership/renumbering, exact 60-step grids, positional
  * linear interpolation with both-direction edge clamps.
  */
class EtlChainSpec extends SparkSpec {

  private val barSchema = StructType(Seq(
    StructField("ticker", StringType),
    StructField("ws", LongType),
    StructField("close", DoubleType)))

  private def bars(rows: Seq[(String, Long, java.lang.Double)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      barSchema)

  test("sessionize splits on disallowed gaps, drops singletons, renumbers") {
    // A: [0,60,120] | gap 300 | [420,480] | gap 420 | [900] (dropped)
    val df = bars(Seq(
      ("A", 0L, d(1)), ("A", 60L, d(2)), ("A", 120L, d(3)),
      ("A", 420L, d(4)), ("A", 480L, d(5)), ("A", 900L, d(6)),
      ("B", 0L, d(7)), ("B", 180L, d(8)))) // B: one island (gap 180 allowed)
    val out = Sessionize(df, "ticker", "ws", Seq(60L, 120L, 180L))
      .select("ticker", "ws", "island", "sub_ticker")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array(
      ("A", 0L, 0L, "A-0"), ("A", 60L, 0L, "A-0"), ("A", 120L, 0L, "A-0"),
      ("A", 420L, 1L, "A-1"), ("A", 480L, 1L, "A-1"),
      ("B", 0L, 0L, "B-0"), ("B", 180L, 0L, "B-0")))
  }

  test("densify fills every >step gap to an exact 60-step grid") {
    val df = bars(Seq(("A", 0L, d(10)), ("A", 120L, d(12)), ("A", 300L, d(15))))
      .withColumn("island", lit(0L)).withColumn("sub_ticker", lit("A-0"))
    val out = Densify(df, Seq("ticker", "island", "sub_ticker"), "ws", 60L)
      .orderBy("ws").collect()
    assert(out.map(_.getLong(out.head.fieldIndex("ws"))).toSeq ===
      Seq(0L, 60L, 120L, 180L, 240L, 300L))
    // the check the reference meant to enforce (indicators.py:256-261):
    val diffs = out.map(_.getLong(out.head.fieldIndex("ws"))).sliding(2)
      .map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(_ == 60L))
    val closeIdx = out.head.fieldIndex("close")
    assert(out.count(_.isNullAt(closeIdx)) == 3) // generated rows are null
  }

  test("interpolate is positional-linear with both-direction edge clamp") {
    val df = bars(Seq(
      ("A", 0L, null), ("A", 60L, d(10)), ("A", 120L, null),
      ("A", 180L, null), ("A", 240L, d(16)), ("A", 300L, null)))
      .withColumn("island", lit(0L))
    val out = Interpolate(df, Seq("ticker", "island"), "ws", Seq("close"))
      .orderBy("ws").collect()
    val closeIdx = out.head.fieldIndex("close")
    assert(out.map(_.getDouble(closeIdx)).toSeq ===
      Seq(10.0, 10.0, 12.0, 14.0, 16.0, 16.0))
  }

  test("skewed key: one giant ticker among tiny ones stays correct") {
    // 1 ticker with 20k consecutive bars + 50 tickers with 10 each
    val giant = (0 until 20000).map(i => ("G", i * 60L, 100.0 + (i % 37)))
    val small = (1 to 50).flatMap(t =>
      (0 until 10).map(i => (s"s$t", i * 60L, 50.0 + i)))
    val df = bars((giant ++ small).map { case (t, ws, v) =>
      (t, ws, java.lang.Double.valueOf(v))
    })
    val out = Sessionize(df, "ticker", "ws", Seq(60L, 120L, 180L))
    assert(out.count() == 20000 + 500) // no gaps → single island each
    assert(out.filter(out("ticker") === "G").count() == 20000)
    val ip = Interpolate(
      Densify(out, Seq("ticker", "island", "sub_ticker"), "ws", 60L),
      Seq("ticker", "island"), "ws", Seq("close"))
    assert(ip.count() == 20500)
  }

  test("full pipeline emits the reference's exact 18-column schema") {
    val out = graft.queries.EtlQueries.queries("pipeline_full")(
      spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq === graft.model.Schemas.indicatorColumns)
    val n = out.count()
    assert(n > 0, "pipeline_full produced no rows at sf0.001")
    assert(out.na.drop().count() == n) // P4: no nulls survive
  }

  private def d(v: Int): java.lang.Double = java.lang.Double.valueOf(v.toDouble)
}
