package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Null-transparency pins for the recursive window kernels
  * (AdaptiveEmaWindow, SarWindow): a mid-stream null input must CARRY
  * state — never null the buffer and silently re-seed the recursion on
  * the next row. The all-non-null oracle fixtures can't catch that
  * corruption, so these specs drive hand-built gappy series directly.
  */
class NullStateSpec extends SparkSpec {

  private val w = Window.partitionBy("g").orderBy("id")

  test("AdaptiveEmaWindow carries y through null x AND null c") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Option(10.0), Option(0.5)), // seed: y = 10
      (2L, Option.empty[Double], Option(0.5)), // null x: carry 10
      (3L, Option(20.0), Option(0.5)), // y = 10 + .5*(20-10) = 15
      (4L, Option(30.0), Option.empty[Double]), // null c: carry 15
      (5L, Option(25.0), Option(0.5))) // y = 15 + .5*(25-15) = 20
      .toDF("id", "x", "c").withColumn("g", lit(1))
    val got = df
      .withColumn("y", expr("graft_adaptive_ema_w(x, c)").over(w))
      .orderBy("id").select("y").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(10.0), Some(10.0), Some(15.0), Some(15.0),
      Some(20.0)))
  }

  test("AdaptiveEmaWindow seeds at the first fully-non-null row") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Option.empty[Double], Option(0.5)), // no seed yet
      (2L, Option(8.0), Option.empty[Double]), // still no seed (c null)
      (3L, Option(12.0), Option(0.5)), // seed: y = 12
      (4L, Option(16.0), Option(0.5))) // y = 12 + .5*4 = 14
      .toDF("id", "x", "c").withColumn("g", lit(1))
    val got = df
      .withColumn("y", expr("graft_adaptive_ema_w(x, c)").over(w))
      .orderBy("id").select("y").as[Option[Double]].collect().toSeq
    assert(got == Seq(None, None, Some(12.0), Some(14.0)))
  }

  test("SarWindow: a null bar is transparent (carries, never re-seeds)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // A 10-bar series engineered to include a reversal; bar 4 gets a
    // null close in the gapped variant.
    val bars = Seq(
      (1L, 10.5, 9.5, 10.0), (2L, 11.0, 10.0, 10.8),
      (3L, 11.5, 10.5, 11.2), (4L, 12.0, 11.0, 11.8),
      (5L, 12.5, 11.5, 12.2), (6L, 11.0, 9.0, 9.2), // pierce → reverse
      (7L, 10.0, 8.5, 8.8), (8L, 9.5, 8.0, 8.2),
      (9L, 10.5, 9.8, 10.4), (10L, 11.5, 10.9, 11.3))
    def run(rows: Seq[(Long, Option[Double], Option[Double], Option[Double])])
        : Map[Long, (Option[Double], Option[Long])] =
      rows.toDF("id", "h", "l", "c").withColumn("g", lit(1))
        .withColumn("x", expr("graft_sar_w(h, l, c)").over(w))
        .select(col("id"), col("x.sar"), col("x.dir"))
        .as[(Long, Option[Double], Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val full = bars.map { case (id, h, l, c) =>
      (id, Option(h), Option(l), Option(c)) }
    val gapped = full.map { case (id, h, l, c) =>
      if (id == 4L) (id, h, l, Option.empty[Double]) else (id, h, l, c) }
    val gotGap = run(gapped)
    val gotFiltered = run(full.filterNot(_._1 == 4L))
    // every non-null bar computes as if the null bar never existed
    gotFiltered.foreach { case (id, st) =>
      assert(gotGap(id) == st, s"bar $id diverged after the null bar")
    }
    // the null bar itself emits the carried state of the previous bar
    assert(gotGap(4L) == gotFiltered(3L))
  }
}
