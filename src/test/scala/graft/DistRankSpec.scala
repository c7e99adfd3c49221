package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.DistRank

/** Equivalence pins for the distributed exact rank: bit-identical to
  * the single-partition `row_number()` / `ntile(k)` / running `sum()`
  * forms it replaced, across duplicates, skew, descending orders,
  * every n-vs-k ntile remainder case, and empty input — plus the plan
  * invariant (the window it builds IS partitioned).
  */
class DistRankSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("id", LongType),
    StructField("v", LongType)))

  private def df(rows: Seq[(Long, Long, Long)]) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
    schema)

  // 97 rows, heavy duplicate keys (k = i % 7 floods bucket bounds),
  // distinct tiebreaker id, values for running sums
  private val fixture: Seq[(Long, Long, Long)] =
    (0 until 97).map(i => ((i % 7).toLong, i.toLong, (i % 13).toLong))

  test("rowNumber + run sums match the unpartitioned window exactly") {
    val d = df(fixture)
    val r = DistRank.rowNumber(d, "rk", col("k"),
      Seq(col("k"), col("id")), runSumCols = Seq("v"))
    assert(r.n == 97L)
    assert(r.sums("v") == fixture.map(_._3).sum)
    val got = r.df.select("id", "rk", "run_v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    val w = Window.orderBy(col("k"), col("id"))
    val want = d
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("run_v", sum(col("v"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "rk", "run_v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("descending order via negated bucket key matches window desc") {
    val d = df(fixture)
    val r = DistRank.rowNumber(d, "rk", negate(col("v")),
      Seq(col("v").desc, col("id")))
    val got = r.df.select("id", "rk")
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    val want = df(fixture)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "rk")
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(got == want)
  }

  test("ntileOf matches ntile(k) for every remainder case") {
    // n=97 with k in 1..12 covers n%k = 0 and every nonzero remainder
    // shape, plus k > distinct-bucket edge cases; n=3,k=10 covers
    // n < k (each row its own bucket)
    for ((rows, ks) <- Seq((fixture, 1 to 12), (fixture.take(3), Seq(10)))) {
      val d = df(rows)
      val r = DistRank.rowNumber(d, "rk", col("k"), Seq(col("k"), col("id")))
      for (k <- ks) {
        val got = r.df
          .withColumn("b", DistRank.ntileOf(col("rk"), r.n, k))
          .select("id", "b")
          .collect().map(x => (x.getLong(0), x.getInt(1))).sortBy(_._1).toSeq
        val want = d
          .withColumn("b",
            ntile(k).over(Window.orderBy(col("k"), col("id"))))
          .select("id", "b")
          .collect().map(x => (x.getLong(0), x.getInt(1))).sortBy(_._1).toSeq
        assert(got == want, s"k=$k n=${r.n}")
      }
    }
  }

  test("empty input: zero rows, zero totals, no failure") {
    val r = DistRank.rowNumber(df(Nil), "rk", col("k"),
      Seq(col("k"), col("id")), runSumCols = Seq("v"))
    assert(r.n == 0L && r.sums("v") == 0L)
    assert(r.df.count() == 0L)
  }

  test("the rank window is PARTITIONED (the invariant the suite pins)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val r = DistRank.rowNumber(df(fixture), "rk", col("k"),
      Seq(col("k"), col("id")))
    val bad = r.df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }
}
