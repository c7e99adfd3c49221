package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.{ExactQuantile, KMin}

/** Equivalence pins for the two round-7 grouped order-statistic
  * utilities against the single-window forms they replaced:
  *
  *  - `ExactQuantile.grouped` (range-bucketed cells + broadcast
  *    offsets) must be bit-identical to `groupedLocal` (whole-group
  *    window) on every edge the bucketing can get wrong: heavy skew,
  *    singleton groups, groups smaller than the bucket count, ties
  *    straddling bucket bounds, NULL values (nulls-first rank
  *    arithmetic), NULL group keys, empty input.
  *  - `KMin.kth` must return exactly the `row_number() = k` hash a
  *    whole-group sort would, for k smaller / equal / larger than the
  *    group, across multi-partition inputs.
  */
class GroupedRankSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("v", DoubleType)))

  private def df(rows: Seq[(String, java.lang.Double)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      schema).repartition(4)

  private val ps = Seq(0.05 -> "q05", 0.25 -> "q25", 0.5 -> "q50",
    0.9 -> "q90", 1.0 -> "q100")

  private def check(rows: Seq[(String, java.lang.Double)]): Unit = {
    val d = df(rows)
    val got = ExactQuantile.grouped(d, "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 5).map(i => Option(r.get(i)).map(_.asInstanceOf[Double]))).toMap
    val want = ExactQuantile.groupedLocal(d, "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 5).map(i => Option(r.get(i)).map(_.asInstanceOf[Double]))).toMap
    assert(got == want)
  }

  test("skewed groups with duplicate values match the local window") {
    // 90% of rows in one hot group; duplicates flood the value bounds
    check((0 until 500).map { i =>
      val g = if (i % 10 < 9) "hot" else s"cold_${i % 3}"
      (g, java.lang.Double.valueOf((i % 7).toDouble))
    })
  }

  test("singleton and tiny groups interpolate exactly") {
    check(Seq("a" -> 1.0, "b" -> 2.0, "b" -> 3.0, "c" -> 5.0, "c" -> 7.0,
      "c" -> 11.0).map { case (g, v) => (g, java.lang.Double.valueOf(v)) })
  }

  test("NULL values rank nulls-first, identically on both forms") {
    check(Seq(("a", null), ("a", java.lang.Double.valueOf(2.0)),
      ("a", java.lang.Double.valueOf(4.0)), ("b", null), ("b", null),
      ("b", java.lang.Double.valueOf(9.0))))
  }

  test("NULL group key forms its own group on both forms") {
    check(Seq((null, java.lang.Double.valueOf(1.0)),
      (null, java.lang.Double.valueOf(3.0)),
      ("x", java.lang.Double.valueOf(8.0))))
  }

  test("empty input yields empty output") {
    assert(ExactQuantile.grouped(df(Nil), "g", "v", ps).collect().isEmpty)
  }

  test("KMin.kth equals the rank-k row of a whole-group sort") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // distinct values per group (the utility's contract in the sketch
    // callers); groups of size 1, k-1, k, 3k around k = 5
    val rows = Seq.tabulate(40)(i => ("big", (i * 37 % 101).toDouble)) ++
      Seq.tabulate(5)(i => ("atk", (50 - i * 3).toDouble)) ++
      Seq.tabulate(4)(i => ("under", i.toDouble)) ++
      Seq(("one", 42.0))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      schema).repartition(5)
    val k = 5
    val got = KMin.kth(d, Seq("g"), "v", k, "kth")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = d
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy("v")))
      .filter(col("rn") === k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
    assert(got.keySet == Set("big", "atk")) // under/one have < k rows
  }

  test("KMin.smallestBy: composite order keeps collisions deterministic") {
    import org.apache.spark.sql.functions._
    // heavy primary-order collisions (v cycles 0/1/2) — the scenario
    // the sample queries hit when doc ids exceed the hash modulus;
    // the trailing id must fully determine both the selected set and
    // the ranks, independent of partitioning.
    val sch = StructType(Seq(StructField("g", StringType),
      StructField("v", DoubleType), StructField("id", LongType)))
    val rows = Seq.tabulate(60)(i => Row(s"s${i % 2}", (i % 3).toDouble,
      (97L * i) % 60))
    def run(parts: Int) = KMin.smallestBy(
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), sch)
        .repartition(parts),
      Seq("g"), Seq("v", "id"), 7, "rk")
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(2)))
      .toSet
    val want = rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (r._2, r._3)).take(7).zipWithIndex
          .map { case (r, i) => (g, i + 1, r._3) }
      }.toSet
    assert(run(1) == want && run(7) == want)
  }
}
