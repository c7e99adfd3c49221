package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ext.AsOfJoin

/** AS-OF join edge semantics: inclusive ties, no-prior-right nulls,
  * per-key isolation, latest-wins. */
class AsOfJoinSpec extends SparkSpec {

  private val lSchema = StructType(Seq(
    StructField("k", StringType), StructField("t", LongType),
    StructField("lv", DoubleType)))
  private val rSchema = StructType(Seq(
    StructField("k", StringType), StructField("t", LongType),
    StructField("rv", DoubleType)))

  test("inclusive tie, latest-wins, null before first right, key isolation") {
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 5L, 1.0),   // before any right → null
      Row("a", 10L, 2.0),  // tie with right@10 → inclusive match
      Row("a", 25L, 3.0),  // after rights@10,20 → 20 wins
      Row("b", 25L, 4.0)), // other key: only b-rights visible
      lSchema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 10L, 100.0), Row("a", 20L, 200.0), Row("b", 24L, 300.0)),
      rSchema)
    val out = AsOfJoin(left, right, Seq("k"), "t", Seq("rv"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3))).sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(
      ("a", 5L, null), ("a", 10L, 100.0), ("a", 25L, 200.0),
      ("b", 25L, 300.0)))
  }

  test("a matched right row with NULL value attaches null, not an older value") {
    // Regression: per-column last(ignoreNulls) skipped the null-valued
    // right@20 and wrongly carried right@10's 100.0 forward.
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 25L, 1.0)), lSchema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 10L, 100.0), Row("a", 20L, null)), rSchema)
    val out = AsOfJoin(left, right, Seq("k"), "t", Seq("rv")).collect()
    assert(out.length == 1 && out(0).isNullAt(3),
      s"expected null rv_asof from the null-valued match, got ${out(0)}")
  }

  test("tolerance: stale matches null out, fresh matches attach") {
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 100L, 1.0),  // match@95, 5 ticks stale → attaches
      Row("a", 200L, 2.0),  // nearest match@95, 105 stale → null
      Row("c", 300L, 3.0)), // key with NO right rows: _rf itself null →
      lSchema)               // the tolerance when() must yield null, not throw
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 95L, 9.5), Row("b", 299L, 9.9)), rSchema)
    val out = AsOfJoin(left, right, Seq("k"), "t", Seq("rv"),
      tolerance = Some(10L))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3))).sortBy(_._1)
    assert(out.toSeq == Seq((100L, 9.5), (200L, null), (300L, null)))
  }

  test("tolerance: a fresh match whose value is NULL stays null-matched") {
    // The bound must test the matched row's timestamp, not its value:
    // a null-valued right row WITHIN tolerance attaches as null because
    // the value is null, never by falling back past the tolerance.
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 25L, 1.0)), lSchema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 10L, 100.0), Row("a", 20L, null)), rSchema)
    val out = AsOfJoin(left, right, Seq("k"), "t", Seq("rv"),
      tolerance = Some(1000L)).collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }

  test("duplicate right timestamps match deterministically (greatest value)") {
    // Regression (round-3 advisor): with several right rows at the same
    // (key, t), the fill used to pick a partition-order-dependent row.
    // The window sort's trailing payload-struct term pins the match to
    // the greatest value tuple, mirrored by the oracles' max(value)
    // collapse — assert it holds under a shuffled, multi-partition input.
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 15L, 1.0)), lSchema)
    val dups = (1 to 40).map(i => Row("a", 10L, i.toDouble))
    val right = spark.createDataFrame(
      java.util.Arrays.asList(dups: _*), rSchema).repartition(8)
    (1 to 3).foreach { _ =>
      val out = AsOfJoin(left, right, Seq("k"), "t", Seq("rv")).collect()
      assert(out.length == 1 && out(0).getDouble(3) == 40.0,
        s"expected deterministic max-value match 40.0, got ${out(0)}")
    }
  }

  test("reserved names and non-numeric tolerance timestamps fail loudly") {
    val left = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 5L, 1.0)), lSchema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", 1L, 2.0)), rSchema)
    intercept[IllegalArgumentException] {
      AsOfJoin(left, right.withColumnRenamed("rv", "_rt"),
        Seq("k"), "t", Seq("_rt"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin(left.withColumn("_side", org.apache.spark.sql.functions.lit(1)),
        right, Seq("k"), "t", Seq("rv"))
    }
    val tsLeft = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", new java.sql.Timestamp(5000L), 1.0)),
      StructType(Seq(StructField("k", StringType),
        StructField("t", TimestampType), StructField("lv", DoubleType))))
    val tsRight = spark.createDataFrame(java.util.Arrays.asList(
      Row("a", new java.sql.Timestamp(1000L), 2.0)),
      StructType(Seq(StructField("k", StringType),
        StructField("t", TimestampType), StructField("rv", DoubleType))))
    intercept[IllegalArgumentException] {
      AsOfJoin(tsLeft, tsRight, Seq("k"), "t", Seq("rv"),
        tolerance = Some(10L))
    }
    // …but timestamps without tolerance stay supported
    assert(AsOfJoin(tsLeft, tsRight, Seq("k"), "t", Seq("rv")).count() == 1)
  }

  test("preserves left row count and columns") {
    val left = spark.createDataFrame(java.util.Arrays.asList(
      (1 to 50).map(i => Row("k", i.toLong, i.toDouble)): _*), lSchema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      Row("k", 10L, 1.0)), rSchema)
    val out = AsOfJoin(left, right, Seq("k"), "t", Seq("rv"))
    assert(out.count() == 50)
    assert(out.columns.toSeq == Seq("k", "t", "lv", "rv_asof"))
    assert(out.filter(out("rv_asof").isNull).count() == 9) // t=1..9
  }
}
