package graft

import org.apache.spark.sql.Row

import graft.io.BarsIO
import graft.model.Schemas

/** Pins for the sink compaction operator (BarsIO.compactDay): output
  * file count follows the target size, data round-trips exactly, other
  * partitions stay untouched, and the rewrite plan is ONE round-robin
  * exchange over the materialized rows.
  */
class SinkCompactSpec extends SparkSpec {

  private def bars(n: Int) = spark.createDataFrame(
    java.util.Arrays.asList((0 until n).map { i =>
      Row(s"T${i % 7}", 1000.0, 10.0 + i, 10.5 + i, 11.0 + i, 9.5 + i,
        10.0 + i, 1709640000000000000L + i * 60000000000L)
    }: _*), Schemas.rawBars)

  private def dayFiles(base: String, ds: String): Array[java.io.File] = {
    val p = ds.split("-")
    new java.io.File(
      s"$base/interval=1m/yr=${p(0)}/mo=${p(1)}/ds=$ds")
      .listFiles().filter(_.getName.startsWith("part-"))
  }

  test("compactDay: many small files collapse to the size target") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    BarsIO.writePartitioned(bars(200).repartition(8), dir, "1m",
      "2024-03-05")
    BarsIO.writePartitioned(bars(50), dir, "1m", "2024-03-06")
    assert(dayFiles(dir, "2024-03-05").length == 8)
    val before = BarsIO.readDay(spark, dir, "1m", "2024-03-05")
      .collect().map(_.toString).sorted.toSeq
    val otherBefore = BarsIO.readDay(spark, dir, "1m", "2024-03-06")
      .collect().map(_.toString).sorted.toSeq

    // huge target → exactly one output file
    assert(BarsIO.compactDay(spark, dir, "1m", "2024-03-05") == 1)
    assert(dayFiles(dir, "2024-03-05").length == 1)
    // identical rows after the rewrite; the sibling partition untouched
    assert(BarsIO.readDay(spark, dir, "1m", "2024-03-05")
      .collect().map(_.toString).sorted.toSeq == before)
    assert(BarsIO.readDay(spark, dir, "1m", "2024-03-06")
      .collect().map(_.toString).sorted.toSeq == otherBefore)
    // absent partition: no-op, 0 files
    assert(BarsIO.compactDay(spark, dir, "1m", "2024-03-07") == 0)
  }

  test("compactDay: tiny target splits into ceil(bytes/target) files") {
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString
    BarsIO.writePartitioned(bars(400).repartition(4), dir, "1m",
      "2024-03-05")
    val bytes = dayFiles(dir, "2024-03-05").map(_.length()).sum
    val target = bytes / 3 + 1 // forces n = 3
    assert(BarsIO.compactDay(spark, dir, "1m", "2024-03-05", target) == 3)
    assert(dayFiles(dir, "2024-03-05").length == 3)
  }

  test("compaction rewrite plan: one exchange over materialized rows") {
    val dir = java.nio.file.Files.createTempDirectory("compact3").toString
    BarsIO.writePartitioned(bars(100).repartition(5), dir, "1m",
      "2024-03-05")
    val plan = BarsIO.readDay(spark, dir, "1m", "2024-03-05")
      .localCheckpoint().repartition(2)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("RoundRobinPartitioning"), plan)
    assert(plan.contains("Scan ExistingRDD"), plan)
  }
}
