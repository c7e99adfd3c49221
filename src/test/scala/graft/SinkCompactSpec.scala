package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

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

  test("writeClustered: files own disjoint key ranges, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("clust").toString
    val out = s"$dir/bars"
    BarsIO.writeClustered(bars(500), out, 4, "window_start")
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.length() > 0)
    assert(files.length >= 2, "need multiple files to prove disjointness")
    // per-file [min, max] of the cluster key must not overlap — the
    // property that lets parquet footer stats prune a range scan to
    // the few covering files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("window_start"),
          org.apache.spark.sql.functions.max("window_start"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, ranges.toSeq)
      case _ => ()
    }
    // exact round-trip
    assert(spark.read.parquet(out).count() == 500)
    // one exchange: the range repartition itself
    val plan = bars(500).repartitionByRange(4, col("window_start"))
      .sortWithinPartitions("window_start")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("rangepartitioning"), plan)
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
