package graft

/** Ad-hoc per-query timing harness (test scope, not part of the driver
  * contract): `sbt "Test/runMain graft.PerfDrive q1 q2 ..."` times the
  * named queries back-to-back at sf0.1 — run a query twice to separate
  * codegen/JIT cold cost from the steady-state plan cost the bench's
  * totals are dominated by.
  */
object PerfDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(dir + "/lineitem.parquet").count()
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("dedup_cluster", "dedup_cluster", "agg_cube", "agg_cube",
        "agg_quantiles", "agg_quantiles", "pipeline_full", "pipeline_full",
        "dedup_lines", "dedup_neighbors", "join_bloom", "emb_quantize",
        "sketch_cms", "ts_resample")
    qs.foreach(time)
    spark.stop()
  }
}
