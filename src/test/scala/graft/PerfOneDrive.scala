package graft
object PerfOneDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).queryExecution.toRdd.count()
      println(f"TIME $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
