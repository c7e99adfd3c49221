package graft
object PlanProbeDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q2_min_cost_supplier","q4_priority_returns","q9_product_profit","q11_important_parts","q12_late_shipments","q16_supplier_cnt","q19_disjunctive_revenue","q20_heavy_shippers","q21_waiting_supplier")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l => l.contains("PushedFilters") && q == "q6_forecast").take(2).mkString("\n"))
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      val sp = "Exchange SinglePartition".r.findAllIn(p).length
      val bc = "BroadcastExchange".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val cgf = if (p.contains("CodegenFallback")) "CGFALLBACK" else ""
      println(s"PLAN $q hash=$ex single=$sp bcast=$bc smj=$smj $cgf")
    }
    spark.stop()
  }
}
