package graft
object PlanProbeDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("sample_hard_negatives","emb_knn_label","corpus_split_leakage","dedup_substring","sample_temperature","sim_hybrid_rrf","agg_decayed_count","layout_hilbert","graph_scc","ab_cuped","behav_survival","emb_silhouette","behav_funnel_latency","tok_coverage_curve","sketch_hll_merge")) {
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
