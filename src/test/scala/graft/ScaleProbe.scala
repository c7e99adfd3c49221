package graft
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.EventBars.minuteBars(spark, "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(30)
    val big = base.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .withColumn("ticker", concat(col("ticker"), lit("_"), col("rep"))).drop("rep")
    big.write.mode("overwrite").parquet("/tmp/scale_bars")
    val bars = spark.read.parquet("/tmp/scale_bars")
    println("ROWS=" + bars.count())
    def run(): Long = {
      val sz = graft.etl.Sessionize(bars, "ticker", "ws", Seq(60000000L, 120000000L, 180000000L))
      val dz = graft.etl.Densify(sz.drop("event_id"), Seq("ticker","island","sub_ticker"), "ws", 60000000L)
      val ip = graft.etl.Interpolate(dz, Seq("ticker","island"), "ws", Seq("open","high","low","close","volume"))
      val fi = graft.ind.FrameIndicators.addAll(ip, Seq("ticker","island"), Seq("ws"))
      graft.functions.GraftFunctions.register(spark)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ticker","island").orderBy("ws")
      fi.withColumn("_wp", expr("graft_wilder_w(close)").over(w))
        .withColumn("_ap", expr("graft_adx_pair_w(high, low, close)").over(w))
        .withColumn("macd_hist", expr("graft_macd_hist_w(close)").over(w))
        .count()
    }
    run() // warm
    val t0 = System.nanoTime()
    val n = run()
    println("OUT_ROWS=" + n + " SEC=" + (System.nanoTime()-t0)/1e9)
    spark.stop()
  }
}
