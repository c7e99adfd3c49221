package graft

/** P9 generalized: EVERY query runs against empty inputs without
  * throwing (the reference guards a handful of len()==0 cases by hand;
  * declarative Spark plans are empty-safe by construction — this pins
  * that property for the whole query surface, including the window,
  * join, and stateful-aggregate paths).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty_sf").toString
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0).write.parquet(s"$dir/$t.parquet")
    }
    // events.parquet stores TIMESTAMP(NANOS) — copy the schema through
    // the same nanosAsLong session conf the readers use
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$src/events.parquet")
      .limit(0).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("every query is empty-input-safe: zero rows out, no exception") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, emptyDir).count()
          if (n == 0) None else Some(s"$name: expected 0 rows, got $n")
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
