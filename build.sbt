ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stockindicatorsetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 local executor threads share this heap; 8g left each sort/agg
  // task ~250MB and GC time showed up in the bench. The box has 128GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Nothing may print AFTER Bench's single JSON stdout line: the round
// driver parses it out of a ~2000-char stdout tail, and sbt's trailing
// "[success] Total time ..." summary was pushing it out (BENCH_r06
// "parsed": null). Dropping the success summary is the one sbt line
// that prints after a forked run completes.
Global / showSuccess := false
// (read by sbt's command engine, not by tasks — silence the lint)
Global / excludeLintKeys += showSuccess
// Forked run output goes STRAIGHT to this process's stdout/stderr
// instead of through sbt's logger: the logger tags program stdout at
// Info level, so `sbt -error "runMain graft.Bench"` would silently
// swallow the one JSON line the driver parses.
run / outputStrategy := Some(StdoutOutput)
