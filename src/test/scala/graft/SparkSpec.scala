package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // shared session; never stopped per-suite
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // Fail loudly if any generated code doesn't compile. The default
    // (fallback=true) silently runs the stage interpreted — which is how
    // a suppressed static forwarder (kernel named `eval` colliding with
    // Expression.eval) shipped: plans looked codegen'd, runtime wasn't.
    .config("spark.sql.codegen.fallback", "false")
    .getOrCreate()
}
