package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.ExtCommon

/** Streaming embedding near-neighbor alerts against a STATIC trained
  * IVF index — the vector twin of [[StreamingLshDedup]]: vectors
  * arrive on a stream, quantize to their coarse cell with a per-row
  * stateless fold over the trained centroids, and probe the persisted
  * cell-keyed corpus via ONE stream-static equi-join. Emits every
  * (arriving vector, corpus vector) pair with cosine ≥ tau.
  *
  * Scale shape: the quantizer is exactly what a serving node holds
  * in memory — the centroid table is bounded by the nlist clamp
  * (≤ 4096), so it ships to every task as a plan literal (the
  * expression-level form of a broadcast; no join, no shuffle, legal
  * on a stream where a window-function argmax is not). The cell probe
  * joins the at-rest `assigned` table by cell id — candidates are one
  * cell (~n/nlist rows), never the corpus. The only streaming STATE
  * is the (q_id, n_id) pair dedup bounded by the watermark horizon.
  * Top-k needs a per-query rank (stateful on a stream); the streaming
  * surface is the THRESHOLD alert — rank the alerts downstream if
  * k-limiting matters.
  */
object StreamingAnnProbe {

  /** Trained centroid row collected to the driver at index-build
    * time: (cell id, centroid vector, centroid norm). */
  final case class Centroid(cId: Long, cv: Array[Double], cnrm: Double)

  /** Build the static index from an at-rest corpus (vec_id BIGINT,
    * v ARRAY<DOUBLE>): the driver-side centroid list (bounded — the
    * nlist clamp caps it at 4096 rows; guarded here) and the
    * cell-keyed corpus table (cell, n_id, nv, nnrm). Training runs
    * ONCE here, batch-side — the stream never re-quantizes. */
  def buildIndex(corpus: DataFrame): (Array[Centroid], DataFrame) = {
    val (cents, assigned) = ExtCommon.ivfKmeansIndex(corpus)
    val c = cents.select(col("c_id"), col("cv"), col("cnrm")).collect()
      .map(r => Centroid(r.getLong(0),
        r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_.cId)
    require(c.length <= 4096,
      s"centroid list ${c.length} exceeds the nlist clamp")
    (c, assigned.select(col("cell"), col("vec_id").as("n_id"),
      col("v").as("nv"), col("nrm").as("nnrm")).localCheckpoint())
  }

  /** The per-row quantizer: argmax-cosine cell over the centroid
    * literal, folded left in ascending c_id order with a strict
    * improvement test — ties keep the LOWEST c_id, matching the batch
    * `row_number() OVER (ORDER BY csim DESC, c_id)` assignment. The
    * fold is SEEDED with the first (lowest-id) centroid's struct, not
    * a (-Inf, -1) sentinel: a zero-norm vector (all cosines -Inf)
    * then lands in the lowest cell exactly like the batch kernel,
    * instead of dropping out at a sentinel cell -1. */
  private[graft] def cellOf(v: Column, nrm: Column,
      cents: Array[Centroid]): Column = {
    require(cents.nonEmpty, "centroid list is empty")
    def simOf(cv: Column, cnrm: Column): Column = coalesce(
      try_divide(call_function("graft_dot", v, cv), nrm * cnrm),
      lit(Double.NegativeInfinity))
    val head = cents.head
    val seed = struct(
      simOf(lit(head.cv), lit(head.cnrm)).as("csim"),
      lit(head.cId).as("cell"))
    if (cents.length == 1) lit(head.cId)
    else {
      val centArr = array(cents.tail.map(c =>
        struct(lit(c.cId).as("c_id"), lit(c.cv).as("cv"),
          lit(c.cnrm).as("cnrm"))): _*)
      aggregate(centArr, seed,
        (acc, c) => {
          val sim = simOf(c.getField("cv"), c.getField("cnrm"))
          when(sim > acc.getField("csim"),
            struct(sim.as("csim"), c.getField("c_id").as("cell")))
            .otherwise(acc)
        }).getField("cell")
    }
  }

  /** stream (eventTimeCol, q_id, v ARRAY<DOUBLE>) → one row per
    * (arriving vector, corpus vector) with cosine ≥ tau, probing only
    * the quantizer-assigned cell, deduped across micro-batches within
    * the watermark horizon. */
  def apply(stream: DataFrame, cents: Array[Centroid], cells: DataFrame,
      eventTimeCol: String = "ts", horizon: String = "10 minutes",
      tau: Double = 0.8): DataFrame = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    stream
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .withColumn("cell", cellOf(col("v"), col("nrm"), cents))
      .join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", try_divide(
        call_function("graft_dot", col("v"), col("nv")),
        col("nrm") * col("nnrm")))
      .filter(col("sim") >= lit(tau))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("q_id", "n_id")
      .select(col(eventTimeCol), col("q_id"), col("n_id"),
        graft.queries.Rounding.r6(col("sim")).as("sim"))
  }
}
