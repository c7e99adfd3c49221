package graft.queries

import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Helpers shared by the two halves of the round-13 [[Ts2Queries]]
  * split: the canonical per-ticker ordering — as a [[WindowSpec]] and
  * as its SQL `OVER` text, kept textually identical so the DuckDB
  * oracle mirrors the exact plan ordering — and the DuckDB-parity
  * rounding alias (see [[Rounding.r6]]). */
private[queries] object Ts2Shared {
  def w: WindowSpec = Window.partitionBy("ticker").orderBy("t", "event_id")
  val Over = "PARTITION BY ticker ORDER BY t, event_id"
  val r6 = Rounding.r6 _
}
