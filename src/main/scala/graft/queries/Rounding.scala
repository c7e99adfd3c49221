package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable rounding for oracle-compared doubles.
  *
  * Spark's `round(x, 6)` applies HALF_UP to the exact decimal expansion
  * of the double; DuckDB computes `std::round(x * 1e6) / 1e6`. For
  * values whose scaled form lands exactly on .5 (≈2 per 100k in the
  * rocp series at sf0.1) the two disagree by one ulp of the rounded
  * digit. Computing DuckDB's algorithm on the Spark side — identical
  * IEEE multiply, integer round with away-from-zero ties (BigDecimal
  * HALF_UP ≡ std::round at scale 0), identical divide — makes the
  * rounded doubles bit-equal.
  */
object Rounding {
  // `+ 0.0` normalizes IEEE -0.0 (which std::round produces for tiny
  // negatives, but BigDecimal never does) to +0.0 on both engines; the
  // oracle SQL appends the same.
  def r6(c: Column): Column = round(c * lit(1e6), 0) / lit(1e6) + lit(0.0)
  def r4(c: Column): Column = round(c * lit(1e4), 0) / lit(1e4) + lit(0.0)
  /** selectExpr/SQL-string form. */
  def r6s(e: String): String = s"(round(($e) * 1000000.0) / 1000000.0 + 0.0)"
}
