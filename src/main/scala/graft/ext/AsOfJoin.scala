package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to each left row the latest right-side values at
  * or before its timestamp, per key (the canonical market-data join:
  * trade → prevailing quote). Spark has no native ASOF; the idiomatic
  * composition is the union + running `last(ignoreNulls)` window:
  * tag sides, union, sort (ts, side) with right rows first on ties so
  * equal timestamps match inclusively, forward-fill the right values,
  * keep left rows.
  *
  * Scale: ONE shuffle on the key (both inputs union before the
  * exchange) and one sort — strictly cheaper than the range-join
  * fallback (`l JOIN r ON key AND r.ts <= l.ts` + max-per-row), which
  * explodes candidate pairs. State per key is a single running value.
  */
object AsOfJoin {

  /** @param left      probe side (all columns preserved)
    * @param right     build side: keyCols ++ tsCol ++ valCols projection
    * @param keyCols   equi-join keys
    * @param tsCol     ordering column (same name both sides)
    * @param valCols   right-side value columns to attach (null when no
    *                  right row is at-or-before the left row)
    * @param tolerance max allowed staleness in tsCol's own units (epoch
    *                  micros here): a match older than `left.ts − tol`
    *                  attaches as null, the standard "as-of with
    *                  tolerance" contract (a quote 3 days stale is not a
    *                  prevailing quote). None = unbounded lookback.
    *                  Requires a numeric tsCol when set.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    // Internal plumbing names — fail loudly rather than silently
    // overwrite user data or build a duplicate-field struct ("_rt"
    // collides with the payload struct's right-timestamp field and
    // makes col("_rf")("_rt") ambiguous).
    require(!valCols.contains("_rt"),
      "valCols may not contain the reserved name _rt")
    val reserved = Seq("_side", "_r", "_rf")
    require(!left.columns.exists(reserved.contains),
      s"left input may not carry reserved columns ${reserved.mkString(", ")}")
    tolerance.foreach { _ =>
      require(right.schema(tsCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tolerance requires a numeric $tsCol (got " +
          s"${right.schema(tsCol).dataType.simpleString}); convert " +
          "timestamps to epoch units first")
    }

    val leftCols = left.columns.toSeq
    // Forward-fill ONE struct of the whole right-row payload, not the
    // value columns independently: the struct is non-null for every
    // right row even when its fields are null, so a matched right row
    // whose value IS null attaches null as-is (true as-of semantics)
    // instead of last(ignoreNulls) skipping it and carrying an older
    // non-null value forward.
    // The matched right row's own timestamp rides along in the struct
    // (field "_rt") so the tolerance check can compare against it after
    // the forward-fill — the fill itself stays tolerance-oblivious (one
    // running value per key, no extra state).
    val rStructType = org.apache.spark.sql.types.StructType(
      valCols.map(c => right.schema(c).copy(name = c)) :+
        right.schema(tsCol).copy(name = "_rt"))
    val lTagged = left
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rStructType))
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("_side"),
        struct(valCols.map(col) :+ col(tsCol).as("_rt"): _*).as("_r")): _*)
    // align schemas: right side lacks the left-only columns
    val rAligned = leftCols.filterNot(c =>
      keyCols.contains(c) || c == tsCol).foldLeft(rTagged) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lTagged.columns.map(col).toIndexedSeq: _*)

    // The trailing `_r` sort term makes ties deterministic: when the
    // right side holds several rows at the same (key, ts), `last`
    // matches the greatest payload struct (max by value columns, in
    // order) instead of a partition-order-dependent row. Left rows
    // carry a null `_r` and sort stably within their (ts, side) group;
    // the fill value is identical for all of them. The oracle mirrors
    // this by collapsing right duplicates to max(value) per (key, ts).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = lTagged.unionByName(rAligned)
      .withColumn("_rf", last(col("_r"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valCols.map { c =>
          val v = col("_rf")(c)
          tolerance match {
            // no match → _rf is null → the condition is null → `when`
            // with no otherwise yields null, same as the no-match case
            case Some(tol) =>
              when(col(tsCol) - col("_rf")("_rt") <= tol, v).as(c + "_asof")
            case None => v.as(c + "_asof")
          }
        }: _*)
  }
}
