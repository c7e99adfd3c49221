package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming HyperLogLog shard-merge — the streaming face of the batch
  * `sketch_hll_merge`: each micro-batch is a shard whose rows fold into
  * the per-group register table (m=64 registers, the exact formula of
  * `ScaleQueries`' batch sketch: reg = h mod 64, rho = 25 − bitlen of
  * h div 64, raw estimate 0.709·64²/(Σ2^−m + zero-register count)),
  * merged by REGISTER-WISE MAX in `flatMapGroupsWithState`.
  *
  * Register-wise max is commutative, associative AND idempotent — so
  * the final estimate is invariant not only to micro-batch splits (the
  * CMS/quantile property) but to blind row RE-DELIVERY too: replaying
  * any prefix of the stream cannot move a register. That is strictly
  * stronger than StreamingCms' counter addition, which needs the
  * checkpoint replay contract for exactly-once; HLL needs nothing.
  *
  * Scale shape: state is BOUNDED at 64 (register, rho) entries per
  * group whatever the stream length or cardinality — the sketch a
  * 100 TB ingest keeps per (source, day) when exact distincts are too
  * wide to hold. Every 2^−m term is a dyadic rational, exact in
  * double, so the register sum is order-independent bit-for-bit.
  */
object StreamingHll {

  /** Bounded per-group state: register → max rho (≤ 64 entries). */
  final case class HllState(regs: Map[Int, Long])

  /** rho of hash h in the batch sketch's 24-bit space: 25 for v = 0,
    * else 25 − bit-length(v) where v = h div 64 — identical to
    * `sketch_hll`'s `25 - length(bin(v))`. */
  private[graft] def rhoOf(h: Long): Long = {
    val v = h / 64L
    if (v == 0L) 25L else 25L - (64 - java.lang.Long.numberOfLeadingZeros(v))
  }

  /** Raw HLL estimate from a register table (no small-range correction
    * — same contract as the batch sketch). */
  private[graft] def estimate(regs: Map[Int, Long]): Double = {
    val sp = regs.valuesIterator.map(m => math.pow(2.0, -m.toDouble)).sum
    0.709 * 64.0 * 64.0 / (sp + (64 - regs.size).toDouble)
  }

  /** stream (g STRING, h BIGINT — the pre-hashed NON-NEGATIVE id, the
    * caller owns the Knuth multiply like the batch query; a negative h
    * throws rather than corrupting registers) → Update-mode rows
    * (g, n_regs, est_distinct): the merged-register raw estimate after
    * every micro-batch that touched the group. */
  def apply(stream: DataFrame): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("g", "h").as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HllState, (String, Int, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        var regs = state.getOption.map(_.regs).getOrElse(Map.empty[Int, Long])
        rows.foreach { r =>
          // fail loudly on a raw (unhashed) negative long: `% 64` would
          // yield a negative register key and rhoOf a negative rho,
          // silently corrupting state into a plausible-but-wrong
          // estimate (ADVICE r10)
          require(r._2 >= 0L,
            s"StreamingHll requires a non-negative pre-hashed id, got ${r._2}")
          val reg = (r._2 % 64L).toInt
          val rho = rhoOf(r._2)
          if (rho > regs.getOrElse(reg, Long.MinValue))
            regs = regs.updated(reg, rho)
        }
        state.update(HllState(regs))
        Iterator.single((g, regs.size, estimate(regs)))
      }
      .toDF("g", "n_regs", "est_distinct")
  }
}
