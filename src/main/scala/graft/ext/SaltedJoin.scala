package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: when one join key carries a disproportionate
  * share of the big side's rows, the task holding that key becomes the
  * straggler (or OOMs) no matter how many executors exist. Salting
  * appends a per-row shard to the big side's key and replicates the
  * small side once per shard, so a hot key's rows spread over `salt`
  * tasks. Row-for-row identical to the plain inner join when the small
  * side's keys are unique per row (each big row meets exactly the one
  * replica carrying its shard).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; this is
  * the explicit, plan-time form — it also works where AQE's splitting
  * doesn't reach (shuffle-hash joins, aggregations-after-join keyed on
  * the salted key), and its shuffle is `salt`× the SMALL side only.
  */
object SaltedJoin {

  /** @param big   probe side; every row gets `_salt = hash(row) % salt`
    * @param small build side (replicated `salt`×; keep it small)
    * @param keys  equi-join keys present on both sides
    * @param salt  shard count — hot-key rows spread over this many tasks
    */
  def apply(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // Per-ROW salt via hash of the whole row — salting by the join key
    // alone would map the hot key to one shard again. Identical rows
    // share a shard, which is harmless (same work, same task).
    val bigS = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }
}
