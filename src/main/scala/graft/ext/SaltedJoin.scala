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

  /** @param big   probe side; every row gets a per-row shard in [0, salt)
    * @param small build side (replicated `salt`×; keep it small)
    * @param keys  equi-join keys present on both sides
    * @param salt  shard count — hot-key rows spread over this many tasks
    */
  def apply(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // Internal shard column: pick a name no input carries, so a user
    // column named `_salt` is never silently overwritten then dropped.
    val taken = (big.columns ++ small.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"_salt$i")
      .find(n => !taken.contains(n)).get
    // Per-ROW salt — salting by the join key alone would map the hot
    // key to one shard again. Hash every HASHABLE big-side column
    // (MapType fails analysis inside hash(), so map-bearing columns
    // are skipped): the shard is then a pure function of row CONTENT.
    // Determinism matters more than it looks — a partition-id or
    // monotonic-id term changes on partial map-stage retries, and
    // because Spark does not propagate expression nondeterminism to
    // the shuffle's DeterministicLevel, a recomputed task could
    // re-shard rows already consumed by a reducer, duplicating or
    // dropping join output. Identical duplicate rows sharing a shard
    // is the accepted trade.
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val hashable = big.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toSeq
    val saltSource = if (hashable.nonEmpty) hashable else keys.map(col)
    val bigS = big.withColumn(saltCol,
      pmod(hash(saltSource: _*), lit(salt)))
    val smallS = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ saltCol).drop(saltCol)
  }
}
