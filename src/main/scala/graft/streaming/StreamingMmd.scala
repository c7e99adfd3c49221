package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming embedding-drift monitor — the deployment shape of the
  * batch `emb_mmd_poly`: a REFERENCE corpus' degree-2 feature-map
  * moments (E[xxᵀ] upper triangle + E[x], micro-quantized longs) are
  * computed once and carried into the state function; each monitored
  * group folds its own moment sums in `flatMapGroupsWithState` and
  * emits its MMD² against the reference after every micro-batch.
  * Alert when a shard's MMD² leaves the null band the batch query
  * calibrates.
  *
  * Moment SUMS are commutative/associative longs, so the estimate
  * after all rows arrive is invariant to micro-batch splits (the
  * StreamingCms property; pinned by StreamingSpec against the same
  * formula computed over all rows at once). State is BOUNDED at
  * d(d+1)/2 + d + 1 cells per group (2145 longs at d = 64) whatever
  * the stream length — the monitor a 100 TB ingest keeps per source.
  *
  * Float discipline: per-row products are micro-quantized with the
  * batch query's exact formula; the final MMD² folds the delta terms
  * in ascending (i, j) key order so the double sum is deterministic.
  */
object StreamingMmd {

  /** Reference moments: micro-quantized sums keyed by (i, j) — j = 0
    * rows are the linear moments — plus the row count. Build with
    * [[momentsOf]] on the reference corpus (bounded: 2144 cells). */
  final case class RefMoments(sums: Map[(Int, Int), Long], n: Long)

  /** Bounded per-group state: the group's own moment sums + count. */
  final case class MmdState(sums: Map[(Int, Int), Long], n: Long)

  /** Per-row micro-quantized feature-map terms of vector v — the batch
    * query's formula: (i, 0) → round(vᵢ·10⁶); (i, j ≥ i) →
    * round(vᵢvⱼ·10⁶). */
  private[graft] def rowTerms(v: Array[Double])
      : Iterator[((Int, Int), Long)] = {
    val d = v.length
    val lin = Iterator.tabulate(d)(k =>
      ((k + 1, 0), math.round(v(k) * 1e6)))
    val quad = for {
      i <- Iterator.range(0, d)
      j <- Iterator.range(i, d)
    } yield ((i + 1, j + 1), math.round(v(i) * v(j) * 1e6))
    lin ++ quad
  }

  /** Driver-side moment build over a bounded reference sample (the
    * static side a deployment computes once per day). */
  def momentsOf(vs: Seq[Array[Double]]): RefMoments = {
    var m = Map.empty[(Int, Int), Long]
    vs.foreach(v => rowTerms(v).foreach { case (k, t) =>
      m = m.updated(k, m.getOrElse(k, 0L) + t)
    })
    RefMoments(m, vs.length.toLong)
  }

  /** MMD² between two moment-sum tables (the batch query's delta
    * formula: micro-means, w = 1 diagonal / 2 off-diagonal and linear,
    * per-term 10¹² quantization, ascending-key fold). */
  private[graft] def mmd2(a: Map[(Int, Int), Long], na: Long,
      b: Map[(Int, Int), Long], nb: Long): Double = {
    if (na == 0L || nb == 0L) return Double.NaN
    val keys = (a.keySet ++ b.keySet).toSeq.sorted
    var acc = 0L
    keys.foreach { case k @ (i, j) =>
      val d = a.getOrElse(k, 0L).toDouble / 1e6 / na.toDouble -
        b.getOrElse(k, 0L).toDouble / 1e6 / nb.toDouble
      val w = if (j == 0) 2.0 else if (i == j) 1.0 else 2.0
      acc += math.round(w * d * d * 1e12)
    }
    acc.toDouble / 1e12
  }

  /** stream (g STRING, v ARRAY<DOUBLE>) → Update-mode rows
    * (g, n, mmd2): the group's drift against `ref` after every
    * micro-batch that touched it. */
  def apply(stream: DataFrame, ref: RefMoments): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("g", "v").as[(String, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MmdState, (String, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        var st = state.getOption.getOrElse(
          MmdState(Map.empty[(Int, Int), Long], 0L))
        var sums = st.sums
        var n = st.n
        rows.foreach { r =>
          n += 1L
          rowTerms(r._2).foreach { case (k, t) =>
            sums = sums.updated(k, sums.getOrElse(k, 0L) + t)
          }
        }
        state.update(MmdState(sums, n))
        Iterator.single((g, n, mmd2(sums, n, ref.sums, ref.n)))
      }
      .toDF("g", "n", "mmd2")
  }
}
