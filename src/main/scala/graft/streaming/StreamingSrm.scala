package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Continuous sample-ratio-mismatch monitoring — the streaming face of
  * the batch `ab_srm` gate: per metric surface (event_type), bounded
  * (n_a, n_b, p_min) state accumulates exposure counts per arm and
  * holds the RUNNING MINIMUM of an always-valid mixture-SPRT p-value,
  * so the monitor can be read after every micro-batch without any
  * peeking penalty — "significant once, significant forever", the same
  * Robbins/mixture form (τ² = 1) as the batch `ab_sequential`.
  *
  * Statistic: arm indicators are ±1 increments, d = (n_a − n_b)/n is
  * their mean (0 under the designed 50/50 split), se² = 1/n, and
  * p = min(1, √((se²+1)/se²) · exp(−d²/(2·se²·(se²+1)))). The
  * classical χ² = (n_a−n_b)²/(n_b+n_a) is emitted alongside for the
  * dashboard; the DECISION column is the always-valid running-min p.
  *
  * Determinism: the state transition is pure counting (commutative —
  * no within-batch sort needed, unlike SpaceSaving), and p is computed
  * once per batch from the exact integer counts, so the emitted rows
  * are a deterministic function of the batch split alone.
  *
  * Scale shape: state is THREE numbers per event_type whatever the
  * stream length; each batch emits one row per touched group.
  */
object StreamingSrm {

  /** Bounded per-group state: arm counts + running-min p. */
  final case class SrmState(nA: Long, nB: Long, pMin: Double)

  /** The always-valid mixture p from exact arm counts — shared by the
    * streaming fold and the spec's driver-side reference replay. */
  private[graft] def mixtureP(nA: Long, nB: Long): Double = {
    val n = (nA + nB).toDouble
    if (n <= 0) 1.0
    else {
      val d = (nA - nB).toDouble / n
      val se2 = 1.0 / n
      math.min(1.0,
        math.sqrt((se2 + 1.0) / se2) *
          math.exp(-(d * d) / (2.0 * se2 * (se2 + 1.0))))
    }
  }

  /** stream (g STRING, arm INT — one row per exposure event) →
    * Update-mode rows (g, n_a, n_b, chi2, p_seq, p_min, srm): the
    * state of every touched group after each micro-batch. */
  def apply(stream: DataFrame): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream.selectExpr("g", "arm").as[(String, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SrmState,
          (String, Long, Long, Double, Double, Double, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        var (nA, nB, pMin) = state.getOption
          .map(st => (st.nA, st.nB, st.pMin)).getOrElse((0L, 0L, 1.0))
        rows.foreach { r => if (r._2 == 0) nA += 1L else nB += 1L }
        val p = mixtureP(nA, nB)
        pMin = math.min(pMin, p)
        state.update(SrmState(nA, nB, pMin))
        val chi2 =
          if (nA + nB == 0) 0.0
          else ((nA - nB) * (nA - nB)).toDouble / (nA + nB).toDouble
        Iterator.single((g, nA, nB, chi2, p, pMin, pMin < 0.05))
      }
      .toDF("g", "n_a", "n_b", "chi2", "p_seq", "p_min", "srm")
  }
}
