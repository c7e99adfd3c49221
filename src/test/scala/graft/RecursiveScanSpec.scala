package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ind.RecursiveIndicators

/** Pure-function tests of the R1-R4 scan (no Spark) — SURVEY.md §5.1:
  * warm-up boundaries, scaled bounds, and degenerate-series identities.
  */
class RecursiveScanSpec extends AnyFunSuite {

  private def series(f: Int => Double, n: Int): Array[Double] =
    Array.tabulate(n)(f)

  private def run(close: Array[Double],
      high: Array[Double] = null,
      low: Array[Double] = null): Array[Array[Any]] = {
    val h = if (high != null) high else close.map(_ + 1.0)
    val l = if (low != null) low else close.map(_ - 1.0)
    RecursiveIndicators.scan(close, h, l, close)
  }

  private val idx = Map("rsi" -> 0, "cmo" -> 1, "macd_hist" -> 2,
    "adx" -> 3, "adx_hist" -> 4)

  test("warm-up boundaries match TA-Lib lookbacks") {
    val out = run(series(i => 100.0 + math.sin(i * 0.7) * 3 + i * 0.1, 60))
    // rsi/cmo first at row 14; adx_hist at 14; adx at 27; macd_hist at 33
    assert(out(13)(idx("rsi")) == null && out(14)(idx("rsi")) != null)
    assert(out(13)(idx("cmo")) == null && out(14)(idx("cmo")) != null)
    assert(out(13)(idx("adx_hist")) == null && out(14)(idx("adx_hist")) != null)
    assert(out(26)(idx("adx")) == null && out(27)(idx("adx")) != null)
    assert(out(32)(idx("macd_hist")) == null && out(33)(idx("macd_hist")) != null)
  }

  test("scaled bounds hold on a noisy series") {
    val out = run(series(i => 50.0 + math.sin(i * 1.3) * 10 + (i % 7), 120))
    out.foreach { r =>
      Option(r(0)).foreach(v => { val d = v.asInstanceOf[Double]; assert(d >= 0 && d <= 1) })
      Option(r(1)).foreach(v => { val d = v.asInstanceOf[Double]; assert(d >= -1 && d <= 1) })
      Option(r(3)).foreach(v => { val d = v.asInstanceOf[Double]; assert(d >= 0 && d <= 1) })
      Option(r(4)).foreach(v => { val d = v.asInstanceOf[Double]; assert(d >= -1 && d <= 1) })
    }
  }

  test("monotone rise pins rsi and cmo to 1, adx_hist positive") {
    val out = run(series(i => 100.0 + i, 50))
    assert(out(20)(idx("rsi")).asInstanceOf[Double] === 1.0)
    assert(out(20)(idx("cmo")).asInstanceOf[Double] === 1.0)
    assert(out(20)(idx("adx_hist")).asInstanceOf[Double] > 0)
  }

  test("monotone fall pins rsi to 0, cmo to -1") {
    val out = run(series(i => 100.0 - i * 0.5, 50))
    assert(out(20)(idx("rsi")).asInstanceOf[Double] === 0.0)
    assert(out(20)(idx("cmo")).asInstanceOf[Double] === -1.0)
  }

  test("constant series: zero-denominator convention (TA-Lib outputs 0)") {
    val c = series(_ => 42.0, 50)
    val out = RecursiveIndicators.scan(c, c, c, c) // high=low=close → TR=0
    assert(out(20)(idx("rsi")).asInstanceOf[Double] === 0.0)
    assert(out(20)(idx("cmo")).asInstanceOf[Double] === 0.0)
    assert(out(40)(idx("macd_hist")).asInstanceOf[Double] === 0.0)
    assert(out(40)(idx("adx")).asInstanceOf[Double] === 0.0)
    assert(out(20)(idx("adx_hist")).asInstanceOf[Double] === 0.0)
  }

  test("config-driven periods shift the warm-up boundary (reference config surface)") {
    val cfg = graft.model.IndicatorConfig(rsiPeriod = 7, cmoPeriod = 7, adxPeriod = 10)
    val c = series(i => 100.0 + math.sin(i * 0.7) * 3, 60)
    val out = RecursiveIndicators.scan(c, c.map(_ + 1), c.map(_ - 1), c, cfg)
    assert(out(6)(idx("rsi")) == null && out(7)(idx("rsi")) != null)   // p=7
    assert(out(9)(idx("adx_hist")) == null && out(10)(idx("adx_hist")) != null) // q=10
    assert(out(18)(idx("adx")) == null && out(19)(idx("adx")) != null) // 2q-1=19
  }

  test("mismatched rsi/cmo periods are rejected (shared Wilder state)") {
    intercept[IllegalArgumentException] {
      RecursiveIndicators.scan(Array(1.0, 2.0), Array(2.0, 3.0),
        Array(0.0, 1.0), Array(1.0, 2.0),
        graft.model.IndicatorConfig(rsiPeriod = 14, cmoPeriod = 9))
    }
  }

  test("wilder smoothing: rsi reacts to a single spike then decays") {
    val base = series(i => 100.0 + (i % 3) * 0.5, 80)
    base(40) = 120.0 // one large gain
    val out = run(base)
    val before = out(39)(idx("rsi")).asInstanceOf[Double]
    val at = out(40)(idx("rsi")).asInstanceOf[Double]
    val later = out(60)(idx("rsi")).asInstanceOf[Double]
    assert(at > before)
    assert(later < at) // state decays, not a frame cliff
  }
}
