package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants: no module silently shadows another's query
  * name (Map ++ keeps the later entry — the loser just VANISHES from
  * the suite, which is exactly how a duplicate "ts_sharpe" briefly
  * dropped a query), and every registered query is oracle-gated.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are globally unique across modules") {
    val perModule = SparkEntry.modules.map(_._1.keySet)
    val dups = perModule.flatten
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"shadowed query names: $dups")
    assert(perModule.map(_.size).sum == SparkEntry.queries.size)
  }

  test("oracle names are globally unique across modules") {
    val perModule = SparkEntry.modules.map(_._2.keySet)
    val dups = perModule.flatten
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"shadowed oracle names: $dups")
  }

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
