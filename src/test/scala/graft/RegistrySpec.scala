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

  test("no oracle SQL line starts with a single pipe (double-stripMargin)") {
    // A pre-stripped fragment interpolated into a string that calls
    // .stripMargin AGAIN loses one '|' from any line-leading '||' —
    // turning SQL string-concat into bitwise OR. That exact bug shipped
    // three broken tok_unigram oracles in r11 (DuckDB binder error
    // "No function matches '|(BIGINT[], BIGINT[])'"). No final oracle
    // should ever have a line starting with a lone pipe.
    val lonePipe = "(?m)^\\s*\\|(?!\\|)".r
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if lonePipe.findFirstIn(sql).isDefined =>
        val line = sql.linesIterator
          .find(l => lonePipe.findFirstIn(l).isDefined).getOrElse("")
        s"$name: '$line'"
    }
    assert(bad.isEmpty, s"oracle SQL with line-leading single '|': $bad")
  }
}
