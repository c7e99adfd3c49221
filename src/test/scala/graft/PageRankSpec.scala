package graft

import org.apache.spark.sql.functions._

/** [[graft.ext.PageRank]] against a hand-iterated reference on a graph
  * with every structural case: a triangle (cycle), a 2-chain tail, a
  * disconnected pair, and a singleton (dangling — keeps (1-d)/N).
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  test("fixed-iteration ranks match a hand-computed power iteration") {
    // 1-2-3 triangle with a 3-4 tail; 5-6 pair; 7 singleton
    val edgeList = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
    val nodes = (1L to 7L).toDF("id")
    val edges = edgeList.toDF("src", "dst")

    val iters = 5
    val d = 0.85
    val n = 7.0
    val base = (1.0 - d) / n
    val sym = edgeList ++ edgeList.map(_.swap)
    val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.size.toDouble }
    var rank = (1L to 6L).map(_ -> 1.0 / n).toMap // active nodes only
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = rank.keys.map(k => k -> (base + d * in.getOrElse(k, 0.0))).toMap
    }
    val expected = rank + (7L -> base)

    // both the adaptive driver-side path (default: tiny graph) and the
    // forced distributed loop must match the reference iteration
    for (driverMax <- Seq(graft.ext.ConnectedComponents.DriverSolveMaxEdges, 0L)) {
      val got = graft.ext.PageRank(nodes, edges, iters, d, driverMax)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (id, r) =>
        assert(math.abs(r - expected(id)) < 1e-12,
          s"node $id (driverMax=$driverMax): $r vs ${expected(id)}")
      }
    }
    val got = graft.ext.PageRank(nodes, edges, iters, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ranks sum to ~1 minus the mass the dangling variant doesn't
    // redistribute — sanity-check they at least form a distribution core
    assert(got.values.sum > 0.5 && got.values.sum <= 1.0 + 1e-9)
  }

  test("personalized ranks match a hand-seeded iteration on both paths") {
    // Same graph; seeds = {1, 7}: node 7 is an ISOLATED seed (holds
    // (1-d)·1/|S| forever), the 5-6 pair is unreachable from any seed
    // (must hold exactly 0), the triangle+tail drains from node 1.
    val edgeList = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
    val nodes = (1L to 7L).toDF("id")
    val edges = edgeList.toDF("src", "dst")
    val seeds = Seq(1L, 7L).toDF("id")

    val iters = 5
    val d = 0.85
    val sb = 0.5
    val sOf = (k: Long) => if (k == 1L || k == 7L) sb else 0.0
    val sym = edgeList ++ edgeList.map(_.swap)
    val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.size.toDouble }
    var rank = (1L to 7L).map(k => k -> sOf(k)).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = rank.keys.map(k =>
        k -> ((1.0 - d) * sOf(k) + d * in.getOrElse(k, 0.0))).toMap
    }

    for (driverMax <- Seq(graft.ext.ConnectedComponents.DriverSolveMaxEdges, 0L)) {
      val got = graft.ext.PageRank
        .personalized(nodes, edges, seeds, iters, d, driverMax)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == rank.keySet)
      got.foreach { case (id, r) =>
        assert(math.abs(r - rank(id)) < 1e-12,
          s"node $id (driverMax=$driverMax): $r vs ${rank(id)}")
      }
      assert(got(5L) == 0.0 && got(6L) == 0.0, "unreachable pair must be 0")
      assert(math.abs(got(7L) - (1.0 - d) * sb) < 1e-15,
        "isolated seed must hold (1-d)/|S|")
    }
  }
}
