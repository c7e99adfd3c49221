package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ExtCommon._

/** Query-time ANN graph search (r12 verdict task 1): the beam walk
  * HNSW/DiskANN-style retrieval actually executes per query at scale,
  * run over the NN-descent-refined kNN graph the suite already builds
  * ([[SimQueries]] `sim_nndescent`). The suite previously BUILT every
  * modern index (IVF/PQ/OPQ, LSH, kNN graph) but never SEARCHED the
  * graph — this is that missing retrieval operator, with its recall
  * twin against the exact ground truth.
  *
  * Walk semantics (fixed so the DuckDB oracle can mirror it move for
  * move): entry points = the members of the query's own IVF cell (the
  * probe-1 candidate set of `sim_ivf`, i.e. "IVF-centroid-nearest"
  * seeding — the SPANN/DiskANN-style cluster-then-graph hybrid); then
  * [[GraphHops]] rounds of {expand the beam over the UNDIRECTED edge
  * set, re-score candidates against the query exactly, keep
  * top-[[GraphBeam]] deterministically (sim DESC, node id)}; final
  * answer = top-3 of the last beam, self-matches excluded. Because
  * every round's candidates include the carried-over beam and scoring
  * is exact, any all-time top-3 node can never be trimmed (at most two
  * nodes outrank it, beam ≫ 3), so the final top-3 is the top-3 of
  * EVERYTHING the walk scored — recall is lower-bounded by probe-1's
  * and the hops add the graph's contribution on top.
  *
  * Scale shape: the adjacency is ≤ 2·3n id pairs (no payloads); each
  * hop's candidate set is ≤ beam·(maxdeg+1) per query, re-attached to
  * vectors by id-keyed joins. Per-query cost = one cell (~n/nlist ≈
  * √n, the same coarse stage every IVF probe pays) + hops·beam·deg
  * CONSTANT graph work — the walk converts IVF's recall knob
  * ("probe more cells", each ~√n candidates) into fixed-budget graph
  * traversal, which is the point of graph retrieval at 100 TB. */
object SimSearchQueries {

  /** Beam width and hop budget of the graph walk — shared by the Spark
    * builder and the interpolated oracle SQL. */
  private[queries] val GraphBeam = 8
  private[queries] val GraphHops = 2

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_graph_search" -> ((s, dir) => graphSearch(s, dir, materialize = true)),

    // Recall@3 of the graph walk vs the exact ground truth on the
    // shared q_id % 10 split — read next to sim_recall (LSH),
    // sim_ivf_recall (probe1/probe2), and sim_nndescent_recall (the
    // graph's own edge recall) for the full index-quality ladder.
    "sim_graph_search_recall" -> ((s, dir) => {
      val exact = ExtQueries.queries("sim_topk")(s, dir)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      val ann = queries("sim_graph_search")(s, dir)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(ann, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("q_id"), col("k"), col("n_hits"),
          Rounding.r6(expr("CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)"))
            .as("recall"))
    }))

  /** The walk itself. `materialize = true` localCheckpoints the
    * adjacency/assignment tables and each beam round (the production
    * shape — every hop re-reads the prior beam twice, and the
    * nndescent chain must never re-run); PlanSpec passes `false` to
    * audit the WHOLE un-truncated walk as one physical plan. */
  private[graft] def graphSearch(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e0 = emb(s, dir)
    val e = cp(e0
      .select(col("vec_id").cast("long").as("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotS("v", "v")})")))
    // Undirected adjacency from the refined kNN graph — id pairs
    // only, checkpointed once, probed by every hop.
    val knn = SimQueries.queries("sim_nndescent")(s, dir)
      .select(col("q_id").as("a"), col("n_id").as("b"))
    val und = cp(knn
      .union(knn.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    val qs = cp(e.filter(col("vec_id") % TopkSplit === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")))
    // Entry points: every member of the query's own coarse-quantizer
    // cell (the sim_ivf probe-1 candidate set) — an equi-join on the
    // cell id over the id+cell assignment, no vector payloads.
    val assigned = cp(assignCells(e, ivfInitCents(e))
      .select(col("vec_id").as("node"), col("cell")))
    val entries = assigned.filter(col("node") % TopkSplit === 0)
      .select(col("node").as("q_id"), col("cell"))
      .join(assigned, "cell")
      .select(col("q_id"), col("node"))
    // Re-attach vectors by id and score a candidate set against its
    // query; candidates per query are beam·(deg+1)-bounded after the
    // entry round, so the array fan-out through the q_id join is a
    // constant per query.
    def score(cand: DataFrame): DataFrame = cand
      .join(e.select(col("vec_id").as("node"), col("v").as("nv"),
        col("nrm").as("nn")), "node")
      .join(qs, "q_id")
      .select(col("q_id"), col("node"),
        expr(s"try_divide(${dotS("qv", "nv")}, qn * nn)").as("sim"))
    def trim(scored: DataFrame): DataFrame = scored
      .withColumn("brank", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, node)"))
      .filter(col("brank") <= GraphBeam)
      .select(col("q_id"), col("node"), col("sim"))
    var beam = cp(trim(score(entries)))
    for (_ <- 1 to GraphHops) {
      val cand = beam.select(col("q_id"), col("node"))
        .join(und, col("node") === col("a"))
        .select(col("q_id"), col("b").as("node"))
        .union(beam.select(col("q_id"), col("node")))
        .distinct()
      beam = cp(trim(score(cand)))
    }
    beam.filter(col("node") =!= col("q_id"))
      .withColumn("rank", expr(
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, node) AS BIGINT)"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("node").as("n_id"), col("rank"),
        Rounding.r6(col("sim")).as("sim"))
  }

  /** Oracle chain: the NN-descent graph ([[SimQueries.nndescentChainDuck]]
    * ending in k2), the probe-1 cell entry set, then the beam walk
    * unrolled hop by hop — each hop a {expand, score, rank, trim} CTE
    * block mirroring the Spark rounds move for move — ending in
    * `gfin(q_id, n_id, rank, sim)`. */
  private val graphSearchChainDuck: String = {
    def hop(r: Int): String =
      s"""gc$r AS (SELECT p.q_id, u.b AS node FROM b${r - 1} p
         |    JOIN und u ON u.a = p.node
         |  UNION SELECT q_id, node FROM b${r - 1}),
         |gs$r AS (SELECT c.q_id, c.node,
         |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
         |  FROM gc$r c JOIN en e ON e.vec_id = c.node
         |  JOIN gq q ON q.q_id = c.q_id),
         |b$r AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM gs$r)
         |  WHERE brank <= $GraphBeam)""".stripMargin
    s"""${SimQueries.nndescentChainDuck},
       |und AS (SELECT a, b FROM k2 UNION SELECT b AS a, a AS b FROM k2),
       |gq AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM en
       |  WHERE vec_id % $TopkSplit = 0),
       |gcn AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM en
       |  WHERE vec_id < $ivfNlistD),
       |gas0 AS (SELECT e.vec_id, c.c_id,
       |    ${dotD("e.v", "c.cv")} / (e.nrm * c.cnrm) AS csim
       |  FROM en e CROSS JOIN gcn c),
       |gasg AS (SELECT vec_id AS node, c_id AS cell FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, c_id) AS crank FROM gas0)
       |  WHERE crank = 1),
       |ge AS (SELECT q.node AS q_id, y.node FROM gasg q
       |  JOIN gasg y ON q.cell = y.cell
       |  WHERE q.node % $TopkSplit = 0),
       |gs0 AS (SELECT g.q_id, g.node,
       |    ${dotD("q.qv", "e.v")} / (q.qn * e.nrm) AS sim
       |  FROM ge g JOIN en e ON e.vec_id = g.node
       |  JOIN gq q ON q.q_id = g.q_id),
       |b0 AS (SELECT q_id, node, sim FROM (SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, node) AS brank FROM gs0)
       |  WHERE brank <= $GraphBeam),
       |${(1 to GraphHops).map(hop).mkString(",\n")},
       |gfin AS (SELECT q_id, node AS n_id, rank, sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, node)::BIGINT AS rank
       |    FROM b$GraphHops WHERE node <> q_id)
       |  WHERE rank <= 3)""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "sim_graph_search" ->
      s"""WITH $graphSearchChainDuck
         |SELECT q_id, n_id, rank, (round(sim, 6) + 0.0) AS sim
         |FROM gfin""".stripMargin,

    "sim_graph_search_recall" ->
      s"""WITH $graphSearchChainDuck,
         |gxs AS (SELECT x.q_id, y.vec_id AS n_id,
         |    ${dotD("x.qv", "y.v")} / (x.qn * y.nrm) AS sim
         |  FROM gq x JOIN en y ON x.q_id <> y.vec_id),
         |gxr AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id)::BIGINT AS rank
         |  FROM gxs),
         |gex AS (SELECT q_id, n_id FROM gxr WHERE rank <= 3)
         |SELECT gex.q_id, count(*)::BIGINT AS k,
         |  sum(CASE WHEN gfin.n_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hits,
         |  (round(sum(CASE WHEN gfin.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) + 0.0) AS recall
         |FROM gex LEFT JOIN gfin
         |  ON gfin.q_id = gex.q_id AND gfin.n_id = gex.n_id
         |GROUP BY gex.q_id""".stripMargin)
}
