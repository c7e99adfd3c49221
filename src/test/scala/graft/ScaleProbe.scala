package graft
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.EventBars.minuteBars(spark, "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(30)
    val big = base.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .withColumn("ticker", concat(col("ticker"), lit("_"), col("rep"))).drop("rep")
    big.write.mode("overwrite").parquet("/tmp/scale_bars")
    val bars = spark.read.parquet("/tmp/scale_bars")
    println("ROWS=" + bars.count())
    def run(): Long = {
      val sz = graft.etl.Sessionize(bars, "ticker", "ws", Seq(60000000L, 120000000L, 180000000L))
      val dz = graft.etl.Densify(sz.drop("event_id"), Seq("ticker","island","sub_ticker"), "ws", 60000000L)
      val ip = graft.etl.Interpolate(dz, Seq("ticker","island"), "ws", Seq("open","high","low","close","volume"))
      val fi = graft.ind.FrameIndicators.addAll(ip, Seq("ticker","island"), Seq("ws"))
      graft.functions.GraftFunctions.register(spark)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ticker","island").orderBy("ws")
      fi.withColumn("_x", expr("graft_ind_w(close, high, low, close)").over(w))
        .select(col("ticker"), col("ws"), col("_x.rsi"), col("_x.adx"))
        .queryExecution.toRdd.count()
    }
    run() // warm
    val t0 = System.nanoTime()
    val n = run()
    println("OUT_ROWS=" + n + " SEC=" + (System.nanoTime()-t0)/1e9)

    // Dedup/similarity family at `reps`× the sf0.1 corpus: replicated
    // docs salt their text so signatures stay distinct (the shape under
    // test is the no-shuffle simhash projection and the banded LSH
    // equi-join, not a degenerate all-identical corpus).
    graft.functions.GraftFunctions.register(spark)
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs0.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") * reps + col("rep"))
      .withColumn("text", concat(col("text"), lit(" salt"), col("rep")))
      .drop("rep")
      .write.mode("overwrite").parquet("/tmp/scale_docs/documents.parquet")
    val nd = spark.read.parquet("/tmp/scale_docs/documents.parquet").count()
    def timeQ(name: String): Double = {
      val t = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, "/tmp/scale_docs")
        .queryExecution.toRdd.count()
      (System.nanoTime() - t) / 1e9
    }
    timeQ("dedup_simhash") // warm
    println(f"DOCS=$nd SIMHASH_SEC=${timeQ("dedup_simhash")}%.2f " +
      f"MINHASH_LSH_SEC=${timeQ("dedup_minhash_lsh")}%.2f " +
      f"EXACT_SEC=${timeQ("dedup_exact")}%.2f")

    // Bloom decontamination at reps× docs: the held-out side grows
    // with the corpus here (worst case — real benchmarks are fixed
    // size), so this bounds the broadcast build; the probe also
    // re-checks the no-false-negative invariant (n_exact ≤ n_bloom on
    // every row) at a scale the DuckDB oracle never sees.
    val tB = System.nanoTime()
    val bloomDf = graft.SparkEntry.queries("text_bloom_contam")(
      spark, "/tmp/scale_docs")
    val bloomBad = bloomDf.where(col("n_exact") > col("n_bloom")).count()
    val secB = (System.nanoTime() - tB) / 1e9
    println(f"BLOOM_SEC=$secB%.2f BLOOM_FN_OK=${bloomBad == 0L}")

    // Exact prefix-filtered jaccard join (dedup_allpairs) at reps×
    // docs: every replica's TOKENS are rep-salted, so cross-replica
    // shingles are disjoint — the probe measures candidate-generation
    // scale (prefix join + length filter), not an output explosion of
    // replica near-dup cliques. Expected pair count = reps × the
    // original corpus' pair count; the count printed pins that the
    // filter chain stayed lossless at a scale the oracle can't reach.
    docs0.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") * reps + col("rep"))
      .withColumn("text", concat_ws(" ", expr(
        "transform(filter(split(text, ' '), t -> t <> ''), " +
          "t -> concat(t, CAST(rep AS STRING)))")))
      .drop("rep")
      .write.mode("overwrite").parquet("/tmp/scale_docs_pp/documents.parquet")
    val basePairs = graft.SparkEntry.queries("dedup_allpairs")(
      spark, "/root/testdata/sf0.1").count()
    val tP = System.nanoTime()
    val nPairs = graft.SparkEntry.queries("dedup_allpairs")(
      spark, "/tmp/scale_docs_pp").count()
    val secP = (System.nanoTime() - tP) / 1e9
    println(f"ALLPAIRS_SEC=$secP%.2f ALLPAIRS_PAIRS=$nPairs " +
      f"ALLPAIRS_LOSSLESS_OK=${nPairs == reps * basePairs}")

    // Connected components at corpus scale: 1M nodes — 100k of them in
    // 25k TRUE 4-cliques (all 6 intra-group edges, the LSH shape where
    // every member sees the min directly) plus 1k length-10 chains
    // (worst-case diameter for the label walk). Probes that round count
    // stays diameter-bounded and per-round cost is edge-proportional,
    // not node-proportional (singletons — ~89% here — never iterate).
    val nNodes = 1000000L
    val nodes = spark.range(nNodes).select(col("id"))
    val cliques = spark.range(25000L).select(col("id").as("g"))
      .select(explode(expr(
        "flatten(transform(sequence(0, 2), i -> transform(sequence(i + 1, 3), " +
          "j -> struct(g*4 + i AS src, g*4 + j AS dst))))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    val chains = spark.range(1000L).select((col("id") * 10L + 200000L).as("b"))
      .select(explode(expr(
        "transform(sequence(0, 8), i -> struct(b + i AS src, b + i + 1 AS dst))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    val tcc = System.nanoTime()
    val ncc = graft.ext.ConnectedComponents(nodes, cliques.union(chains))
      .where(col("id") =!= col("lbl")).count()
    println(f"CC_NODES=$nNodes CC_LABELED=$ncc CC_SEC=${(System.nanoTime()-tcc)/1e9}%.2f")

    // Event-stream family at `reps`× the sf0.1 events: replicated users
    // keep per-user funnel state bounded; extra rows per minute raise
    // spike counts, stressing the range join's interval fan-out.
    val ev0 = graft.queries.EventBars.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev0.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .withColumn("user_id", col("user_id") * reps + col("rep"))
      .withColumn("event_id", col("event_id") * reps + col("rep"))
      .drop("rep")
      .write.mode("overwrite").parquet("/tmp/scale_events/events.parquet")
    val nEv = spark.read.parquet("/tmp/scale_events/events.parquet").count()
    def timeE(name: String): Double = {
      val t = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, "/tmp/scale_events")
        .queryExecution.toRdd.count()
      (System.nanoTime() - t) / 1e9
    }
    timeE("agg_funnel") // warm
    println(f"EVENTS=$nEv FUNNEL_SEC=${timeE("agg_funnel")}%.2f " +
      f"RANGE_JOIN_SEC=${timeE("join_range_points")}%.2f " +
      f"ASOF_SEC=${timeE("asof_tolerance")}%.2f")

    // Vector ML family at 20× the sf0.1 embeddings (40k × 64d):
    // k-means stays broadcast-centroid shaped; PCA's covariance
    // accumulates per-partition long arrays (d²·partitions shuffled
    // rows), so vector count scales the scan, not the shuffle.
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb0.crossJoin(spark.range(20).select(col("id").as("rep")))
      .withColumn("vec_id", col("vec_id") * 20 + col("rep"))
      .drop("rep")
      .write.mode("overwrite").parquet("/tmp/scale_emb/embeddings.parquet")
    val nV = spark.read.parquet("/tmp/scale_emb/embeddings.parquet").count()
    def timeV(name: String): Double = {
      val t = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, "/tmp/scale_emb")
        .queryExecution.toRdd.count()
      (System.nanoTime() - t) / 1e9
    }
    timeV("emb_kmeans") // warm
    println(f"VECTORS=$nV KMEANS_SEC=${timeV("emb_kmeans")}%.2f " +
      f"PCA1_SEC=${timeV("emb_pca1")}%.2f " +
      f"IVF_SEC=${timeV("sim_ivf")}%.2f " +
      f"KNN_GRAPH_SEC=${timeV("sim_knn_graph")}%.2f")

    // Distributed exact rank at reps× lineitem: bin_equidepth's full
    // total-order rank through DistRank — the shape that replaced the
    // single-partition ntile. The exact-equi-depth invariant (bucket
    // sizes sum to n and differ by ≤ 1) holds ONLY if the two-pass
    // rank is globally exact, so it doubles as a correctness check at
    // a scale the oracle can't reach.
    val li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li0.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .withColumn("l_orderkey", col("l_orderkey") * reps + col("rep"))
      .drop("rep")
      .write.mode("overwrite").parquet("/tmp/scale_li/lineitem.parquet")
    val nL = spark.read.parquet("/tmp/scale_li/lineitem.parquet").count()
    val tR = System.nanoTime()
    val bins = graft.SparkEntry.queries("bin_equidepth")(spark, "/tmp/scale_li")
      .select(col("bin"), col("n_rows")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val secR = (System.nanoTime() - tR) / 1e9
    println(f"RANK_ROWS=$nL RANK_SEC=$secR%.2f BINS=${bins.size} " +
      f"SUM_OK=${bins.values.sum == nL} " +
      f"EQUIDEPTH_OK=${bins.values.max - bins.values.min <= 1}")

    // DistRank under a 90%-duplicate leading key: approxQuantile bounds
    // collapse around the hot value, so ~90% of rows share ONE bucket —
    // the documented balance degradation (the hot bucket's window task
    // sorts ~0.9n rows). Ranks stay EXACT regardless: the closed-form
    // invariants (max rank = n, sum of ranks = n(n+1)/2) check the
    // whole permutation. MAX_BUCKET_SHARE is the number to watch if a
    // future change claims to fix balance under duplicates.
    val nS = 4000000L
    val skewed = spark.range(nS).select(col("id"),
      when(col("id") % 10 < 9, lit(42.0))
        .otherwise(col("id").cast("double")).as("k"))
      .localCheckpoint()
    val tS = System.nanoTime()
    val rk = graft.queries.DistRank.rowNumber(
      skewed, "_rk", col("k"), Seq(col("k"), col("id")))
    val agg = rk.df.agg(max(col("_rk")), sum(col("_rk"))).collect()(0)
    val secS = (System.nanoTime() - tS) / 1e9
    // hot-bucket share ≈ duplicate fraction by construction
    val hot = skewed.filter(col("k") === 42.0).count()
    println(f"SKEW_ROWS=$nS SKEW_SEC=$secS%.2f " +
      f"MAX_RANK_OK=${agg.getLong(0) == nS} " +
      f"RANK_SUM_OK=${agg.getLong(1) == nS * (nS + 1) / 2} " +
      f"MAX_BUCKET_SHARE=${hot.toDouble / nS}%.3f")

    // Grouped exact quantiles at reps× lineitem (3-value group key):
    // the range-bucketed grouped() vs the whole-group-window
    // groupedLocal() must agree BIT-FOR-BIT at a scale the DuckDB
    // oracle can't reach — and grouped()'s largest task stays ~n/P
    // rows while groupedLocal() funnels n/3 through one task.
    val liS = spark.read.parquet("/tmp/scale_li/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
    val tQ = System.nanoTime()
    val qDist = graft.queries.ExactQuantile.grouped(
      liS, "l_returnflag", "v", Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val secQd = (System.nanoTime() - tQ) / 1e9
    val tQ2 = System.nanoTime()
    val qLocal = graft.queries.ExactQuantile.groupedLocal(
      liS, "l_returnflag", "v", Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val secQl = (System.nanoTime() - tQ2) / 1e9
    println(f"GQUANT_ROWS=$nL GQUANT_DIST_SEC=$secQd%.2f " +
      f"GQUANT_LOCAL_SEC=$secQl%.2f BITEQ_OK=${qDist == qLocal}")

    // Mergeable quantile sketch at reps× lineitem (≥ 6M rows at
    // reps=30): the bottom-K sample's measured max rank error must
    // stay in the ~1/(2·√K) ≈ 2% envelope as n grows — the sketch's
    // whole claim is that error depends on K, not on n.
    val tSk = System.nanoTime()
    val skErr = graft.SparkEntry.queries("sketch_quantile")(
      spark, "/tmp/scale_li")
      .agg(max(col("max_rank_err"))).collect()(0).getDouble(0)
    println(f"SKETCHQ_ROWS=$nL SKETCHQ_SEC=${(System.nanoTime()-tSk)/1e9}%.2f " +
      f"SKETCHQ_MAX_RANK_ERR=$skErr%.4f ERR_OK=${skErr <= 0.05}")

    // IVF(-PQ) coarse-quantizer candidate mass at 1×/10×/40× vectors:
    // with the adaptive nlist (~√n cells) the same-cell candidate
    // pairs per query grow ~√n — the fixed-16-cell quantizer's n/16
    // per query (n²/16 total, printed alongside) is what the adaptive
    // formula replaces. Assignment is recomputed with the engine's
    // exact expressions (graft_dot + deterministic lowest-id
    // centroids); the printed ratio ADAPT/FIXED16 is the pruning the
    // sim_ivf_pq ADC join gains at each scale.
    for (r <- Seq(1, 10, 40)) {
      // Replicas get a deterministic per-rep direction perturbation
      // (±0.22 per dim vs the corpus' ~0.125 dim stddev): EXACT
      // duplicates all land in one cell and would measure duplication
      // concentration, not quantizer scaling.
      val src = if (r == 1) "/root/testdata/sf0.1/embeddings.parquet"
        else { emb0.crossJoin(spark.range(r).select(col("id").as("rep")))
          .withColumn("vec_id", col("vec_id") * r + col("rep"))
          .withColumn("embedding", expr(
            "transform(embedding, (x, i) -> CAST(x + " +
              "((rep*131 + i*31) % 23 - 11) * 0.02D AS FLOAT))"))
          .drop("rep")
          .write.mode("overwrite")
          .parquet(s"/tmp/scale_ivf_$r/embeddings.parquet")
          s"/tmp/scale_ivf_$r/embeddings.parquet" }
      val ev = spark.read.parquet(src)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
        .localCheckpoint()
      val nVec = ev.count()
      val sq = math.floor(math.sqrt(nVec.toDouble)).toLong
      var nlist = 16L
      while (nlist < sq && nlist < 4096L) nlist <<= 1
      def cellMass(k: Long): Long = {
        val cents = ev.filter(col("vec_id") < k)
          .select(col("vec_id").as("c_id"), col("v").as("cv"),
            col("nrm").as("cnrm"))
        val sizes = ev.crossJoin(broadcast(cents))
          .withColumn("csim", expr("try_divide(graft_dot(v, cv), nrm * cnrm)"))
          .withColumn("crank", expr(
            "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id)"))
          .filter(col("crank") === 1)
          .groupBy("c_id").agg(count(lit(1)).as("s"))
        sizes.agg(sum(expr("s * (s - 1)"))).collect()(0).getLong(0)
      }
      val mAdapt = cellMass(nlist)
      val mFixed = cellMass(16L)
      println(f"IVF_VECTORS=$nVec NLIST=$nlist CAND_ADAPT=$mAdapt " +
        f"CAND_FIXED16=$mFixed PRUNE_X=${mFixed.toDouble / mAdapt}%.1f")
    }

    // Trained coarse quantizer at 1×/10×: the Lloyd iteration's effect
    // on candidate mass (Σ s·(s−1)) and on the WORST cell (the
    // straggler task in the per-cell join) vs the untrained
    // lowest-id-centroid quantizer, via the engine's own
    // ivfKmeansIndex chain (sample-trained, broadcast-assigned).
    for (r <- Seq(1, 10)) {
      val src = if (r == 1) "/root/testdata/sf0.1/embeddings.parquet"
        else s"/tmp/scale_ivf_$r/embeddings.parquet"
      val ev = spark.read.parquet(src)
        .select(col("vec_id").cast("long").as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (_, trained) = graft.queries.ExtCommon.ivfKmeansIndex(ev)
      val tSizes = trained.groupBy("cell").agg(count(lit(1)).as("s"))
        .agg(sum(expr("s * (s - 1)")).as("m"), max(col("s")).as("mx"))
        .collect()(0)
      // init side reuses the ENGINE's own init quantizer + aggregate
      // assignment (ivfInitCents/assignCells) — the probe must measure
      // the quantizer the engine ships, not a drifting copy.
      val en = ev.withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      val iSizes = graft.queries.ExtCommon.assignCells(en,
          graft.queries.ExtCommon.ivfInitCents(en))
        .groupBy("cell").agg(count(lit(1)).as("s"))
        .agg(sum(expr("s * (s - 1)")).as("m"), max(col("s")).as("mx"))
        .collect()(0)
      println(f"TRAINKM_VECTORS=${ev.count()} " +
        f"CAND_INIT=${iSizes.getLong(0)} CAND_TRAIN=${tSizes.getLong(0)} " +
        f"MAXCELL_INIT=${iSizes.getLong(1)} MAXCELL_TRAIN=${tSizes.getLong(1)} " +
        f"TRAIN_SEC=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // Exact-substring dedup at reps× docs (the replicated corpus IS
    // the dup-heavy ingest shape): times the ownership argmin + span
    // removal and reports the removed token mass — at 30× every
    // replica beyond a shingle's first occurrence loses those spans,
    // so removed_frac should approach (reps−1)/reps on the replicated
    // mass. Shuffle stays (hash, id) pairs; text rides only the final
    // id-keyed join (the PlanSpec pin at any scale).
    {
      val tSub = System.nanoTime()
      val sub = graft.SparkEntry.queries("dedup_substring")(
        spark, "/tmp/scale_docs")
        .agg(sum(col("n_toks")).as("nt"), sum(col("n_removed")).as("nr"))
        .collect()(0)
      println(f"SUBSTR_DOCS=$nd SUBSTR_TOKS=${sub.getLong(0)} " +
        f"SUBSTR_REMOVED_FRAC=${sub.getLong(1).toDouble / sub.getLong(0)}%.3f " +
        f"SUBSTR_SEC=${(System.nanoTime() - tSub) / 1e9}%.2f")
    }

    // Content-defined chunking at reps× docs: the chunk-key dedup is
    // one (doc, chunk)-keyed fold + one key-keyed count — shuffles
    // carry ids and longs only. Replicas share every chunk, so dup
    // chunk mass should approach 1 at high reps (each chunk occurs
    // reps× plus intra-corpus repeats).
    {
      val tC = System.nanoTime()
      val cdc = graft.SparkEntry.queries("text_cdc_chunks")(
        spark, "/tmp/scale_docs")
        .agg(sum(col("n_chunks")).as("nc"), sum(col("n_dup_chunks")).as("nd"),
          sum(col("n_toks")).as("nt"), sum(col("dup_toks")).as("dt"))
        .collect()(0)
      println(f"CDC_CHUNKS=${cdc.getLong(0)} " +
        f"CDC_DUP_FRAC=${cdc.getLong(1).toDouble / cdc.getLong(0)}%.3f " +
        f"CDC_DUPTOK_FRAC=${cdc.getLong(3).toDouble / cdc.getLong(2)}%.3f " +
        f"CDC_SEC=${(System.nanoTime() - tC) / 1e9}%.2f")
    }

    // Hybrid-retrieval lexical side at reps× docs: the df·4 ≤ n
    // stopword cut is the claimed flood-token defense — without it
    // every stopword fans its WHOLE posting list to every query that
    // contains it. The probe runs the REAL cut posting join (timing +
    // row count) and computes the uncut mass analytically
    // (Σ df(tok) over query tokens, minus the self matches —
    // materializing it would be the accident the cut prevents).
    // CUT_EXACT_OK pins the analytic formula against the actual join,
    // so the reported flood ratio is trustworthy.
    {
      val tH = System.nanoTime()
      val (nDocs, qtRows, cutActual, cutAnalytic, noCut) =
        graft.queries.ExtCommon.hybridLexCandidateMass(spark, "/tmp/scale_docs")
      println(f"HYBRID_DOCS=$nDocs HYBRID_QTOKS=$qtRows " +
        f"CAND_CUT=$cutActual CAND_NOCUT=$noCut " +
        f"CUT_EXACT_OK=${cutActual == cutAnalytic} " +
        f"FLOOD_RATIO=${noCut.toDouble / math.max(1L, cutActual)}%.1f " +
        f"HYBRID_SEC=${(System.nanoTime() - tH) / 1e9}%.2f")
    }

    // Distributed SCC peel (driver cutover forced off) on a 1M-node
    // digraph: 25k directed 4-cycles (true SCCs — one outer round) +
    // 1k id-ASCENDING 10-chains (the documented worst case: each
    // round assigns only the chain heads, so the peel runs ~10 outer
    // rounds with inner fixpoints — bounded by chain length, not
    // graph size). Correctness pin: exactly 75k non-self labels (3 per
    // 4-cycle), chains and singletons label themselves.
    {
      val nScc = 1000000L
      val sccNodes = spark.range(nScc).select(col("id"))
      val cyc2 = spark.range(25000L).select(col("id").as("g"))
        .select(explode(expr("transform(sequence(0, 3), " +
          "i -> struct(g*4 + i AS src, g*4 + pmod(i + 1, 4) AS dst))")).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val chains2 = spark.range(1000L).select((col("id") * 10L + 200000L).as("b"))
        .select(explode(expr(
          "transform(sequence(0, 8), i -> struct(b + i AS src, b + i + 1 AS dst))")).as("e"))
        .select(col("e.src"), col("e.dst"))
      val tScc = System.nanoTime()
      val scc = graft.ext.StronglyConnectedComponents(
        sccNodes, cyc2.union(chains2), driverMaxEdges = 0)
        .localCheckpoint()
      val nonSelf = scc.where(col("id") =!= col("scc_id")).count()
      println(f"SCC_NODES=$nScc SCC_NONSELF=$nonSelf " +
        f"SCC_OK=${nonSelf == 75000L} " +
        f"SCC_SEC=${(System.nanoTime() - tScc) / 1e9}%.2f")
    }
    pipelineRangeProbe(spark)
    nndescentProbe(spark)
    spark.stop()
  }

  /** NN-descent at 1×/30× the sf0.1 vectors: the claim is near-linear
    * wall in n — candidate generation is k²-bounded per node and the
    * bucket init's adaptive plane count keeps bucket pairs ~64·n.
    * Replicas perturb by a rep-dependent epsilon (distinct vectors,
    * real top-3 work) and keep ids dense for the ring init. Runnable
    * standalone via [[NnDescentProbe]]. */
  def nndescentProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    for (r <- Seq(1, 30)) {
      val src =
        if (r == 1) "/root/testdata/sf0.1"
        else {
          spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
            .crossJoin(spark.range(r.toLong).select(col("id").as("rep")))
            .select(
              (col("vec_id").cast("long") * r + col("rep")).as("vec_id"),
              expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
                "x -> CAST(x + rep * 0.0001 AS FLOAT))").as("embedding"))
            .write.mode("overwrite")
            .parquet("/tmp/scale_nnd/embeddings.parquet")
          "/tmp/scale_nnd"
        }
      val nv = spark.read.parquet(s"$src/embeddings.parquet").count()
      val t0 = System.nanoTime()
      val edges = graft.SparkEntry.queries("sim_nndescent")(spark, src)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"NND_VECTORS=$nv NND_EDGES=$edges NND_SEC=$sec%.2f " +
        f"NND_ROWS_PER_SEC=${nv / sec}%.0f")
    }
    nndescentSkewProbe(spark)
  }

  /** NN-descent hot-bucket worst case: 30% of the corpus ε-identical
    * (one LSH bucket — the mass-near-duplicate shape LLM dedup
    * pipelines see) vs a balanced control of IDENTICAL total rows.
    * Uncapped, the init self-join pairs the flood quadratically
    * ((0.3n)² candidates to score); with the NndInitCap rank band the
    * flood costs 0.3n·2·128 pairs — the claim is a bounded skew/
    * balanced wall ratio. Both arms replicate sf0.1 10× (20k vectors,
    * dense ids). */
  def nndescentSkewProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val rep = 10
    def build(skew: Boolean, path: String): Long = {
      val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .crossJoin(spark.range(rep.toLong).select(col("id").as("rep")))
        .select((col("vec_id").cast("long") * rep + col("rep")).as("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v0"))
      val hot = base.filter(col("vec_id") % 10 < 3)
        .crossJoin(broadcast(
          base.filter(col("vec_id") === 7L).select(col("v0").as("hv"))))
        .select(col("vec_id"), expr(
          "transform(hv, x -> CAST(x + vec_id * 1e-9 AS FLOAT))")
          .as("embedding"))
      val cold = base.filter(col("vec_id") % 10 >= 3)
        .select(col("vec_id"), expr(
          "transform(v0, x -> CAST(x + (vec_id % 10) * 0.0001 AS FLOAT))")
          .as("embedding"))
      val all =
        if (skew) hot.union(cold)
        else base.select(col("vec_id"), expr(
          "transform(v0, x -> CAST(x + (vec_id % 10) * 0.0001 AS FLOAT))")
          .as("embedding"))
      all.write.mode("overwrite").parquet(s"$path/embeddings.parquet")
      spark.read.parquet(s"$path/embeddings.parquet").count()
    }
    def run(path: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("sim_nndescent")(spark, path)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val nS = build(skew = true, "/tmp/scale_nnd_skew")
    val nB = build(skew = false, "/tmp/scale_nnd_bal")
    val sS = run("/tmp/scale_nnd_skew")
    val sB = run("/tmp/scale_nnd_bal")
    println(f"NND_SKEW_VECTORS=$nS NND_BAL_VECTORS=$nB " +
      f"NND_SKEW_SEC=$sS%.2f NND_BAL_SEC=$sB%.2f " +
      f"NND_SKEW_RATIO=${sS / sB}%.2f")
  }

  /** Flagship multi-day shape (pipeline_range / runRange) at 1×/10×/
    * 50× the day count, constant per-day rows — the 100 TB claim is
    * that the whole range rides ONE exchange on hash(ticker, ds) with
    * every window group bounded by a ticker-day, so wall time must
    * stay ~linear in days. 500 tickers × ~377 surviving minutes ≈ the
    * reference's real day (~505 × ≤420). Gaps are injected (~3.4% of
    * slots) so sessionize/densify/interpolate all do real work.
    * Runnable standalone via [[PipelineRangeProbe]] (the full
    * ScaleProbe sweep takes minutes this probe doesn't need).
    */
  def pipelineRangeProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    {
      import graft.etl.MarketCalendar
      def rangeBars(nDays: Int, nTick: Int): org.apache.spark.sql.DataFrame = {
        val d0 = java.time.LocalDate.of(2024, 1, 2)
        val opens = (0 until nDays).map { i =>
          val d = d0.plusDays(i.toLong)
          org.apache.spark.sql.Row(d.toString,
            java.lang.Long.valueOf(MarketCalendar.marketOpenCloseNanos(d)._1),
            java.lang.Long.valueOf(i.toLong))
        }
        val dayDf = spark.createDataFrame(
          java.util.Arrays.asList(opens: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("d",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("o",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("di",
              org.apache.spark.sql.types.LongType))))
        dayDf
          .crossJoin(spark.range(nTick.toLong).select(col("id").as("tk")))
          .crossJoin(spark.range(390L).select(col("id").as("slot")))
          .filter(expr("(slot + tk * 7 + di * 3) % 29 <> 0"))
          .selectExpr("concat('T', tk) AS ticker",
            "CAST(100 + (slot + tk) % 50 AS DOUBLE) AS volume",
            "CAST(50 + ((slot * 13 + tk * 7 + di) % 200) * 0.25 AS DOUBLE) AS open",
            "CAST(50 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS close",
            "CAST(51 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS high",
            "CAST(49 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS low",
            "CAST(50 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS adj_close",
            "o + slot * 60000000000 AS window_start")
      }
      val d0 = java.time.LocalDate.of(2024, 1, 2)
      for (nDays <- Seq(2, 20, 100)) {
        rangeBars(nDays, 500).write.mode("overwrite")
          .parquet("/tmp/scale_range")
        val raw = spark.read.parquet("/tmp/scale_range")
        val nIn = raw.count()
        val dates = (0 until nDays).map(i => d0.plusDays(i.toLong))
        val t0 = System.nanoTime()
        val nOut = graft.ind.IndicatorPipeline.runRange(raw, dates)
          .queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PIPELINE_DAYS=$nDays PIPELINE_ROWS=$nIn " +
          f"PIPELINE_OUT=$nOut PIPELINE_SEC=$sec%.2f " +
          f"PIPELINE_ROWS_PER_SEC=${nIn / sec}%.0f")
      }

      // Hot-ticker skew: 1-second grid (gridStepSec=1, the finest shape
      // a real feed ships), 20 days, 4 tickers, the hot one trading the
      // FULL 25,200-second session (~30% of all rows) vs a balanced
      // control with identical total rows. The (ticker, ds) keying
      // bounds every window group at one ticker-day (≤ 25,200 rows)
      // regardless of ticker share, so skew must not cliff: the probe
      // prints the wall ratio. No salting needed BY CONSTRUCTION — ds
      // splits the hot ticker into 20 independent groups.
      def skewBars(hotSlots: Long, normSlots: Long): org.apache.spark.sql.DataFrame = {
        val opens = (0 until 20).map { i =>
          val d = d0.plusDays(i.toLong)
          org.apache.spark.sql.Row(
            java.lang.Long.valueOf(MarketCalendar.marketOpenCloseNanos(d)._1),
            java.lang.Long.valueOf(i.toLong))
        }
        val dayDf = spark.createDataFrame(
          java.util.Arrays.asList(opens: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("o",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("di",
              org.apache.spark.sql.types.LongType))))
        dayDf
          .crossJoin(spark.range(4L).select(col("id").as("tk")))
          .crossJoin(spark.range(hotSlots).select(col("id").as("slot")))
          .filter(col("tk") === 0 || col("slot") < normSlots)
          .selectExpr("concat('T', tk) AS ticker",
            "CAST(100 AS DOUBLE) AS volume",
            "CAST(50 + ((slot * 13 + tk * 7 + di) % 200) * 0.25 AS DOUBLE) AS open",
            "CAST(50 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS close",
            "CAST(51 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS high",
            "CAST(49 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS low",
            "CAST(50 + ((slot * 17 + tk * 11 + di) % 200) * 0.25 AS DOUBLE) AS adj_close",
            "o + slot * 1000000000 AS window_start")
      }
      val cfg1s = graft.model.IndicatorConfig(
        allowedGapsSec = Seq(1L, 2L, 3L), gridStepSec = 1L)
      val dates20 = (0 until 20).map(i => d0.plusDays(i.toLong))
      def timeRange(df: org.apache.spark.sql.DataFrame, tag: String): (Long, Double) = {
        df.write.mode("overwrite").parquet(s"/tmp/scale_range_$tag")
        val raw = spark.read.parquet(s"/tmp/scale_range_$tag")
        val n = raw.count()
        val t0 = System.nanoTime()
        graft.ind.IndicatorPipeline.runRange(raw, dates20, cfg1s)
          .queryExecution.toRdd.count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      // hot: T0 all 25200 s-slots, T1-3 at 19400 → hot ≈ 30.2% of rows;
      // balanced: 4 × 20850 = identical total (83,400 rows/day)
      val (nSkew, sSkew) = timeRange(skewBars(25200L, 19400L), "skew")
      val (nBal, sBal) = timeRange(skewBars(20850L, 20850L), "bal")
      println(f"PIPELINE_SKEW_ROWS=$nSkew PIPELINE_BAL_ROWS=$nBal " +
        f"SKEW_SEC=$sSkew%.2f BAL_SEC=$sBal%.2f " +
        f"SKEW_RATIO=${sSkew / sBal}%.2f")
    }
  }

  /** sim_hnsw scale receipt: total wall at 1× vs 30× the sf0.1
    * vectors, with the per-query rate. The claim under test is the
    * operator's 100 TB posture — per-query cost CONSTANT (seed bucket
    * + hops·beam·deg, no √n cell scan), so total wall (build + n/10
    * queries' walks) grows ~linearly while the per-query wall holds
    * or falls. Same 30× replication recipe as [[nndescentProbe]]
    * (dense ids, ε-perturbed copies). */
  def hnswProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    for (r <- Seq(1, 30)) {
      val src =
        if (r == 1) "/root/testdata/sf0.1"
        else {
          spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
            .crossJoin(spark.range(r.toLong).select(col("id").as("rep")))
            .select(
              (col("vec_id").cast("long") * r + col("rep")).as("vec_id"),
              expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
                "x -> CAST(x + rep * 0.0001 AS FLOAT))").as("embedding"))
            .write.mode("overwrite")
            .parquet("/tmp/scale_hnsw/embeddings.parquet")
          "/tmp/scale_hnsw"
        }
      val nv = spark.read.parquet(s"$src/embeddings.parquet").count()
      val nq = nv / 10 // the vec_id % 10 query split
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("sim_hnsw")(spark, src)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"HNSW_VECTORS=$nv HNSW_QUERIES=$nq HNSW_ROWS=$rows " +
        f"HNSW_SEC=$sec%.2f HNSW_MS_PER_QUERY=${sec * 1000.0 / nq}%.2f")
    }
  }

  /** Binary-quantization search receipt (r13): sim_bq_rerank's
    * Hamming stage is BY DESIGN a per-query linear scan over 8-byte
    * codes (the RaBitQ/BQ serving trade: brute-force made feasible by
    * 64× smaller index I/O, not sub-linear) — so wall should grow
    * ≈ r² when both corpus AND query split grow r×, while the
    * per-(query,code) pair cost stays flat. The receipt records
    * ns/pair at 1× and 10×; a rising pair cost would mean the
    * block-pair join degenerated (skew, BNLJ), which is the failure
    * mode the probe exists to catch. Sub-linear per-query retrieval
    * at scale remains the IVF/graph family's job — BQ is the scan
    * you put UNDER those prefilters. */
  def bqProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    for (r <- Seq(1, 10)) {
      val src =
        if (r == 1) "/root/testdata/sf0.1"
        else {
          spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
            .crossJoin(spark.range(r.toLong).select(col("id").as("rep")))
            .select(
              (col("vec_id").cast("long") * r + col("rep")).as("vec_id"),
              expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
                "x -> CAST(x + rep * 0.0001 AS FLOAT))").as("embedding"))
            .write.mode("overwrite")
            .parquet("/tmp/scale_bq/embeddings.parquet")
          "/tmp/scale_bq"
        }
      val nv = spark.read.parquet(s"$src/embeddings.parquet").count()
      val nq = nv / 10 // the vec_id % 10 query split
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("sim_bq_rerank")(spark, src)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val pairs = nq.toDouble * (nv - 1).toDouble
      println(f"BQ_VECTORS=$nv BQ_QUERIES=$nq BQ_ROWS=$rows " +
        f"BQ_SEC=$sec%.2f BQ_MS_PER_QUERY=${sec * 1000.0 / nq}%.2f " +
        f"BQ_NS_PER_PAIR=${sec * 1e9 / pairs}%.2f")
    }
  }

  /** Winnow-dedup flood receipt (r13): half the corpus shares a
    * 6-token boilerplate prefix, so its winnow fingerprints' posting
    * lists grow with n — uncapped, the fingerprint self-join would go
    * quadratic in the flood (n/2 docs × n/2 docs per boilerplate
    * fingerprint). The MaxBandBucket cap drops flooded postings
    * before pairing, so wall should track the SURVIVING (capped)
    * candidate pairs, not the flood square. Replicas salt the
    * non-boilerplate text so cross-replica fingerprints stay
    * distinct — the probe isolates the flood, not replica cliques. */
  def winnowSkewProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    for (r <- Seq(1, 10)) {
      val src =
        if (r == 1) "/tmp/scale_winnow_1"
        else "/tmp/scale_winnow_10"
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(r.toLong).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") * r + col("rep"))
        .withColumn("text",
          when(col("doc_id") % 2 === 0,
            concat(lit("alpha beta gamma delta epsilon zeta "),
              col("text"), lit(" salt"), col("rep")))
            .otherwise(concat(col("text"), lit(" salt"), col("rep"))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$src/documents.parquet")
      val nd = spark.read.parquet(s"$src/documents.parquet").count()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("dedup_winnow")(spark, src)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"WINNOW_DOCS=$nd WINNOW_PAIRS=$rows WINNOW_SEC=$sec%.2f")
    }
  }

  /** Tokenizer/mixing scale receipt (r13): corpus_doremi,
    * tok_bpe_encode and tok_encode all claim the word-frequency /
    * (source, token) collapse — corpus grows, the trained state does
    * not, so wall should grow far slower than rows. Replicas keep the
    * SAME text plus one per-replica salt token: 30× the token stream
    * over a near-constant vocabulary, exactly the regime the collapse
    * is designed for (a real crawl's vocab grows sublinearly; constant
    * is the cleanest probe of the same claim). */
  def tokMixProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    for (r <- Seq(1, 30)) {
      val src =
        if (r == 1) "/root/testdata/sf0.1"
        else {
          spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .crossJoin(spark.range(r.toLong).select(col("id").as("rep")))
            .withColumn("doc_id", col("doc_id") * r + col("rep"))
            .withColumn("text", concat(col("text"), lit(" salt"), col("rep")))
            .drop("rep")
            .write.mode("overwrite")
            .parquet("/tmp/scale_tokmix/documents.parquet")
          "/tmp/scale_tokmix"
        }
      val nd = spark.read.parquet(s"$src/documents.parquet").count()
      def timeQ(name: String): Double = {
        val t = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, src)
          .queryExecution.toRdd.count()
        (System.nanoTime() - t) / 1e9
      }
      timeQ("corpus_mix") // warm
      println(f"TOKMIX_DOCS=$nd DOREMI_SEC=${timeQ("corpus_doremi")}%.2f " +
        f"BPE_ENCODE_SEC=${timeQ("tok_bpe_encode")}%.2f " +
        f"UNI_ENCODE_SEC=${timeQ("tok_encode")}%.2f")
    }
  }

  /** Distributed-vs-driver parity receipt for the graph family (r12
    * verdict task 4): the gate SFs sit under the 100k-edge driver
    * cutover, so CORRECTNESS never exercises the distributed loops.
    * Build >100k-edge graphs, run BOTH paths on the same input, and
    * assert label-for-label equality. CC/SCC labels are exact min-id
    * longs (must match bit-for-bit); PageRank's driver solve sums
    * contributions in a different order than the shuffle, so parity is
    * asserted at the query layer's r6 rounding plus a reported raw
    * max |Δ| — the same absorption the oracle compare relies on. */
  def graphParityProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.ext.{ConnectedComponents => CC, PageRank => PR,
      StronglyConnectedComponents => SCC}
    val ForceDist = 0L
    val ForceDriver = Long.MaxValue
    val r6 = graft.queries.Rounding.r6 _
    def timed[A](f: => A): (A, Double) = {
      val t = System.nanoTime(); val a = f; (a, (System.nanoTime() - t) / 1e9)
    }

    // Undirected: 1M nodes, 25k 4-cliques (150k edges) + 1k 9-edge
    // chains = 159k edges — above the 100k cutover, the CC-probe shape.
    val nNodes = 1000000L
    val nodes = spark.range(nNodes).select(col("id"))
    val cliques = spark.range(25000L).select(col("id").as("g"))
      .select(explode(expr(
        "flatten(transform(sequence(0, 2), i -> transform(sequence(i + 1, 3), " +
          "j -> struct(g*4 + i AS src, g*4 + j AS dst))))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    val chains = spark.range(1000L).select((col("id") * 10L + 200000L).as("b"))
      .select(explode(expr(
        "transform(sequence(0, 8), i -> struct(b + i AS src, b + i + 1 AS dst))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    val und = cliques.union(chains).localCheckpoint()
    println("PARITY_UND_EDGES=" + und.count())

    val (ccDist, sCcD) =
      timed(CC(nodes, und, driverMaxEdges = ForceDist).localCheckpoint())
    val ccRounds = CC.LastRounds.get
    val (ccDrv, sCcV) =
      timed(CC(nodes, und, driverMaxEdges = ForceDriver).localCheckpoint())
    val ccMism = ccDist.as("a").join(ccDrv.as("b"), col("a.id") === col("b.id"))
      .where(col("a.lbl") =!= col("b.lbl")).count()
    println(f"CC_PARITY_MISMATCH=$ccMism ROUNDS=$ccRounds " +
      f"DIST_SEC=$sCcD%.2f DRIVER_SEC=$sCcV%.2f")

    val (prDist, sPrD) =
      timed(PR(nodes, und, driverMaxEdges = ForceDist).localCheckpoint())
    val (prDrv, sPrV) =
      timed(PR(nodes, und, driverMaxEdges = ForceDriver).localCheckpoint())
    val prStats = prDist.as("a").join(prDrv.as("b"), col("a.id") === col("b.id"))
      .select(col("a.rank").as("ra"), col("b.rank").as("rb"))
      .agg(max(abs(col("ra") - col("rb"))).as("maxd"),
        sum(when(r6(col("ra")) =!= r6(col("rb")), 1L).otherwise(0L)).as("r6m"))
      .head
    println(f"PR_PARITY_MAXDELTA=${prStats.getDouble(0)}%.3e " +
      f"R6_MISMATCH=${prStats.getLong(1)} ROUNDS=5 " +
      f"DIST_SEC=$sPrD%.2f DRIVER_SEC=$sPrV%.2f")

    val seeds = spark.range(0, 100000L, 1000L).select(col("id"))
    val (pprDist, sPpD) = timed(
      PR.personalized(nodes, und, seeds, driverMaxEdges = ForceDist)
        .localCheckpoint())
    val (pprDrv, sPpV) = timed(
      PR.personalized(nodes, und, seeds, driverMaxEdges = ForceDriver)
        .localCheckpoint())
    val ppStats = pprDist.as("a").join(pprDrv.as("b"), col("a.id") === col("b.id"))
      .select(col("a.rank").as("ra"), col("b.rank").as("rb"))
      .agg(max(abs(col("ra") - col("rb"))).as("maxd"),
        sum(when(r6(col("ra")) =!= r6(col("rb")), 1L).otherwise(0L)).as("r6m"))
      .head
    println(f"PPR_PARITY_MAXDELTA=${ppStats.getDouble(0)}%.3e " +
      f"R6_MISMATCH=${ppStats.getLong(1)} ROUNDS=5 " +
      f"DIST_SEC=$sPpD%.2f DRIVER_SEC=$sPpV%.2f")

    // Directed: 25k 4-cycles (100k edges, true SCCs) + 10k 2-edge DAG
    // paths (20k edges) = 120k edges > cutover.
    val cyc = spark.range(25000L).select(col("id").as("g"))
      .select(explode(expr(
        "transform(sequence(0, 3), i -> " +
          "struct(g*4 + i AS src, g*4 + (i + 1) % 4 AS dst))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    val dag = spark.range(10000L).select((col("id") * 3L + 300000L).as("b"))
      .select(explode(expr(
        "transform(sequence(0, 1), i -> struct(b + i AS src, b + i + 1 AS dst))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    val dir = cyc.union(dag).localCheckpoint()
    println("PARITY_DIR_EDGES=" + dir.count())
    val (sccDist, sSccD) =
      timed(SCC(nodes, dir, driverMaxEdges = ForceDist).localCheckpoint())
    val sccRounds = SCC.LastRounds.get
    val (sccDrv, sSccV) =
      timed(SCC(nodes, dir, driverMaxEdges = ForceDriver).localCheckpoint())
    val sccMism = sccDist.as("a").join(sccDrv.as("b"), col("a.id") === col("b.id"))
      .where(col("a.scc_id") =!= col("b.scc_id")).count()
    println(f"SCC_PARITY_MISMATCH=$sccMism ROUNDS=$sccRounds " +
      f"DIST_SEC=$sSccD%.2f DRIVER_SEC=$sSccV%.2f")
  }
  /** Filtered-search + at-rest-serving scale receipt (r14): 1× vs
    * 10× the sf0.1 vectors (ε-perturbed dense-id replicas, label
    * preserved so per-label selectivity is invariant). Claims under
    * test: `sim_filtered_search` keeps the sim_ivf_kmeans cost shape
    * (one broadcast assignment pass + a cell equi-join — per-query
    * work ~|cell|, so ms/query must not blow up as corpus AND query
    * count scale together), and `sim_ivf_served`'s at-rest index
    * stays flat in bytes/vector (ids + cell key only — the payloads
    * live in the corpus). */
  def filteredServeProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    for (r <- Seq(1, 10)) {
      val src =
        if (r == 1) "/root/testdata/sf0.1"
        else {
          spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
            .crossJoin(spark.range(r.toLong).select(col("id").as("rep")))
            .select(
              (col("vec_id").cast("long") * r + col("rep")).as("vec_id"),
              expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
                "x -> CAST(x + rep * 0.0001 AS FLOAT))").as("embedding"),
              col("label"))
            .write.mode("overwrite")
            .parquet("/tmp/scale_filtered/embeddings.parquet")
          "/tmp/scale_filtered"
        }
      val nv = spark.read.parquet(s"$src/embeddings.parquet").count()
      val nq = math.max(1L, nv / 25) // the % IvfQuerySplit split
      var t0 = System.nanoTime()
      val fr = graft.SparkEntry.queries("sim_filtered_search")(spark, src)
        .queryExecution.toRdd.count()
      val fSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val sr = graft.SparkEntry.queries("sim_ivf_served")(spark, src)
        .queryExecution.toRdd.count()
      val sSec = (System.nanoTime() - t0) / 1e9
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      val bytes = du(new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_ivf_index_" + src.replaceAll("[^A-Za-z0-9._-]", "_")))
      println(f"FILTERED_VECTORS=$nv FILTERED_QUERIES=$nq " +
        f"FILTERED_ROWS=$fr FILTERED_SEC=$fSec%.2f " +
        f"FILTERED_MS_PER_QUERY=${fSec * 1000.0 / nq}%.2f " +
        f"SERVED_ROWS=$sr SERVED_SEC=$sSec%.2f " +
        f"IDX_BYTES_PER_VECTOR=${bytes.toDouble / nv}%.1f")
    }
  }

}

/** Standalone driver for [[ScaleProbe.hnswProbe]] only. */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.hnswProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.graphParityProbe]] only. */
object GraphParityProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.graphParityProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.nndescentProbe]] only. */
object NnDescentProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.nndescentProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.nndescentSkewProbe]] only. */
object NnDescentSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.nndescentSkewProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.bqProbe]] only. */
object BqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.bqProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.winnowSkewProbe]] only. */
object WinnowSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.winnowSkewProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.tokMixProbe]] only. */
object TokMixProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.tokMixProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.pipelineRangeProbe]] only. */
object PipelineRangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.pipelineRangeProbe(spark)
    spark.stop()
  }
}

/** Standalone driver for [[ScaleProbe.filteredServeProbe]] only. */
object FilteredServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.filteredServeProbe(spark)
    spark.stop()
  }
}
