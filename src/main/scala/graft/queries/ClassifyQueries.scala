package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.functions.GraftFunctions

/** Counting-based classifier / encoding operators: a multinomial
  * naive-Bayes text classifier (the train-on-heuristic-labels →
  * score-the-corpus shape quality and language filters use in
  * large-scale curation pipelines) and weight-of-evidence categorical
  * encoding with information value (the classic supervised encoder for
  * tabular features).
  *
  * Scale notes (100 TB design point):
  *  - NB training is ONE token-count aggregate over the train split —
  *    the same (tok)-keyed exchange text_wordfreq pays; the class
  *    totals (Ng, Nb, V, priors) are one-row aggregates broadcast back;
  *  - scoring joins the held-out side's per-doc term frequencies
  *    against the log-likelihood-ratio table on tok — a plain hash
  *    join keyed by token (the posting-join shape), never a broadcast
  *    of the corpus-sized vocabulary and never doc×doc;
  *  - WoE is a scan-local projection into a ≤24-group aggregate plus a
  *    broadcast one-row total — nothing grows with the data.
  *
  * Float discipline: the only transcendental is ln() (1-ulp across
  * engines), always micro-quantized to exact BIGINT units immediately
  * (the hybridLexTop/BM25 convention) so every cross-partition sum is
  * integer-exact and order-independent.
  */
object ClassifyQueries {

  import TextOps._
  import Rounding.r6

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  private def emb(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    s.read.parquet(s"$dir/embeddings.parquet")
  }

  /** One MMD² readout between the g=true/false halves of a labeled
    * vector frame eg(g BOOLEAN, v ARRAY<DOUBLE>) under the degree-2
    * polynomial kernel
    * k(x,y) = (x·y + 1)², LINEARIZED through its explicit feature map:
    * mean-embedding moments E[xxᵀ] (2080 upper-triangle cells) and
    * E[x] (64 cells) per group, then
    * MMD² = Σ w·ΔM² + 2·Σ Δm² (w = 1 diagonal, 2 off-diagonal; the c²
    * terms cancel). One scan, one (g,i,j)-keyed aggregate of
    * micro-quantized products (map-side combinable), a 2144-row join —
    * never the O(n²) pairwise kernel sum a naive two-sample test pays.
    * Linear moments ride the same exchange as pseudo-pairs (i, 0). */
  private def mmdOf(eg: DataFrame, splitName: String): DataFrame = {
    // Moments accumulate in two per-partition long arrays (d + d(d+1)/2
    // cells each for the linear + upper-triangle products) — the PCA-
    // covariance accumulator shape — so the exchange carries
    // 2·2144·partitions rows instead of the 2144·n an inline struct
    // explode shuffles through the partial aggregate (measured 3.9 s →
    // the explode built ~86M short-lived structs per mmdOf at sf0.1).
    // Quantization is per-product BEFORE summing, bit-identical to the
    // old `CAST(round(p * 1e6) AS BIGINT)`: Spark's round at scale 0 is
    // HALF_UP on the exact double ≡ away-from-zero nearest (Rounding's
    // documented std::round equivalence), computed here branch-exactly
    // (a − floor(a) is exact for a < 2⁵², so the .5 test never drifts).
    val momSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("sp",
        org.apache.spark.sql.types.LongType)))
    val mom = eg.select(col("g"), col("v"))
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        def rnd(t: Double): Long = {
          val a = math.abs(t)
          val fl = math.floor(a)
          val r = if (a - fl >= 0.5) fl + 1.0 else fl
          (if (t < 0) -r else r).toLong
        }
        var accT: Array[Long] = null
        var accF: Array[Long] = null
        var d = 0
        it.foreach { row =>
          val g = row.getBoolean(0)
          // NULL embeddings contribute nothing — exactly what the old
          // SQL's element_at-NULL products summed to under sum()'s
          // NULL-skipping; a ragged row (length ≠ the partition's
          // latched d) fails loudly instead of silently shrinking or
          // overrunning the moment set.
          if (!row.isNullAt(1)) {
            val v: Array[Double] = row.getSeq[Double](1).toArray
            if (d == 0) d = v.length
            require(v.length == d,
              s"mmdOf: ragged embedding length ${v.length} != $d")
            val cells = d + d * (d + 1) / 2
            val acc = {
              if (g) { if (accT == null) accT = new Array[Long](cells); accT }
              else { if (accF == null) accF = new Array[Long](cells); accF }
            }
            var i = 0
            var tri = d
            while (i < d) {
              acc(i) += rnd(v(i) * 1000000.0)
              val vi = v(i)
              var j = i
              while (j < d) {
                acc(tri) += rnd(vi * v(j) * 1000000.0)
                tri += 1
                j += 1
              }
              i += 1
            }
          }
        }
        def emit(g: Boolean, acc: Array[Long]) =
          if (acc == null) Iterator.empty
          else {
            val lin = (0 until d).iterator.map(i =>
              org.apache.spark.sql.Row(g, i + 1, 0, acc(i)))
            val tri = (0 until d).iterator.flatMap(i =>
              (i until d).iterator.map { j =>
                val idx = d + i * d - i * (i - 1) / 2 + (j - i)
                org.apache.spark.sql.Row(g, i + 1, j + 1, acc(idx))
              })
            lin ++ tri
          }
        emit(true, accT) ++ emit(false, accF)
      }(org.apache.spark.sql.Encoders.row(momSchema))
      .groupBy("g", "i", "j")
      .agg(sum(col("sp")).as("sp"))
    val nrow = eg.agg(
      sum(when(col("g"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("g"), 1L).otherwise(0L)).as("nb"))
    val a = mom.filter(col("g")).select(col("i"), col("j"),
      col("sp").as("sa"))
    val b = mom.filter(!col("g")).select(col("i"), col("j"),
      col("sp").as("sb"))
    val terms = a.join(b, Seq("i", "j"))
      .crossJoin(broadcast(nrow))
      .withColumn("d", expr("CAST(sa AS DOUBLE) / 1000000.0 / " +
        "CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / 1000000.0 / " +
        "CAST(nb AS DOUBLE)"))
      .select(expr("CAST(round((CASE WHEN j = 0 THEN 2.0 " +
        "WHEN i = j THEN 1.0 ELSE 2.0 END) * d * d * 1000000000000.0)" +
        " AS BIGINT)").as("q"))
    terms.agg(sum(col("q")).as("sq"))
      // empty-in → empty-out: sq is NULL iff a group (or the table)
      // is empty, where a two-sample statistic is undefined
      .filter(col("sq").isNotNull)
      .crossJoin(broadcast(nrow))
      .select(lit(splitName).as("split"), col("na").as("n_a"),
        col("nb").as("n_b"),
        r6(col("sq").cast("double") / lit(1e12)).as("mmd2"))
  }

  /** The heuristic training label: relational-marker count exceeds
    * scan-marker count (TextOps.LangMarkers — the ONE definition the
    * langid family shares). Token-derived on purpose: the synthetic
    * corpus draws every metadata facet (lang, source) from the SAME
    * unigram distribution, so a metadata label has no token evidence
    * and any bag-of-words classifier degenerates to the prior —
    * measured here as 53% accuracy on lang before this label. A rule
    * the classifier CAN learn is the honest demo of the distill-a-
    * curation-rule-into-a-classifier shape. */
  private val RelM = LangMarkers.find(_._1 == "relational").get._2
  private val ScanM = LangMarkers.find(_._1 == "scan").get._2
  private def labelSpark =
    s"${langScoreSpark("toks", RelM)} > ${langScoreSpark("toks", ScanM)}"
  private def labelDuck =
    s"${langScoreDuck("toks", RelM)} > ${langScoreDuck("toks", ScanM)}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multinomial naive Bayes, trained on the doc_id % 50 != 0 split
    // with the deterministic heuristic label [[labelSpark]] — the
    // CCNet/fastText curation shape: cheap rule labels train a
    // classifier that then scores everything. Laplace-smoothed
    // per-token log-likelihood ratios llr(tok) =
    // ln((cg+1)/(Ng+V)) − ln((cb+1)/(Nb+V)) are micro-quantized to
    // BIGINT at birth, so the per-doc score Σ tf·llr + prior is an
    // exact integer sum (order-independent). Held-out docs
    // (doc_id % 50 == 0) score via a tok-keyed hash join; OOV tokens
    // contribute nothing (standard NB practice) and a doc with no
    // known tokens keeps the prior alone.
    "text_nb_quality" -> ((s, dir) => {
      val dd = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(toksSpark).as("toks"))
        .withColumn("is_pos", expr(labelSpark))
        .localCheckpoint()
      val train = dd.filter(col("doc_id") % 50 =!= 0)
      val tf = train.select(col("is_pos"), explode(col("toks")).as("tok"))
        .groupBy("tok").agg(
          sum(when(col("is_pos"), 1L).otherwise(0L)).as("cg"),
          sum(when(!col("is_pos"), 1L).otherwise(0L)).as("cb"))
      val st = tf.agg(sum(col("cg")).as("ng"), sum(col("cb")).as("nb"),
        count(lit(1)).as("v"))
      val pri = train.agg(expr("CAST(round((ln(CAST(" +
        "sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1 AS DOUBLE)) - ln(CAST(" +
        "sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) + 1 AS DOUBLE)))" +
        " * 1000000.0) AS BIGINT)").as("prior"))
      val llr = tf.crossJoin(broadcast(st))
        .select(col("tok"), expr("CAST(round((" +
          "ln(CAST(cg + 1 AS DOUBLE)) - ln(CAST(ng + v AS DOUBLE)) - " +
          "ln(CAST(cb + 1 AS DOUBLE)) + ln(CAST(nb + v AS DOUBLE)))" +
          " * 1000000.0) AS BIGINT)").as("llr"))
      val held = dd.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("is_pos"),
          expr("CAST(size(toks) AS BIGINT)").as("n_toks"), col("toks"))
      val dsum = held
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tfq"))
        .join(llr, Seq("tok"))
        .groupBy("doc_id").agg(sum(col("tfq") * col("llr")).as("ssum"))
      held.join(dsum, Seq("doc_id"), "left")
        .crossJoin(broadcast(pri))
        .select(col("doc_id"), col("n_toks"),
          (coalesce(col("ssum"), lit(0L)) + col("prior")).as("score_micro"),
          (coalesce(col("ssum"), lit(0L)) + col("prior") > 0).as("pred_pos"),
          col("is_pos"))
    }),

    // The classifier's measured quality: 2×2 confusion counts of
    // pred_pos vs the rule label over the held-out split, with the
    // cell rate — the readout that justifies (or kills) deploying the
    // filter. Derived from text_nb_quality so the two can never drift.
    "text_nb_confusion" -> ((s, dir) => {
      val scored = queries("text_nb_quality")(s, dir)
      val tot = scored.agg(count(lit(1)).as("n_held"))
      scored.groupBy("pred_pos", "is_pos").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("pred_pos"), col("is_pos"), col("n"),
          r6(col("n").cast("double") / col("n_held").cast("double"))
            .as("rate"))
    }),

    // Calibration of the NB quality classifier (reliability table +
    // ECE terms, Guo et al. ICML'17 posture): confidence = sigmoid of
    // the micro-quantized log-odds, taken for the PREDICTED class
    // (max(p, 1-p) ∈ [0.5, 1]), micro-quantized at birth so binning
    // and the per-bin mean ride exact integers; 10 equal-width bins
    // (conf lands in 5..9 by construction, the top edge folds into
    // bin 9). Per bin: count, accuracy vs the rule label, mean
    // confidence, |acc − conf| gap, and the n/N-weighted ECE term
    // (their sum IS the expected calibration error). Derived from
    // text_nb_quality so classifier and calibration can never drift.
    // exp() ulp skew between libms is absorbed by the micro rounding,
    // the same contract every ln()-based op in this family relies on.
    "quality_ece" -> ((s, dir) => {
      val scored = queries("text_nb_quality")(s, dir)
      val binned = scored
        .withColumn("p", expr("CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)" +
          " + exp(-(CAST(score_micro AS DOUBLE) / 1000000.0)))"))
        .withColumn("conf_micro", expr(
          "CAST(round(greatest(p, CAST(1.0 AS DOUBLE) - p) * 1000000.0)" +
            " AS BIGINT)"))
        .withColumn("bin",
          expr("least(CAST(9 AS BIGINT), conf_micro DIV 100000)"))
        .withColumn("correct", col("pred_pos") === col("is_pos"))
      val tot = binned.agg(count(lit(1)).as("n_held"))
      binned.groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"),
          sum(col("conf_micro")).as("sc"))
        .crossJoin(broadcast(tot))
        .withColumn("acc_r",
          expr("CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("conf_r",
          expr("CAST(sc AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)"))
        .select(col("bin"), col("n"),
          r6(col("acc_r")).as("acc"),
          r6(col("conf_r")).as("mean_conf"),
          r6(expr("abs(acc_r - conf_r)")).as("gap"),
          r6(expr("CAST(n AS DOUBLE) / CAST(n_held AS DOUBLE)" +
            " * abs(acc_r - conf_r)")).as("ece_term"))
    }),

    // Cohen's kappa between the suite's two quality classifiers (the
    // NB model and the hand-logit rule) on the shared held-out split —
    // the inter-rater check a curation stack runs before trusting
    // either filter alone: raw agreement po corrected by the
    // chance-agreement pe the two keep-rates imply. All counts exact
    // longs from one agreement aggregate; kappa NULL when pe = 1
    // (degenerate margins). Derived from text_nb_quality and
    // Corpus2Queries' logit, so the raters can never drift from the
    // classifiers they rate.
    "quality_kappa" -> ((s, dir) => {
      val nb = queries("text_nb_quality")(s, dir)
        .select(col("doc_id"), col("pred_pos"))
      val lg = docs(s, dir)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr(Corpus2Queries.ntS).as("nt"),
          expr(Corpus2Queries.ncS).as("nc"),
          expr(s"CAST(${langScoreSpark(toksSpark, Corpus2Queries.Stop)}" +
            " AS BIGINT)").as("nstop"))
        .withColumn("keep_lg",
          expr(Corpus2Queries.logitSql("nt", "nc", "nstop")) > 0.0)
        .select("doc_id", "keep_lg")
      nb.join(lg, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_pos") === col("keep_lg"), 1L).otherwise(0L))
            .as("agree"),
          sum(when(col("pred_pos"), 1L).otherwise(0L)).as("nb_pos"),
          sum(when(col("keep_lg"), 1L).otherwise(0L)).as("lg_pos"))
        .filter(col("n") > 0)
        .withColumn("po", expr("CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("pe", expr(
          "(CAST(nb_pos AS DOUBLE) * CAST(lg_pos AS DOUBLE)" +
            " + CAST(n - nb_pos AS DOUBLE) * CAST(n - lg_pos AS DOUBLE))" +
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"))
        .select(col("n"), col("agree"), col("nb_pos"), col("lg_pos"),
          r6(col("po")).as("po"), r6(col("pe")).as("pe"),
          r6(expr("CASE WHEN pe = 1.0 THEN NULL" +
            " ELSE (po - pe) / (1.0 - pe) END")).as("kappa"))
    }),

    // Weight-of-evidence encoding of hour-of-day against the purchase
    // event, with the per-bucket information-value term: woe(h) =
    // ln(((pos_h+0.5)/(P+12)) / ((neg_h+0.5)/(N+12))) (0.5 smoothing ×
    // 24 buckets), iv_term = (pos_h/P − neg_h/N)·woe. Counts are exact
    // longs; woe is micro-quantized once and both reported doubles
    // derive from the same integers in the same expression order.
    "feat_woe" -> ((s, dir) => {
      val hh = EventBars.events(s, dir)
        .select(expr("(t DIV 3600000000) % 24").as("hr"),
          (col("event_type") <=> "purchase").as("pos"))
        .groupBy("hr").agg(
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
      val tot = hh.agg(sum(col("n_pos")).as("tp"), sum(col("n_neg")).as("tn"),
        count(lit(1)).as("nh"))
      hh.crossJoin(broadcast(tot))
        .filter(col("nh") > 0)
        .withColumn("woe_micro", expr("CAST(round((" +
          "ln((CAST(n_pos AS DOUBLE) + 0.5) / " +
          "(CAST(tp AS DOUBLE) + 0.5 * CAST(nh AS DOUBLE))) - " +
          "ln((CAST(n_neg AS DOUBLE) + 0.5) / " +
          "(CAST(tn AS DOUBLE) + 0.5 * CAST(nh AS DOUBLE))))" +
          " * 1000000.0) AS BIGINT)"))
        .select(col("hr"), col("n_pos"), col("n_neg"),
          r6(col("woe_micro").cast("double") / lit(1000000.0)).as("woe"),
          r6((col("n_pos").cast("double") / col("tp").cast("double")
            - col("n_neg").cast("double") / col("tn").cast("double"))
            * (col("woe_micro").cast("double") / lit(1000000.0)))
            .as("iv_term"))
    }),

    // Two-sample distribution-shift test on the embedding corpus: MMD²
    // under the degree-2 polynomial kernel via [[mmdOf]], reported as
    // a CALIBRATION PAIR — a null split (vec_id parity: same
    // distribution, the statistic's noise floor) next to an injected
    // mean shift (+0.25 on coordinate 1: a known positive, well above
    // the floor). A drift monitor deploys exactly this way: alert when
    // a new shard's MMD² against the corpus leaves the null band. The
    // metadata labels are NOT used as the positive on purpose — this
    // corpus' labels are near-noise in embedding space (measured mean
    // separation ≈ the parity split's), so they'd demo a non-detection.
    "emb_mmd_poly" -> ((s, dir) => {
      val e = emb(s, dir).localCheckpoint()
      val vd = "CAST(embedding AS ARRAY<DOUBLE>)"
      val nullEg = e.select(expr("vec_id % 2 = 0").as("g"),
        expr(vd).as("v"))
      val shiftEg = e.select(lit(true).as("g"), expr(vd).as("v"))
        .unionByName(e.select(lit(false).as("g"),
          expr(s"concat(array(CAST(element_at(embedding, 1) AS DOUBLE)" +
            s" + 0.25D), slice($vd, 2, 63))").as("v")))
      mmdOf(nullEg, "shard_parity")
        .unionByName(mmdOf(shiftEg, "inject_mean_shift"))
    }),

    // Entropic optimal-transport dataset distance (OTDD-lite): the two
    // vec_id-parity halves reduce to per-label centroids (the
    // micro-quantized integer-mean kernel emb_kmeans/ivfKmeansIndex
    // use), the 10×10 squared-L2 cost matrix folds per cell in dim
    // order, and 5 Sinkhorn iterations at ε = 0.5·mean(C) run as a
    // NESTED SEQUENTIAL FOLD over one assembled row (the ts_dtw_ref
    // pattern: u ++ v rides the fold accumulator; identical fold order
    // on both engines ⇒ bit-matched doubles; the one libm exp() is
    // nano-quantized at birth). The scale story: n vectors collapse to
    // L·d exact integer moments in ONE map-side-combinable aggregate —
    // dataset similarity for mixture weighting/curricula at any corpus
    // size, never an n×n coupling.
    "emb_otdd_sinkhorn" -> ((s, dir) => {
      val e = emb(s, dir).localCheckpoint()
      val dsv = e.select((col("vec_id") % 2 === 0).as("dsa"), col("label"),
        posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)"))
          .as(Seq("dim", "x")))
      val cent = dsv.groupBy("dsa", "label", "dim")
        .agg(sum(expr("CAST(round(x * 1000000.0) AS BIGINT)")).as("sx"),
          count(lit(1)).as("n"))
        .withColumn("m", expr("CAST(CAST(round(CAST(sx AS DOUBLE) " +
          "/ CAST(n AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1000000.0"))
        .groupBy("dsa", "label")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), " +
          "s -> s.m)").as("v"))
        .localCheckpoint()
      val cost = cent.filter(col("dsa"))
        .select(col("label").as("a"), col("v").as("va"))
        .crossJoin(cent.filter(!col("dsa"))
          .select(col("label").as("b"), col("v").as("vb")))
        .withColumn("c", expr("aggregate(transform(sequence(1, size(va)), " +
          "k -> (element_at(va, k) - element_at(vb, k)) " +
          "* (element_at(va, k) - element_at(vb, k))), 0.0D, " +
          "(s1, z) -> s1 + z)"))
      val wn = e.select((col("vec_id") % 2 === 0).as("dsa"), col("label"))
        .groupBy("dsa", "label").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val waR = wn.filter(col("dsa")).agg(expr(
        "transform(array_sort(collect_list(struct(label, n))), " +
          "s -> CAST(s.n AS DOUBLE))").as("nas"))
      val wbR = wn.filter(!col("dsa")).agg(expr(
        "transform(array_sort(collect_list(struct(label, n))), " +
          "s -> CAST(s.n AS DOUBLE))").as("nbs"))
      // u-update text (from the accumulator's v half) — inlined twice
      // below (Spark HOF lambdas have no let-binding), so the v-update
      // recomputes it exactly like the oracle does
      val uNew = "transform(sequence(1, size(nas)), a1 -> " +
        "element_at(was, a1) / aggregate(transform(sequence(1, size(nbs)), " +
        "b1 -> element_at(ks, (a1 - 1) * size(nbs) + b1) " +
        "* element_at(acc, size(nas) + b1)), 0.0D, (s2, z) -> s2 + z))"
      val uNew3 = uNew.replace("a1", "a3").replace("b1", "b3")
        .replace("s2", "s3")
      val vNew = "transform(sequence(1, size(nbs)), b2 -> " +
        "element_at(wbs, b2) / aggregate(transform(sequence(1, size(nas)), " +
        s"a2 -> element_at(ks, (a2 - 1) * size(nbs) + b2) " +
        s"* element_at($uNew3, a2)), 0.0D, (s4, z) -> s4 + z))"
      cost.agg(expr("transform(array_sort(collect_list(struct(a, b, c))), " +
          "s -> s.c)").as("cs"))
        .crossJoin(broadcast(waR)).crossJoin(broadcast(wbR))
        .filter(expr("size(cs) = size(nas) * size(nbs) AND size(cs) > 0"))
        .withColumn("sna", expr("aggregate(nas, 0.0D, (s1, z) -> s1 + z)"))
        .withColumn("snb", expr("aggregate(nbs, 0.0D, (s1, z) -> s1 + z)"))
        .withColumn("eps", expr("0.5 * aggregate(cs, 0.0D, " +
          "(s1, z) -> s1 + z) / CAST(size(cs) AS DOUBLE)"))
        .filter(col("eps") > 0.0)
        .withColumn("was", expr("transform(nas, x -> x / sna)"))
        .withColumn("wbs", expr("transform(nbs, x -> x / snb)"))
        // kernel quantized at 1e-6, NOT the ln()-convention 1e-9: libm
        // exp() carries no cross-engine 1-ulp guarantee, and 1e-6 sits
        // well above any plausible exp() ulp divergence at a rounding
        // boundary (ADVICE r10)
        .withColumn("ks", expr("transform(cs, c -> CAST(CAST(round(" +
          "exp(-c / eps) * 1000000.0) AS BIGINT) AS DOUBLE) " +
          "/ 1000000.0)"))
        .withColumn("uv", expr("aggregate(sequence(1, 5), " +
          "concat(transform(nas, x -> 1.0D), transform(nbs, x -> 1.0D)), " +
          s"(acc, k) -> concat($uNew, $vNew))"))
        .withColumn("otdd", expr("aggregate(transform(sequence(1, size(cs)), " +
          "i -> element_at(uv, CAST((i - 1) DIV size(nbs) + 1 AS INT)) " +
          "* element_at(ks, i) " +
          "* element_at(uv, CAST(size(nas) + pmod(i - 1, size(nbs)) + 1 " +
          "AS INT)) * element_at(cs, i)), 0.0D, (s5, z) -> s5 + z)"))
        .select(expr("CAST(sna AS BIGINT)").as("n_a"),
          expr("CAST(snb AS BIGINT)").as("n_b"),
          r6(col("eps")).as("eps"), r6(col("otdd")).as("otdd"))
    }))

  /** One split's oracle block (mirrors [[mmdOf]] 1:1); `egSql` must
    * produce eg(g BOOLEAN, v DOUBLE[]). */
  private def mmdDuck(splitName: String, egSql: String): String =
    s"""(WITH eg AS ($egSql),
       |px AS (SELECT g, i, 0 AS j, v[i] AS p
       |  FROM eg, range(1, 65) r(i)),
       |pq AS (SELECT g, i, j, v[i] * v[j] AS p
       |  FROM eg, range(1, 65) r1(i), range(1, 65) r2(j) WHERE j >= i),
       |mom AS (SELECT g, i, j,
       |    sum(CAST(round(p * 1000000.0) AS BIGINT))::BIGINT AS sp
       |  FROM (SELECT * FROM px UNION ALL SELECT * FROM pq)
       |  GROUP BY g, i, j),
       |cnt AS (SELECT sum(CASE WHEN g THEN 1 ELSE 0 END)::BIGINT AS na,
       |    sum(CASE WHEN NOT g THEN 1 ELSE 0 END)::BIGINT AS nb FROM eg),
       |t AS (SELECT a.i AS i, a.j AS j,
       |    (a.sp::DOUBLE / 1000000.0 / na::DOUBLE
       |      - b.sp::DOUBLE / 1000000.0 / nb::DOUBLE) AS d
       |  FROM mom a JOIN mom b ON a.i = b.i AND a.j = b.j AND a.g AND NOT b.g
       |  CROSS JOIN cnt),
       |q AS (SELECT CAST(round((CASE WHEN j = 0 THEN 2.0
       |    WHEN i = j THEN 1.0 ELSE 2.0 END)
       |    * d * d * 1000000000000.0) AS BIGINT) AS q FROM t),
       |s AS (SELECT sum(q)::BIGINT AS sq FROM q)
       |SELECT '$splitName' AS split, na AS n_a, nb AS n_b,
       |  (round(sq::DOUBLE / 1000000000000.0, 6) + 0.0) AS mmd2
       |FROM s CROSS JOIN cnt WHERE sq IS NOT NULL)""".stripMargin

  val oracles: Map[String, String] = Map(

    "emb_otdd_sinkhorn" ->
      s"""WITH dsv AS (SELECT (vec_id % 2 = 0) AS dsa, label,
         |    generate_subscripts(embedding, 1) AS dim,
         |    unnest(embedding)::DOUBLE AS x
         |  FROM embeddings),
         |cm AS (SELECT dsa, label, dim,
         |    sum(CAST(round(x * 1000000.0) AS BIGINT))::BIGINT AS sx,
         |    count(*)::BIGINT AS n
         |  FROM dsv GROUP BY 1, 2, 3),
         |ct AS (SELECT dsa, label,
         |    list(CAST(round(sx::DOUBLE / n::DOUBLE) AS BIGINT)::DOUBLE
         |         / 1000000.0 ORDER BY dim) AS v
         |  FROM cm GROUP BY 1, 2),
         |cost AS (SELECT ca.label AS a, cb.label AS b,
         |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |      generate_series(1, len(ca.v)),
         |      k -> (ca.v[k] - cb.v[k]) * (ca.v[k] - cb.v[k]))),
         |      (s1, z) -> s1 + z) AS c
         |  FROM ct ca JOIN ct cb ON ca.dsa AND NOT cb.dsa),
         |wn AS (SELECT dsa, label, count(*)::BIGINT AS n FROM
         |    (SELECT (vec_id % 2 = 0) AS dsa, label FROM embeddings)
         |  GROUP BY 1, 2),
         |wa AS (SELECT list(n::DOUBLE ORDER BY label) AS nas
         |  FROM wn WHERE dsa),
         |wb AS (SELECT list(n::DOUBLE ORDER BY label) AS nbs
         |  FROM wn WHERE NOT dsa),
         |cr AS (SELECT list(c ORDER BY a, b) AS cs FROM cost),
         |base AS (SELECT cs, nas, nbs,
         |    list_reduce(list_prepend(0.0::DOUBLE, nas),
         |      (s1, z) -> s1 + z) AS sna,
         |    list_reduce(list_prepend(0.0::DOUBLE, nbs),
         |      (s1, z) -> s1 + z) AS snb,
         |    0.5 * list_reduce(list_prepend(0.0::DOUBLE, cs),
         |      (s1, z) -> s1 + z) / CAST(len(cs) AS DOUBLE) AS eps
         |  FROM cr, wa, wb
         |  WHERE len(cs) = len(nas) * len(nbs) AND len(cs) > 0),
         |kb AS (SELECT *,
         |    list_transform(nas, x -> x / sna) AS was,
         |    list_transform(nbs, x -> x / snb) AS wbs,
         |    list_transform(cs, c -> CAST(round(exp(-c / eps)
         |      * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0) AS ks
         |  FROM base WHERE eps > 0.0),
         |it AS (SELECT *, list_reduce(
         |    list_prepend(
         |      list_transform(nas, x -> 1.0::DOUBLE)
         |        || list_transform(nbs, x -> 1.0::DOUBLE),
         |      list_transform(generate_series(1, 5), k -> [k::DOUBLE])),
         |    (acc, e) ->
         |      list_transform(generate_series(1, len(nas)), a1 -> was[a1] /
         |        list_reduce(list_prepend(0.0::DOUBLE,
         |          list_transform(generate_series(1, len(nbs)),
         |            b1 -> ks[(a1 - 1) * len(nbs) + b1]
         |              * acc[len(nas) + b1])), (s2, z) -> s2 + z))
         |      ||
         |      list_transform(generate_series(1, len(nbs)), b2 -> wbs[b2] /
         |        list_reduce(list_prepend(0.0::DOUBLE,
         |          list_transform(generate_series(1, len(nas)),
         |            a2 -> ks[(a2 - 1) * len(nbs) + b2] *
         |              (list_transform(generate_series(1, len(nas)),
         |                a3 -> was[a3] /
         |                list_reduce(list_prepend(0.0::DOUBLE,
         |                  list_transform(generate_series(1, len(nbs)),
         |                    b3 -> ks[(a3 - 1) * len(nbs) + b3]
         |                      * acc[len(nas) + b3])),
         |                  (s3, z) -> s3 + z)))[a2]
         |        )), (s4, z) -> s4 + z))
         |  ) AS uv FROM kb)
         |SELECT CAST(sna AS BIGINT) AS n_a, CAST(snb AS BIGINT) AS n_b,
         |  (round(eps * 1000000.0) / 1000000.0 + 0.0) AS eps,
         |  (round((list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |      generate_series(1, len(cs)), i ->
         |        uv[(i - 1) // len(nbs) + 1] * ks[i]
         |        * uv[len(nas) + ((i - 1) % len(nbs)) + 1] * cs[i])),
         |    (s5, z) -> s5 + z)) * 1000000.0) / 1000000.0 + 0.0) AS otdd
         |FROM it""".stripMargin,

    "emb_mmd_poly" ->
      (mmdDuck("shard_parity",
        "SELECT (vec_id % 2 = 0) AS g, " +
          "list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings") +
        "\nUNION ALL\n" +
        mmdDuck("inject_mean_shift",
          "SELECT true AS g, list_transform(embedding, x -> x::DOUBLE) AS v" +
            " FROM embeddings UNION ALL " +
            "SELECT false AS g, list_prepend(v0[1] + 0.25, v0[2:]) AS v" +
            " FROM (SELECT list_transform(embedding, x -> x::DOUBLE) AS v0" +
            " FROM embeddings)")),

    "text_nb_quality" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id,
         |    $toksDuck AS toks FROM documents),
         |dl AS (SELECT *, $labelDuck AS is_pos FROM dt),
         |tr AS (SELECT * FROM dl WHERE doc_id % 50 <> 0),
         |tf AS (SELECT tok,
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS cg,
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END)::BIGINT AS cb
         |  FROM (SELECT is_pos, unnest(toks) AS tok FROM tr) GROUP BY tok),
         |st AS (SELECT sum(cg)::BIGINT AS ng, sum(cb)::BIGINT AS nb,
         |    count(*)::BIGINT AS v FROM tf),
         |pri AS (SELECT CAST(round((ln((
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE) - ln((
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS prior FROM tr),
         |llr AS (SELECT tok, CAST(round((
         |    ln((cg + 1)::DOUBLE) - ln((ng + v)::DOUBLE) -
         |    ln((cb + 1)::DOUBLE) + ln((nb + v)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS llr FROM tf CROSS JOIN st),
         |held AS (SELECT doc_id, is_pos, len(toks)::BIGINT AS n_toks, toks
         |  FROM dl WHERE doc_id % 50 = 0),
         |htf AS (SELECT doc_id, tok, count(*)::BIGINT AS tfq
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM held)
         |  GROUP BY doc_id, tok),
         |dsum AS (SELECT doc_id, sum(tfq * llr)::BIGINT AS ssum
         |  FROM htf JOIN llr USING (tok) GROUP BY doc_id)
         |SELECT h.doc_id, h.n_toks,
         |  (coalesce(d.ssum, 0) + (SELECT prior FROM pri))::BIGINT
         |    AS score_micro,
         |  (coalesce(d.ssum, 0) + (SELECT prior FROM pri)) > 0 AS pred_pos,
         |  h.is_pos
         |FROM held h LEFT JOIN dsum d USING (doc_id)""".stripMargin,

    "quality_ece" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id,
         |    $toksDuck AS toks FROM documents),
         |dl AS (SELECT *, $labelDuck AS is_pos FROM dt),
         |tr AS (SELECT * FROM dl WHERE doc_id % 50 <> 0),
         |tf AS (SELECT tok,
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS cg,
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END)::BIGINT AS cb
         |  FROM (SELECT is_pos, unnest(toks) AS tok FROM tr) GROUP BY tok),
         |st AS (SELECT sum(cg)::BIGINT AS ng, sum(cb)::BIGINT AS nb,
         |    count(*)::BIGINT AS v FROM tf),
         |pri AS (SELECT CAST(round((ln((
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE) - ln((
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS prior FROM tr),
         |llr AS (SELECT tok, CAST(round((
         |    ln((cg + 1)::DOUBLE) - ln((ng + v)::DOUBLE) -
         |    ln((cb + 1)::DOUBLE) + ln((nb + v)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS llr FROM tf CROSS JOIN st),
         |held AS (SELECT doc_id, is_pos FROM dl WHERE doc_id % 50 = 0),
         |htf AS (SELECT doc_id, tok, count(*)::BIGINT AS tfq
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM dt
         |        WHERE doc_id % 50 = 0)
         |  GROUP BY doc_id, tok),
         |dsum AS (SELECT doc_id, sum(tfq * llr)::BIGINT AS ssum
         |  FROM htf JOIN llr USING (tok) GROUP BY doc_id),
         |scq AS (SELECT h.doc_id,
         |    (coalesce(d.ssum, 0) + (SELECT prior FROM pri))::BIGINT
         |      AS score_micro,
         |    (coalesce(d.ssum, 0) + (SELECT prior FROM pri)) > 0 AS pred_pos,
         |    h.is_pos
         |  FROM held h LEFT JOIN dsum d USING (doc_id)),
         |pb AS (SELECT *, CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
         |    + exp(-(CAST(score_micro AS DOUBLE) / 1000000.0))) AS p
         |  FROM scq),
         |cbn AS (SELECT *, CAST(round(greatest(p, CAST(1.0 AS DOUBLE) - p)
         |    * 1000000.0) AS BIGINT) AS conf_micro FROM pb),
         |bb AS (SELECT least(9::BIGINT, conf_micro // 100000) AS bin,
         |    conf_micro, (pred_pos = is_pos) AS correct FROM cbn),
         |tt AS (SELECT count(*)::BIGINT AS n_held FROM bb),
         |gq AS (SELECT bin, count(*)::BIGINT AS n,
         |    sum(CASE WHEN correct THEN 1 ELSE 0 END)::BIGINT AS n_correct,
         |    sum(conf_micro)::BIGINT AS sc FROM bb GROUP BY 1),
         |gr AS (SELECT *,
         |    CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE) AS acc_r,
         |    CAST(sc AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS conf_r
         |  FROM gq CROSS JOIN tt)
         |SELECT bin, n,
         |  (round(acc_r * 1000000.0) / 1000000.0 + 0.0) AS acc,
         |  (round(conf_r * 1000000.0) / 1000000.0 + 0.0) AS mean_conf,
         |  (round(abs(acc_r - conf_r) * 1000000.0) / 1000000.0 + 0.0) AS gap,
         |  (round(CAST(n AS DOUBLE) / CAST(n_held AS DOUBLE)
         |    * abs(acc_r - conf_r) * 1000000.0) / 1000000.0 + 0.0)
         |    AS ece_term
         |FROM gr""".stripMargin,

    "quality_kappa" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id, text,
         |    $toksDuck AS toks FROM documents),
         |dl AS (SELECT *, $labelDuck AS is_pos FROM dt),
         |tr AS (SELECT * FROM dl WHERE doc_id % 50 <> 0),
         |tf AS (SELECT tok,
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS cg,
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END)::BIGINT AS cb
         |  FROM (SELECT is_pos, unnest(toks) AS tok FROM tr) GROUP BY tok),
         |st AS (SELECT sum(cg)::BIGINT AS ng, sum(cb)::BIGINT AS nb,
         |    count(*)::BIGINT AS v FROM tf),
         |pri AS (SELECT CAST(round((ln((
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE) - ln((
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS prior FROM tr),
         |llr AS (SELECT tok, CAST(round((
         |    ln((cg + 1)::DOUBLE) - ln((ng + v)::DOUBLE) -
         |    ln((cb + 1)::DOUBLE) + ln((nb + v)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS llr FROM tf CROSS JOIN st),
         |held AS (SELECT doc_id FROM dl WHERE doc_id % 50 = 0),
         |htf AS (SELECT doc_id, tok, count(*)::BIGINT AS tfq
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM dt
         |        WHERE doc_id % 50 = 0)
         |  GROUP BY doc_id, tok),
         |dsum AS (SELECT doc_id, sum(tfq * llr)::BIGINT AS ssum
         |  FROM htf JOIN llr USING (tok) GROUP BY doc_id),
         |knb AS (SELECT h.doc_id,
         |    (coalesce(d.ssum, 0) + (SELECT prior FROM pri)) > 0 AS pred_pos
         |  FROM held h LEFT JOIN dsum d USING (doc_id)),
         |kft AS (SELECT doc_id, ${Corpus2Queries.ntD} AS nt,
         |    ${Corpus2Queries.ncD} AS nc,
         |    ${graft.ext.TextOps.langScoreDuck("toks", Corpus2Queries.Stop)}::BIGINT
         |      AS nstop
         |  FROM dt WHERE doc_id % 50 = 0),
         |klg AS (SELECT doc_id,
         |    ${Corpus2Queries.logitDuck("nt", "nc", "nstop")} > 0.0 AS keep_lg
         |  FROM kft),
         |kag AS (SELECT count(*)::BIGINT AS n,
         |    sum(CASE WHEN pred_pos = keep_lg THEN 1 ELSE 0 END)::BIGINT
         |      AS agree,
         |    sum(CASE WHEN pred_pos THEN 1 ELSE 0 END)::BIGINT AS nb_pos,
         |    sum(CASE WHEN keep_lg THEN 1 ELSE 0 END)::BIGINT AS lg_pos
         |  FROM knb JOIN klg USING (doc_id) HAVING count(*) > 0),
         |kpp AS (SELECT *,
         |    CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |    (CAST(nb_pos AS DOUBLE) * CAST(lg_pos AS DOUBLE)
         |      + CAST(n - nb_pos AS DOUBLE) * CAST(n - lg_pos AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
         |  FROM kag)
         |SELECT n, agree, nb_pos, lg_pos,
         |  (round(po * 1000000.0) / 1000000.0 + 0.0) AS po,
         |  (round(pe * 1000000.0) / 1000000.0 + 0.0) AS pe,
         |  (round((CASE WHEN pe = 1.0 THEN NULL
         |    ELSE (po - pe) / (1.0 - pe) END) * 1000000.0) / 1000000.0
         |    + 0.0) AS kappa
         |FROM kpp""".stripMargin,

    "text_nb_confusion" ->
      s"""WITH dt AS (SELECT doc_id::BIGINT AS doc_id,
         |    $toksDuck AS toks FROM documents),
         |dl AS (SELECT *, $labelDuck AS is_pos FROM dt),
         |tr AS (SELECT * FROM dl WHERE doc_id % 50 <> 0),
         |tf AS (SELECT tok,
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS cg,
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END)::BIGINT AS cb
         |  FROM (SELECT is_pos, unnest(toks) AS tok FROM tr) GROUP BY tok),
         |st AS (SELECT sum(cg)::BIGINT AS ng, sum(cb)::BIGINT AS nb,
         |    count(*)::BIGINT AS v FROM tf),
         |pri AS (SELECT CAST(round((ln((
         |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE) - ln((
         |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) + 1)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS prior FROM tr),
         |llr AS (SELECT tok, CAST(round((
         |    ln((cg + 1)::DOUBLE) - ln((ng + v)::DOUBLE) -
         |    ln((cb + 1)::DOUBLE) + ln((nb + v)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS llr FROM tf CROSS JOIN st),
         |held AS (SELECT doc_id, is_pos FROM dl WHERE doc_id % 50 = 0),
         |htf AS (SELECT doc_id, tok, count(*)::BIGINT AS tfq
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM dt
         |        WHERE doc_id % 50 = 0)
         |  GROUP BY doc_id, tok),
         |dsum AS (SELECT doc_id, sum(tfq * llr)::BIGINT AS ssum
         |  FROM htf JOIN llr USING (tok) GROUP BY doc_id),
         |scored AS (SELECT h.is_pos,
         |    (coalesce(d.ssum, 0) + (SELECT prior FROM pri)) > 0 AS pred_pos
         |  FROM held h LEFT JOIN dsum d USING (doc_id)),
         |tot AS (SELECT count(*)::BIGINT AS n_held FROM scored)
         |SELECT pred_pos, is_pos, count(*)::BIGINT AS n,
         |  (round(count(*)::DOUBLE / (SELECT n_held FROM tot)::DOUBLE, 6)
         |    + 0.0) AS rate
         |FROM scored GROUP BY pred_pos, is_pos""".stripMargin,

    "feat_woe" ->
      s"""WITH ev AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hr,
         |    (event_type IS NOT DISTINCT FROM 'purchase') AS pos
         |  FROM events),
         |hh AS (SELECT hr,
         |    sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         |    sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS n_neg
         |  FROM ev GROUP BY hr),
         |tot AS (SELECT sum(n_pos)::BIGINT AS tp, sum(n_neg)::BIGINT AS tn,
         |    count(*)::BIGINT AS nh FROM hh),
         |w AS (SELECT hr, n_pos, n_neg, CAST(round((
         |    ln((n_pos::DOUBLE + 0.5) / (tp::DOUBLE + 0.5 * nh::DOUBLE)) -
         |    ln((n_neg::DOUBLE + 0.5) / (tn::DOUBLE + 0.5 * nh::DOUBLE)))
         |    * 1000000.0) AS BIGINT) AS woe_micro, tp, tn
         |  FROM hh CROSS JOIN tot WHERE nh > 0)
         |SELECT hr, n_pos, n_neg,
         |  (round(woe_micro::DOUBLE / 1000000.0, 6) + 0.0) AS woe,
         |  (round((n_pos::DOUBLE / tp::DOUBLE - n_neg::DOUBLE / tn::DOUBLE)
         |    * (woe_micro::DOUBLE / 1000000.0), 6) + 0.0) AS iv_term
         |FROM w""".stripMargin)
}
