package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the Corpus2Queries batch (bloom
  * decontamination, length bucketing, quality gate) — the oracle gate
  * pins cross-engine equality; these pin the properties the numbers
  * must satisfy regardless of fixture.
  */
class Corpus2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom contamination is a superset of exact n-gram overlap") {
    val bloom = graft.queries.Corpus2Queries
      .queries("text_bloom_contam")(spark, sf).cache()
    // A bloom filter never false-negatives: every exact hit is a bloom
    // hit, per doc.
    assert(bloom.filter(col("n_exact") > col("n_bloom")).count() == 0)
    // Every doc text_decontaminate flags (exact overlap) must appear
    // with n_exact equal to its n_shared.
    val exact = graft.queries.ExtQueries
      .queries("text_decontaminate")(spark, sf)
    val joined = exact.join(bloom, Seq("doc_id"), "left")
    assert(joined.filter(col("n_bloom").isNull
      || col("n_exact") =!= col("n_shared")).count() == 0)
    bloom.unpersist()
  }

  test("length buckets are powers of two covering every doc once") {
    val b = graft.queries.Corpus2Queries
      .queries("corpus_length_buckets")(spark, sf).cache()
    assert(b.filter(expr("(bucket & (bucket - 1)) != 0 OR bucket < 1"))
      .count() == 0)
    // Padding waste is non-negative and below one bucket per doc.
    assert(b.filter(col("pad_tokens") < 0
      || col("pad_tokens") >= col("bucket") * col("n_docs")).count() == 0)
    val nDocs = b.agg(sum("n_docs")).collect()(0).getLong(0)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(nDocs == total)
    b.unpersist()
  }

  test("mutual-kNN degrees are bounded by k and cover every vector") {
    val g = graft.queries.ExtQueries
      .queries("sim_knn_graph")(spark, sf).cache()
    // Mutuality can only REMOVE directed k=3 edges, so no node exceeds
    // degree 3; the histogram partitions the full vector set.
    assert(g.filter(col("degree") < 0 || col("degree") > 3).count() == 0)
    val n = g.agg(sum("n_nodes")).collect()(0).getLong(0)
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(n == total)
    g.unpersist()
  }

  test("quality gate rates are in [0,1] and count every doc") {
    val q = graft.queries.Corpus2Queries
      .queries("corpus_quality_logit")(spark, sf).cache()
    assert(q.filter(col("keep_rate") < 0.0 || col("keep_rate") > 1.0
      || col("n_keep") > col("n_docs")).count() == 0)
    val nDocs = q.agg(sum("n_docs")).collect()(0).getLong(0)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(nDocs == total)
    q.unpersist()
  }
}
