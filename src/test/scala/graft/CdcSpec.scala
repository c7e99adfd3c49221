package graft

/** text_cdc_chunks against a sequential per-doc reference: a token
  * whose hash ≡ 0 (mod 8) ENDS its chunk (inclusive); chunks must
  * partition each doc's token stream, keys are the ordered base-31
  * fold, and the cross-corpus dup accounting must equal a plain
  * hash-map count over the reference keys — on a corpus engineered to
  * contain repeated chunks across docs.
  */
class CdcSpec extends SparkSpec {

  private val P = graft.ext.TextOps.P

  private def wh(w: String): Long =
    w.foldLeft(7L)((a, c) => (a * 131 + c.toLong) % P)

  /** (chunkKey, nToks) per chunk, in order. */
  private def refChunks(toks: Seq[String]): Seq[(Long, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var cur = List.empty[Long]
    toks.map(wh).foreach { h =>
      cur = h :: cur
      if (h % 8 == 0) {
        out += ((cur.reverse.foldLeft(7L)((a, b) => (a * 31 + b) % P),
          cur.length))
        cur = Nil
      }
    }
    if (cur.nonEmpty)
      out += ((cur.reverse.foldLeft(7L)((a, b) => (a * 31 + b) % P),
        cur.length))
    out.toSeq
  }

  test("CDC chunking matches the sequential reference incl. dup mass") {
    import spark.implicits._
    val rng = new java.util.Random(41)
    // small alphabet → guaranteed repeated chunks across docs; the
    // shared phrase block guarantees multi-token dup chunks too
    val alphabet = Vector("spark", "scan", "join", "the", "table", "sort",
      "agg", "row", "batch", "key", "merge", "io")
    val shared = "the table join sort"
    val docs = (0L until 40L).map { id =>
      val n = rng.nextInt(40)
      val body = Seq.fill(n)(alphabet(rng.nextInt(alphabet.size)))
      val toks = if (id % 3 == 0) shared.split(" ").toSeq ++ body else body
      (id, toks.mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("cdc_docs").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    // reference accounting
    val perDoc = docs.map { case (id, text) =>
      id -> refChunks(text.split(" ").toSeq.filter(_.nonEmpty))
    }.toMap
    val copies = perDoc.values.flatten.groupBy(_._1).map {
      case (k, cs) => k -> cs.size
    }
    val want = perDoc.collect { case (id, chunks) if chunks.nonEmpty =>
      (id, chunks.size.toLong,
        chunks.map(_._2.toLong).sum,
        chunks.count(c => copies(c._1) > 1).toLong,
        chunks.filter(c => copies(c._1) > 1).map(_._2.toLong).sum)
    }.toSet

    val got = SparkEntry.queries("text_cdc_chunks")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want,
      s"diff: extra=${got -- want}, missing=${want -- got}")
    // the corpus must actually exercise the dup path
    assert(want.exists(_._4 > 0), "test corpus produced no dup chunks")
  }
}
