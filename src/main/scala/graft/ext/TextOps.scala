package graft.ext

/** Text-analysis / dedup primitives for the LLM-data-pipeline surface
  * (builder prompt "training-data pipeline" operators; SURVEY.md §7.4).
  *
  * Each primitive is defined twice, token-for-token equivalent: a Spark
  * SQL expression (codegen'd higher-order functions — no UDFs, stays in
  * whole-stage codegen) and a DuckDB expression for the oracle. All
  * hashing is integer polynomial arithmetic mod 1e9+7 so both engines
  * produce bit-identical BIGINTs (verified: fold/char-code/split parity).
  *
  * Scale notes (100 TB design point): every primitive is a narrow
  * per-row projection — no shuffle, no state; they vectorize inside
  * codegen and push no data to the driver. The only shuffling ops built
  * on top (dedup groupBy, LSH band join) key on short hashes, so
  * shuffle width is O(docs), not O(bytes).
  */
object TextOps {

  val P = 1000000007L

  /** Non-empty whitespace tokens. */
  val toksSpark = "filter(split(text, ' '), t -> t <> '')"
  val toksDuck = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Spark-side NATIVE-expression fragments for the word-hash →
    * shingle pipeline (the codegen'd Catalyst expressions registered
    * by GraftFunctions) — the ONE definition every query module
    * aliases; `shNativeSpark` assumes a `wh` column produced by
    * `whNativeSpark`. */
  val whNativeSpark: String = s"graft_word_hashes($toksSpark)"
  val shNativeSpark: String = "graft_shingles(wh)"

  /** Per-token polynomial hash over character codes (base 131, seed 7). */
  def wordHashesSpark(toks: String): String =
    s"transform($toks, wd -> aggregate(transform(regexp_extract_all(wd, '.', 0), " +
      s"c -> CAST(ascii(c) AS BIGINT)), 7L, (a, b) -> (a*131 + b) % $P))"
  def wordHashesDuck(toks: String): String =
    s"list_transform($toks, wd -> list_reduce(list_prepend(7::BIGINT, " +
      s"list_transform(regexp_extract_all(wd, '.'), c -> unicode(c)::BIGINT)), " +
      s"(a, b) -> (a*131 + b) % $P))"

  /** Document fingerprint: left fold of word hashes (base 31). */
  def fingerprintSpark(wh: String): String =
    s"aggregate($wh, 0L, (a, b) -> (a*31 + b) % $P)"
  def fingerprintDuck(wh: String): String =
    s"list_reduce(list_prepend(0::BIGINT, $wh), (a, b) -> (a*31 + b) % $P)"

  /** 3-gram shingle hashes from word hashes (combine base 131). */
  def shinglesSpark(wh: String): String =
    s"if(size($wh) >= 3, transform(sequence(1, size($wh) - 2), " +
      s"i -> (((element_at($wh, i)*131 + element_at($wh, i+1)) % $P)*131 " +
      s"+ element_at($wh, i+2)) % $P), CAST(array() AS ARRAY<BIGINT>))"
  def shinglesDuck(wh: String): String =
    s"list_transform(generate_series(1, len($wh) - 2), " +
      s"i -> ((($wh[i]*131 + $wh[i+1]) % $P)*131 + $wh[i+2]) % $P)"

  /** 2-gram (bigram) hashes — same base-131 fold, window of 2. */
  def bigramsDuck(wh: String): String =
    s"list_transform(generate_series(1, len($wh) - 1), " +
      s"i -> ($wh[i]*131 + $wh[i+1]) % $P)"

  /** MinHash signature: `numHash` permutations h_j(x)=((2j+1)x+7919j+1) mod P. */
  def minhashSpark(sh: String, numHash: Int): String =
    s"transform(sequence(0, ${numHash - 1}), j -> " +
      s"array_min(transform($sh, x -> ((2*j + 1)*x + j*7919 + 1) % $P)))"
  def minhashDuck(sh: String, numHash: Int): String =
    s"list_transform(generate_series(0, ${numHash - 1}), j -> " +
      s"list_min(list_transform($sh, x -> ((2*j + 1)*x + j*7919 + 1) % $P)))"

  /** LSH band keys: `bands` bands of `rows` minhashes folded together. */
  def bandsSpark(mh: String, bands: Int, rows: Int): String = {
    require(rows == 3, "band fold written for r=3")
    s"transform(sequence(0, ${bands - 1}), j -> " +
      s"(((element_at($mh, 3*j+1)*131 + element_at($mh, 3*j+2)) % $P)*131 " +
      s"+ element_at($mh, 3*j+3)) % $P)"
  }
  def bandsDuck(mh: String, bands: Int, rows: Int): String = {
    require(rows == 3)
    s"list_transform(generate_series(0, ${bands - 1}), j -> " +
      s"((($mh[3*j+1]*131 + $mh[3*j+2]) % $P)*131 + $mh[3*j+3]) % $P)"
  }

  /** Language-ID heuristic: marker-token hit counts per "language".
    * (The synthetic corpus shares one vocabulary across lang labels, so
    * this scores structural marker sets; the operator shape — tokenize,
    * score against K profiles, argmax — is the real n-gram-LID pipeline.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "determiner" -> Seq("the", "a", "big", "small"),
    "relational" -> Seq("join", "merge", "group", "agg"),
    "scan" -> Seq("scan", "filter", "sort", "order"))

  def langScoreSpark(toks: String, markers: Seq[String]): String =
    s"size(filter($toks, t -> t IN (${markers.map("'" + _ + "'").mkString(", ")})))"
  def langScoreDuck(toks: String, markers: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${markers.map("'" + _ + "'").mkString(", ")})))"
}
