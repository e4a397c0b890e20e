package graft.ops

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`/`embeddings` — the
  * training-data-pipeline extensions (builder brief): exact
  * hash-group dedup, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB): no operator here enumerates the full O(n²)
  * pair space. Candidate pairs are generated only inside hash-join
  * buckets — LSH band signatures (minhash), 4-bit simhash bands, or
  * partition keys (lang/source, label) — so the shuffle is keyed and
  * bounded, joins stay hash joins, and nothing collects to the
  * driver. Signatures are computed with codegen-friendly higher-order
  * functions in one scan.
  *
  * Cross-engine determinism: word hashes use the char-fold hash from
  * [[TextAnalysis]]; all signature arithmetic is integer; jaccard and
  * cosine are single IEEE expressions over identical fold orders.
  */
object Dedup {

  // ---------------------------------------------------------------
  /** Exact dedup = hash groupBy on the full text (per source). At
    * scale this is one shuffle on a 64-bit text hash, not the text
    * itself; here counts suffice.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(col("text")).as("distinct_docs"),
        (count(lit(1)) - countDistinct(col("text"))).as("dups"))
      .orderBy(col("source"))

  val exactOracle: String =
    """SELECT source, COUNT(*) AS docs, COUNT(DISTINCT text) AS distinct_docs,
      |  COUNT(*) - COUNT(DISTINCT text) AS dups
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  /** N-gram (unigram-shingle) Jaccard near-dup: distinct word sets,
    * pairs generated within (lang, source) partitions only, kept at
    * jaccard ≥ 0.8. The partition key bounds the join; at 100 TB the
    * same plan holds with a salted key if a partition skews.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("array_distinct(split(text, ' '))").as("ws"))
    val a = docs.select(col("doc_id").as("a_id"), col("lang"), col("source"),
      col("ws").as("a_ws"))
    val b = docs.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("source").as("b_source"), col("ws").as("b_ws"))
    a.join(b, col("lang") === col("b_lang") && col("source") === col("b_source") &&
        col("a_id") < col("b_id"))
      .withColumn("jacc",
        size(array_intersect(col("a_ws"), col("b_ws"))) /
          size(array_union(col("a_ws"), col("b_ws"))))
      .filter(col("jacc") >= 0.8)
      .select(col("a_id"), col("b_id"), col("lang"), col("source"), col("jacc"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val ngramJaccardOracle: String =
    """WITH w AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(string_split(text, ' ')) AS ws
      |  FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.lang, a.source,
      |  len(list_intersect(a.ws, b.ws)) /
      |    len(list_distinct(list_concat(a.ws, b.ws))) AS jacc
      |FROM w a, w b
      |WHERE a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  AND len(list_intersect(a.ws, b.ws)) /
      |    len(list_distinct(list_concat(a.ws, b.ws))) >= 0.8
      |ORDER BY a_id, b_id""".stripMargin

  // ---------------------------------------------------------------
  /** MinHash + LSH: 12 minhash values from affine permutations of the
    * word char-fold hash, banded 2 × 6; candidate pairs are documents
    * sharing any band signature (a hash join on the band key — the
    * LSH scale path), then verified with exact Jaccard ≥ 0.8. Band
    * width 6 keeps bucket fan-out sublinear on this unusually
    * self-similar corpus (median pairwise Jaccard ≈ 0.6).
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val P = "1000000007"
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), expr("array_distinct(split(text, ' '))").as("ws"))
      .withColumn("hs", expr(
        "transform(ws, w -> aggregate(transform(split(w, ''), " +
          "c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), " +
          s"(a, b) -> (a * 31 + b) % $P))"))
      .withColumn("mhs", expr(
        s"transform(sequence(1, 12), k -> aggregate(hs, CAST($P AS BIGINT), " +
          s"(m, h) -> least(m, ((2 * k + 1) * h + 7919 * k) % $P)))"))
    val bands = docs.select(col("doc_id"), col("mhs"),
        explode(expr("sequence(1, 2)")).as("band"))
      .withColumn("sig", expr(
        "concat_ws('_', transform(sequence(6 * band - 5, 6 * band), " +
          "x -> CAST(mhs[x - 1] AS STRING)))"))
    val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("sig"))
      .join(bands.select(col("doc_id").as("b_id"), col("band").as("b_band"),
          col("sig").as("b_sig")),
        col("band") === col("b_band") && col("sig") === col("b_sig") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val ws = docs.select(col("doc_id"), col("ws"))
    cand
      .join(ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws")), Seq("a_id"))
      .join(ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws")), Seq("b_id"))
      .withColumn("jacc",
        size(array_intersect(col("a_ws"), col("b_ws"))) /
          size(array_union(col("a_ws"), col("b_ws"))))
      .filter(col("jacc") >= 0.8)
      .select(col("a_id"), col("b_id"), col("jacc"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val minhashLshOracle: String = {
    val P = "1000000007"
    val wordHash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, ws,
       |    list_transform(ws, w -> $wordHash) AS hs
       |  FROM docs),
       |sigs AS (
       |  SELECT doc_id, ws,
       |    list_transform(range(1, 13), k ->
       |      list_reduce(list_prepend(CAST($P AS BIGINT), hs),
       |        (m, h) -> least(m, ((2 * k + 1) * h + 7919 * k) % $P))) AS mhs
       |  FROM hashed),
       |bands AS (
       |  SELECT doc_id, ws, b AS band,
       |    array_to_string(list_transform(range(6 * b - 5, 6 * b + 1),
       |      x -> CAST(mhs[x] AS VARCHAR)), '_') AS sig
       |  FROM sigs, range(1, 3) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a, bands b
       |  WHERE a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id,
       |  len(list_intersect(da.ws, db.ws)) /
       |    len(list_distinct(list_concat(da.ws, db.ws))) AS jacc
       |FROM cand, docs da, docs db
       |WHERE da.doc_id = a_id AND db.doc_id = b_id
       |  AND len(list_intersect(da.ws, db.ws)) /
       |    len(list_distinct(list_concat(da.ws, db.ws))) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** SimHash: 32-bit signature — per bit, majority vote of word
    * hashes' bit values; candidate pairs share one of four 8-bit
    * bands (pigeonhole guarantee for hamming ≤ 3), verified with
    * bit_count(xor). Output is the hamming histogram of near-dup
    * pairs — compact regardless of how self-similar the corpus is,
    * while still forcing the full sign-fold + band-join + verify
    * pipeline.
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val P = "1000000007"
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), expr("array_distinct(split(text, ' '))").as("ws"))
      .withColumn("hs", expr(
        "transform(ws, w -> aggregate(transform(split(w, ''), " +
          "c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), " +
          s"(a, b) -> (a * 31 + b) % $P))"))
      .withColumn("sim", expr(
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) -> acc + " +
          "CASE WHEN aggregate(hs, 0, (sacc, h) -> sacc + " +
          "(CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END)) >= 0 " +
          "THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"))
    val bands = docs.select(col("doc_id"), col("sim"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("key", expr("shiftright(sim, 8 * band) & 255"))
    bands.select(col("doc_id").as("a_id"), col("sim").as("a_sim"),
        col("band"), col("key"))
      .join(bands.select(col("doc_id").as("b_id"), col("sim").as("b_sim"),
          col("band").as("b_band"), col("key").as("b_key")),
        col("band") === col("b_band") && col("key") === col("b_key") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_sim ^ b_sim)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy(col("hamming"))
  }

  val simhashOracle: String = {
    val P = "1000000007"
    val wordHash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform(list_distinct(string_split(text, ' ')), w -> $wordHash) AS hs
       |  FROM documents),
       |sigs AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 32)), (acc, j) -> acc +
       |      CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |          (sacc, h) -> sacc + (CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
       |        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS sim
       |  FROM hashed),
       |bands AS (
       |  SELECT doc_id, sim, b AS band, (sim >> (8 * b)) & 255 AS key
       |  FROM sigs, range(0, 4) t(b)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
       |  FROM bands a, bands b
       |  WHERE a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |    AND bit_count(xor(a.sim, b.sim)) <= 3)
       |SELECT hamming, COUNT(*) AS pairs
       |FROM pairs
       |GROUP BY hamming
       |ORDER BY hamming""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Embedding-cosine near-dup: pairs within the same `label`
    * partition (the cluster id bounds the pair space — the same plan
    * an IVF index gives at scale), full cosine with per-vector norms
    * precomputed in the scan pass.
    */
  def embeddingCosine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr(
        "sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), (a, x) -> a + x))"))
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("v").as("a_v"), col("norm").as("a_norm"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("v").as("b_v"), col("norm").as("b_norm"))
    a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(a_v, b_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, x) -> a + x)"))
      .withColumn("cosine", col("dot") / (col("a_norm") * col("b_norm")))
      .filter(col("cosine") >= 0.25)
      .select(col("a_id"), col("b_id"), col("label"), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val embeddingCosineOracle: String = {
    val norm = "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list_transform(v, x -> x * x)), (a, x) -> a + x))"
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, label, v, $norm AS norm FROM e)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (x, y) -> x + y)
       |    / (a.norm * b.norm) AS cosine
       |FROM n a, n b
       |WHERE a.label = b.label AND a.vec_id < b.vec_id
       |  AND list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (x, y) -> x + y)
       |    / (a.norm * b.norm) >= 0.25
       |ORDER BY a_id, b_id""".stripMargin
  }

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("dedup_exact", exact, Some(exactOracle),
      "exact hash-groupBy dedup stats per source"),
    Q("dedup_ngram_jaccard", ngramJaccard, Some(ngramJaccardOracle),
      "unigram-shingle Jaccard near-dup within (lang, source)"),
    Q("dedup_minhash_lsh", minhashLsh, Some(minhashLshOracle),
      "MinHash 12-sig, 2x6 LSH bands, Jaccard-verified pairs"),
    Q("dedup_simhash", simhash, Some(simhashOracle),
      "32-bit SimHash, 8-bit band blocking, hamming<=3 histogram"),
    Q("dedup_embedding_cosine", embeddingCosine, Some(embeddingCosineOracle),
      "cosine near-dup within label partitions"))
}
