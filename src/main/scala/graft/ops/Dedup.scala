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
    * LSH scale path), each link annotated with its exact Jaccard over
    * the hashed shingle sets. No threshold is applied here: the
    * output is the cluster-link edge list a downstream union-find
    * dedup consumes, thresholding per use-case.
    *
    * Shape note: the signature is computed by EXPLODING the word set
    * and taking 12 codegen'd `min()` aggregates — a vectorized
    * hash-aggregate that scales linearly — rather than nested
    * higher-order-function folds, which run interpreted and were ~10×
    * slower at sf0.1. Jaccard verification compares bigint hash sets
    * (collisions are deterministic and shared with the oracle).
    *
    * Candidate generation links each doc to its BUCKET REPRESENTATIVE
    * (min doc_id per band signature) rather than all-pairs within the
    * bucket: every duplicate is still discovered (it shares a bucket
    * with its cluster's representative), but candidates are O(n·bands)
    * instead of O(Σ bucket²) — on this corpus all-pairs emits 2.5M+
    * pairs at sf0.1 and would be quadratic at 100 TB.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr("array_distinct(split(text, ' '))")).as("w"))
      .withColumn("h", expr(
        "aggregate(transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT)), " +
          s"CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % $P)"))
    val mins = (1 to 12).map(k =>
      min((lit(2L * k + 1) * col("h") + lit(7919L * k)) % P).as(s"m$k"))
    val aggs = sort_array(collect_set(col("h"))).as("hs") +: mins
    val sigs = words.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val bands = sigs.select(col("doc_id"),
        explode(expr("array(" +
          "named_struct('band', 1, 'sig', concat_ws('_', CAST(m1 AS STRING), " +
          "CAST(m2 AS STRING), CAST(m3 AS STRING), CAST(m4 AS STRING), " +
          "CAST(m5 AS STRING), CAST(m6 AS STRING))), " +
          "named_struct('band', 2, 'sig', concat_ws('_', CAST(m7 AS STRING), " +
          "CAST(m8 AS STRING), CAST(m9 AS STRING), CAST(m10 AS STRING), " +
          "CAST(m11 AS STRING), CAST(m12 AS STRING))))"))
          .as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val reps = bands.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("a_id"), count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > 1)
    val cand = bands.join(reps, Seq("band", "sig"))
      .filter(col("doc_id") =!= col("a_id"))
      .select(col("a_id"), col("doc_id").as("b_id")).distinct()
    val hs = sigs.select(col("doc_id"), col("hs"))
    cand
      .join(hs.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), Seq("a_id"))
      .join(hs.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), Seq("b_id"))
      .withColumn("jacc",
        size(array_intersect(col("a_hs"), col("b_hs"))) /
          size(array_union(col("a_hs"), col("b_hs"))))
      .select(col("a_id"), col("b_id"), col("jacc"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val minhashLshOracle: String = {
    val P = "1000000007"
    val wordHash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"
    val mins = (1 to 12)
      .map(k => s"min((${2 * k + 1} * h + ${7919 * k}) % $P) AS m$k")
      .mkString(",\n       |    ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, $wordHash AS h FROM words),
       |sigs AS (
       |  SELECT doc_id, list(DISTINCT h) AS hs,
       |    $mins
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 1 AS band,
       |    CAST(m1 AS VARCHAR) || '_' || CAST(m2 AS VARCHAR) || '_' ||
       |    CAST(m3 AS VARCHAR) || '_' || CAST(m4 AS VARCHAR) || '_' ||
       |    CAST(m5 AS VARCHAR) || '_' || CAST(m6 AS VARCHAR) AS sig
       |  FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 2 AS band,
       |    CAST(m7 AS VARCHAR) || '_' || CAST(m8 AS VARCHAR) || '_' ||
       |    CAST(m9 AS VARCHAR) || '_' || CAST(m10 AS VARCHAR) || '_' ||
       |    CAST(m11 AS VARCHAR) || '_' || CAST(m12 AS VARCHAR) AS sig
       |  FROM sigs),
       |reps AS (
       |  SELECT band, sig, MIN(doc_id) AS a_id, COUNT(*) AS bucket_n
       |  FROM bands GROUP BY band, sig HAVING COUNT(*) > 1),
       |cand AS (
       |  SELECT DISTINCT r.a_id, b.doc_id AS b_id
       |  FROM bands b, reps r
       |  WHERE b.band = r.band AND b.sig = r.sig AND b.doc_id <> r.a_id)
       |SELECT a_id, b_id,
       |  len(list_intersect(da.hs, db.hs)) /
       |    len(list_distinct(list_concat(da.hs, db.hs))) AS jacc
       |FROM cand, sigs da, sigs db
       |WHERE da.doc_id = a_id AND db.doc_id = b_id
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
    val P = 1000000007L
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr("array_distinct(split(text, ' '))")).as("w"))
      .withColumn("h", expr(
        "aggregate(transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT)), " +
          s"CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % $P)"))
    // One codegen'd aggregate per bit: +1/-1 majority vote, then the
    // signature is assembled from the 32 sign columns.
    val votes = (0 to 31).map(j =>
      sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), 1).otherwise(-1)).as(s"b$j"))
    val simExpr = (0 to 31)
      .map(j => s"(CASE WHEN b$j >= 0 THEN shiftleft(CAST(1 AS BIGINT), $j) " +
        "ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val docs = words.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .withColumn("sim", expr(simExpr))
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
    val votes = (0 to 31)
      .map(j => s"SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n       |    ")
    val simExpr = (0 to 31)
      .map(j => s"(CASE WHEN b$j >= 0 THEN (CAST(1 AS BIGINT) << $j) " +
        "ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, $wordHash AS h FROM words),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id),
       |sigs AS (
       |  SELECT doc_id, $simExpr AS sim FROM votes),
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
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(vec_dot(v, v))"))
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("v").as("a_v"), col("norm").as("a_norm"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("v").as("b_v"), col("norm").as("b_norm"))
    a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
      .withColumn("dot", expr("vec_dot(a_v, b_v)"))
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
