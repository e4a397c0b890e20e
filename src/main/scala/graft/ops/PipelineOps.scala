package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond dedup/similarity (builder
  * brief): eval-set decontamination, int8 embedding quantization, and
  * a corpus-statistics rollup — the remaining steps a large-scale
  * pretraining-data pipeline runs between raw crawl and tokenizer.
  *
  * Scale design (100 TB):
  * - Decontamination joins on the shingle hash — a keyed equi-join
  *   whose build side (the eval set) is a small fraction of the
  *   corpus, so at scale it broadcasts; candidates are bounded by
  *   distinct (shingle, doc) pairs, never an all-pairs product.
  * - Quantization is a pure per-row map (no shuffle at all).
  * - The stats rollup is one pass: ROLLUP grand totals come from
  *   map-side partial aggregation, not a second scan.
  *
  * Cross-engine determinism: shingle hashes are modular integer
  * folds; quantization uses `floor(x + 0.5)` instead of `round`
  * (floor of an identical IEEE double is bit-deterministic in both
  * engines, with no half-way tie-mode to disagree on) and emits
  * integer-scaled metrics only.
  */
object PipelineOps {

  private val P = 1000000007L

  // ---------------------------------------------------------------
  /** Eval-set decontamination: flag training documents sharing any
    * 6-word shingle with the held-out eval slice (a deterministic 5%
    * hash split of doc_id — no `rand()`, so the split is stable
    * across engines and retries). Per contaminated train doc: how
    * many distinct shingles and eval docs it collides with.
    *
    * Shingle hash = modular fold of the per-word [[graft.functions.FoldHash]]
    * hashes over each 6-word window, so the combine step reuses the
    * codegen'd word hash instead of re-hashing 6× the characters.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val shingled = Tables.documents(s, dir)
      .withColumn("ws", split(col("text"), " "))
      // <6-word docs have no 6-gram; the explicit filter also dodges
      // Spark's descending sequence(1, 0) = [1, 0] edge (ADVICE r1).
      .filter(size(col("ws")) >= 6)
      .withColumn("whs", expr(s"transform(ws, w -> fold_hash(w, 31, 0, $P))"))
      .withColumn("sh", explode(expr(
        "array_distinct(transform(sequence(1, size(whs) - 5), i -> " +
          s"aggregate(slice(whs, i, 6), CAST(0 AS BIGINT), (a, x) -> (a * 131 + x) % $P)))")))
      .withColumn("is_eval", pmod(col("doc_id") * 2654435761L, lit(20)) === 0)
      .select(col("doc_id"), col("sh"), col("is_eval"))
    val eval = shingled.filter(col("is_eval"))
      .select(col("sh"), col("doc_id").as("eval_id"))
    shingled.filter(!col("is_eval"))
      .select(col("doc_id"), col("sh"))
      .join(eval, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("shared_shingles"),
        countDistinct(col("eval_id")).as("eval_docs"))
      .orderBy(col("doc_id"))
  }

  val decontaminateOracle: String = {
    val wordHash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"
    s"""WITH whs AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '), w -> $wordHash) AS whs,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 6),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(range(1, n - 4), i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), whs[i:i+5]),
       |        (a, x) -> (a * 131 + x) % $P)))) AS sh,
       |    (doc_id * 2654435761) % 20 = 0 AS is_eval
       |  FROM whs)
       |SELECT t.doc_id, COUNT(DISTINCT t.sh) AS shared_shingles,
       |  COUNT(DISTINCT e.doc_id) AS eval_docs
       |FROM sh t JOIN sh e ON t.sh = e.sh
       |WHERE NOT t.is_eval AND e.is_eval
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Symmetric int8 quantization of the embedding column: per-vector
    * scale = max|x|/127, q_i = floor(x_i/scale + 0.5). Emits integer
    * metrics only (nano-scaled scale, L1 mass, max code, pico-scaled
    * reconstruction MSE) — `floor` of the same IEEE double on both
    * engines, so no float-comparison ambiguity reaches the gate.
    */
  def quantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("amax",
        expr("aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .filter(col("amax") > 0)
      .withColumn("qscale", col("amax") / 127.0)
      .withColumn("q",
        expr("transform(v, x -> CAST(floor(x / qscale + 0.5) AS BIGINT))"))
      .withColumn("scale_nano",
        expr("CAST(floor(qscale * 1000000000.0) AS BIGINT)"))
      .withColumn("q_l1",
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + abs(x))"))
      .withColumn("q_max", expr("array_max(q)"))
      .withColumn("mse_pico",
        expr("CAST(floor(1000000000000.0 * aggregate(" +
          "zip_with(v, q, (x, qi) -> (x - qi * qscale) * (x - qi * qscale)), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x)) AS BIGINT)"))
      .select(col("vec_id"), col("label"), col("scale_nano"),
        col("q_l1"), col("q_max"), col("mse_pico"))
      .orderBy(col("vec_id"))

  val quantizeOracle: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |scaled AS (
      |  SELECT vec_id, label, v,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) / 127.0 AS qscale
      |  FROM e),
      |quant AS (
      |  SELECT vec_id, label, v, qscale,
      |    list_transform(v, x -> CAST(floor(x / qscale + 0.5) AS BIGINT)) AS q
      |  FROM scaled
      |  WHERE qscale > 0)
      |SELECT vec_id, label,
      |  CAST(floor(qscale * 1000000000.0) AS BIGINT) AS scale_nano,
      |  list_sum(list_transform(q, x -> abs(x))) AS q_l1,
      |  list_max(q) AS q_max,
      |  CAST(floor(1000000000000.0 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, len(v) + 1),
      |      i -> (v[i] - q[i] * qscale) * (v[i] - q[i] * qscale))),
      |    (a, x) -> a + x)) AS BIGINT) AS mse_pico
      |FROM quant
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------
  /** Corpus statistics rollup: per (source, lang) and ROLLUP totals —
    * docs, whitespace tokens, chars, longest doc, and distinct
    * full-text fingerprints (the exact-dup denominator). One pass,
    * map-side partials; grouping NULLs surfaced as '(all)'.
    */
  def corpusStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("ws_tokens", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("fp", expr(TextAnalysis.foldHashExpr("text")))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("ws_tokens")).as("tok_sum"),
        sum(col("n_chars")).as("chars_sum"),
        max(col("ws_tokens")).as("max_tokens"),
        countDistinct(col("fp")).as("distinct_fps"))
      .select(coalesce(col("source"), lit("(all)")).as("source"),
        coalesce(col("lang"), lit("(all)")).as("lang"),
        col("docs"), col("tok_sum"), col("chars_sum"),
        col("max_tokens"), col("distinct_fps"))
      .orderBy(col("source"), col("lang"))
  }

  val corpusStatsOracle: String =
    s"""SELECT coalesce(source, '(all)') AS source,
       |  coalesce(lang, '(all)') AS lang,
       |  COUNT(*) AS docs,
       |  CAST(SUM(ws_tokens) AS BIGINT) AS tok_sum,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       |  CAST(MAX(ws_tokens) AS BIGINT) AS max_tokens,
       |  COUNT(DISTINCT fp) AS distinct_fps
       |FROM (
       |  SELECT source, lang, n_chars,
       |    len(string_split(text, ' ')) AS ws_tokens,
       |    ${TextAnalysis.foldHashSql("text")} AS fp
       |  FROM documents) base
       |GROUP BY ROLLUP(source, lang)
       |ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("pipe_decontaminate", decontaminate, Some(decontaminateOracle),
      "6-gram overlap decontamination of train docs vs a 5% eval split"),
    Q("pipe_quantize_int8", quantize, Some(quantizeOracle),
      "per-vector symmetric int8 quantization with integer metrics"),
    Q("pipe_corpus_stats", corpusStats, Some(corpusStatsOracle),
      "per-(source, lang) ROLLUP of docs/tokens/chars/fingerprints"))
}
