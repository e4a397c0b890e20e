package graft.ops

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse-retrieval scoring over the `documents` fixture: BM25 top-k
  * — the lexical-search complement to the dense-ANN operators in
  * [[Similarity]] (a training-data pipeline uses both: dense for
  * near-dup/semantic clustering, sparse for eval-set retrieval and
  * targeted corpus mining).
  *
  * Scale design (100 TB): the classic inverted-index shape as keyed
  * DataFrames — postings (doc, term, tf) from one explode + keyed agg
  * (map-side combine), document frequencies from one more keyed agg,
  * and the query set (tiny) broadcast against the postings of its
  * terms only, so the scored frame is bounded by the matched postings,
  * never the corpus. The per-query top-k runs on the custom
  * [[graft.plans.TopK]] operator: the shuffle carries queries×k rows
  * instead of sorting every query's full candidate list.
  *
  * Cross-engine determinism: BM25's `ln`-based idf is replaced with
  * the rational idf `(N - df + 0.5) / (df + 0.5)` (same monotone
  * ordering in df; `ln` is the one sub-expression whose libm rounding
  * Spark and DuckDB need not agree on — every op in the rational form
  * is a single IEEE-exact double op on integer-valued inputs). Term
  * scores sum through the DECIMAL(38,6) pattern in [[graft.Cols]], so
  * the per-document score is order-independent.
  */
object Retrieval {

  /** k1 = 1.2, b = 0.75 — the standard BM25 constants, written as
    * exact double literals (`e0` notation parses as DOUBLE in both
    * engines; bare decimal literals would be DECIMAL and pull the
    * whole expression into dialect-specific decimal scale rules).
    * Shared verbatim between the Spark expression and the DuckDB
    * mirror so the IEEE expression trees are identical.
    */
  private val bm25Term: String =
    "((CAST(n - df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0)) * " +
      "((CAST(tf AS DOUBLE) * 2.2e0) / (CAST(tf AS DOUBLE) + (1.2e0 * " +
      "(0.25e0 + (0.75e0 * (CAST(dl AS DOUBLE) / " +
      "(CAST(avgdl_micro AS DOUBLE) / 1000000.0e0)))))))"

  /** The benchmark query set: three multi-term queries over the
    * fixture vocabulary (FIXTURES.md documents the ~40-word domain).
    */
  private val queryTerms: Seq[(Long, String)] = Seq(
    1L -> "data", 1L -> "fast",
    2L -> "table", 2L -> "join",
    3L -> "vector", 3L -> "stream", 3L -> "the")

  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("dl", expr("CAST(size(ws) AS BIGINT)"))
    // Corpus constants: one 1-row aggregate, broadcast. avgdl is
    // carried as exact integer micro-units (BIGINT div) so both
    // engines reconstruct the identical double.
    val tot = docs.agg(
      expr("CAST(COUNT(1) AS BIGINT) AS n"),
      expr("(SUM(dl) * 1000000) div COUNT(1) AS avgdl_micro"))
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("word"))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = postings.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    val queries = queryTerms.toDF("q_id", "word")
    val scored = postings
      .join(broadcast(queries), Seq("word"))
      .join(broadcast(docFreq), Seq("word"))
      .crossJoin(broadcast(tot))
      .withColumn("tscore", expr(bm25Term))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(dsum(col("tscore")).as("score"))
    graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(("score", false), ("doc_id", true)), k = 5)
      .select(col("q_id"), col("doc_id"), col("score"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val bm25TopKOracle: String = {
    val values = queryTerms
      .map { case (q, w) => s"(CAST($q AS BIGINT), '$w')" }
      .mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST((SUM(dl) * 1000000) // COUNT(*) AS BIGINT) AS avgdl_micro
       |  FROM d),
       |p AS (
       |  SELECT doc_id, dl, word, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(ws) AS word FROM d) x
       |  GROUP BY doc_id, dl, word),
       |dfr AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY word),
       |q AS (SELECT * FROM (VALUES $values) t(q_id, word)),
       |scored AS (
       |  SELECT q.q_id, p.doc_id,
       |    CAST(SUM(CAST(($bm25Term) AS DECIMAL(38,6))) AS DOUBLE) AS score
       |  FROM q
       |  JOIN p ON q.word = p.word
       |  JOIN dfr ON p.word = dfr.word
       |  CROSS JOIN tot
       |  GROUP BY q.q_id, p.doc_id),
       |ranked AS (
       |  SELECT q_id, doc_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT q_id, doc_id, score, rnk
       |FROM ranked WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("retr_bm25_topk", bm25TopK, Some(bm25TopKOracle),
      "BM25 top-5 per query (rational idf) on the TopKPerKey operator"))
}
