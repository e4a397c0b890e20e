package graft.plans

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry face of the [[TopK]] operator: top-3 events per user by
  * value, ranked by the custom bounded-heap physical operator instead
  * of a sort-based window — the plan has no Sort below the rank. The
  * oracle is the equivalent `row_number()` SQL, proving the operator
  * against an engine that DOES sort.
  */
object TopKQueries {

  def topkPerUser(s: SparkSession, dir: String): DataFrame =
    TopK.perKey(
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value")),
      partCols = Seq("user_id"),
      orderCols = Seq(("value", false), ("event_id", true)),
      k = 3)
      .select(col("user_id"), col("event_id"), col("value"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("user_id"), col("rnk"))

  val topkPerUserOracle: String =
    """SELECT user_id, event_id, value, rnk
      |FROM (
      |  SELECT user_id, event_id, value,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS BIGINT) AS rnk
      |  FROM events) ranked
      |WHERE rnk <= 3
      |ORDER BY user_id, rnk""".stripMargin

  /** The operator inside a corpus-scale pipeline: each document's 3
    * most frequent words (count desc, word asc — a total order). The
    * word counts are one exploded keyed agg; the per-doc cut then
    * never sorts a document's full vocabulary, and the partial pass
    * bounds the shuffle at 3 rows per (doc, input partition).
    */
  def topkTermsPerDoc(s: SparkSession, dir: String): DataFrame =
    TopK.perKey(
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cnt")),
      partCols = Seq("doc_id"),
      orderCols = Seq(("cnt", false), ("word", true)),
      k = 3)
      .select(col("doc_id"), col("word"), col("cnt"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("doc_id"), col("rnk"))

  val topkTermsPerDocOracle: String =
    """WITH counts AS (
      |  SELECT doc_id, word, COUNT(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents) w
      |  GROUP BY doc_id, word)
      |SELECT doc_id, word, cnt, rnk
      |FROM (
      |  SELECT doc_id, word, cnt,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY cnt DESC, word) AS BIGINT) AS rnk
      |  FROM counts) ranked
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  /** Tie-keeping `rank()` mode: top-3 value-decades per user with
    * every tied row kept — the result set is deterministic even
    * though the decade order is not total. The bucket is pure
    * integer arithmetic (`FLOOR` then integer division on positive
    * values) so both engines compute identical keys.
    */
  def topkRankPerUser(s: SparkSession, dir: String): DataFrame =
    TopK.perKey(
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("CAST(FLOOR(value) AS BIGINT) DIV 10").as("bucket")),
      partCols = Seq("user_id"),
      orderCols = Seq(("bucket", false)),
      k = 3,
      mode = RankMode.Rnk)
      .select(col("user_id"), col("event_id"), col("bucket"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("user_id"), col("rnk"), col("event_id"))

  val topkRankPerUserOracle: String =
    """SELECT user_id, event_id, bucket, rnk
      |FROM (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(value) AS BIGINT) // 10 AS bucket,
      |    CAST(RANK() OVER (PARTITION BY user_id
      |      ORDER BY CAST(FLOOR(value) AS BIGINT) // 10 DESC) AS BIGINT) AS rnk
      |  FROM events) ranked
      |WHERE rnk <= 3
      |ORDER BY user_id, rnk, event_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("plan_topk_per_key", topkPerUser, Some(topkPerUserOracle),
      "custom TopKPerKey LogicalPlan/SparkPlan: heap-based per-key top-3"),
    Q("plan_topk_terms", topkTermsPerDoc, Some(topkTermsPerDocOracle),
      "TopKPerKey in a pipeline: per-doc top-3 terms, sort-free"),
    Q("plan_topk_rank", topkRankPerUser, Some(topkRankPerUserOracle),
      "TopKPerKey rank() mode: tie-keeping top-3 buckets per user"))
}
