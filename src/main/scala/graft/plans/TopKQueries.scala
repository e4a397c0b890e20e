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

  def all: Seq[Q] = Seq(
    Q("plan_topk_per_key", topkPerUser, Some(topkPerUserOracle),
      "custom TopKPerKey LogicalPlan/SparkPlan: heap-based per-key top-3"))
}
