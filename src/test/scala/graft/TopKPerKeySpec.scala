package graft

import graft.plans.{TopK, TopKPerKeyExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The custom TopKPerKey operator: value-equal to the sort-based
  * row_number window, physically sort-free, planned as partial →
  * exchange → final, and (opt-in) substituted for window+filter by
  * the rewrite rule.
  */
class TopKPerKeySpec extends SparkSpec {

  private def events = Tables.events(spark, sf)
    .select(col("user_id"), col("event_id"), col("value"))

  test("TopK.perKey equals the row_number window form") {
    val got = plans.TopKQueries.topkPerUser(spark, sf).collect()
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val want = events
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rnk"))
      .orderBy(col("user_id"), col("rnk"))
      .collect()
    assert(got.length === want.length)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  test("plan is partial+final heap execs with no Sort") {
    val df = TopK.perKey(events, Seq("user_id"),
      Seq(("value", false), ("event_id", true)), 3)
    // AQE wraps the tree, so assert on the rendered plan.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey 3") && plan.contains("true") &&
      plan.contains("false"), plan)
    assert(!plan.contains("Sort "), plan)
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan)
  }

  test("opt-in rewrite rule substitutes window+filter top-k") {
    TopK.register(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    def windowed = events
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
    // Flag off (default): the normal window plan, no custom exec.
    assert(!windowed.queryExecution.executedPlan.toString
      .contains("TopKPerKey"))
    val baseline = windowed.orderBy("user_id", "rnk").collect()
    spark.conf.set("spark.graft.topk.rewrite", "true")
    try {
      val rewritten = windowed
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey 2"), plan)
      // The heap operator subsumes Spark's sort-based
      // WindowGroupLimit — neither it nor any Sort may remain.
      assert(!plan.contains("WindowGroupLimit"), plan)
      assert(!plan.contains("Sort "), plan)
      assert(rewritten.orderBy("user_id", "rnk").collect()
        .map(_.toString).toSeq === baseline.map(_.toString).toSeq)
    } finally spark.conf.set("spark.graft.topk.rewrite", "false")
  }
}
