package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-located-join pattern: two tables bucketed on the
  * join key join WITHOUT any shuffle exchange — each task zips the
  * matching bucket files. This is the layout the builder brief's
  * "repartition()/bucketing for co-located joins" refers to: at scale,
  * repeated joins on a stable key (doc_id, user_id) amortize one
  * bucketed write into shuffle-free reads forever after. The spec pins
  * both the plan shape (no Exchange under SortMergeJoin) and the
  * values (equal to the unbucketed join).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange, same values") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"))
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"))
    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/bkt_docs").saveAsTable("bkt_docs")
    toks.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/bkt_toks").saveAsTable("bkt_toks")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force the non-broadcast path: the claim under test is that the
      // *shuffle* disappears, which only an SMJ/SHJ plan can show.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_docs").join(spark.table("bkt_toks"), "doc_id")
      val got = j.orderBy("doc_id").collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle or broadcast:\n$plan")
      val want = docs.join(toks, Seq("doc_id")).orderBy("doc_id").collect()
      assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_toks")
    }
  }
}
