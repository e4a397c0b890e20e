package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventWindows

/** Structured Streaming faces (watermark + windowed agg + stateful
  * dedup) converge to the batch faces on the same fixture.
  */
class StreamingSpec extends SparkSpec {

  private def runToMemory(name: String, df: org.apache.spark.sql.DataFrame,
      mode: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  test("streaming tumbling agg converges to the batch face") {
    val stream = EventWindows.tumblingStream(EventWindows.streamingEvents(spark, sf))
    runToMemory("tumbling_mem", stream, "complete")
    val got = spark.table("tumbling_mem")
      .orderBy("wstart", "event_type")
      .collect()
    val want = EventWindows.tumbling(spark, sf).collect()
    assert(got.length === want.length)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  test("streaming dedup emits one row per (user_id, event_type)") {
    val stream = EventWindows.dedupStream(EventWindows.streamingEvents(spark, sf))
    runToMemory("dedup_mem", stream, "append")
    val got = spark.table("dedup_mem").count()
    val want = EventWindows.dedupEarliest(spark, sf).count()
    assert(got === want)
  }

  test("mapGroupsWithState running per-user counts match batch counts") {
    val stream = EventWindows.runningPerUserStream(
      EventWindows.streamingEvents(spark, sf))
    runToMemory("state_mem", stream.toDF(), "update")
    // Last snapshot per user carries the converged running count.
    val got = spark.sql(
      """SELECT user_id, max(events) AS events FROM state_mem GROUP BY user_id""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
