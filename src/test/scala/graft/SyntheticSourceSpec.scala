package graft

import org.apache.spark.sql.functions._

/** The custom DSv2 connector's pushdown is real, not ceremonial: a
  * pushed id filter narrows the generated interval (visible in the
  * scan description), pruning reaches the reader, and residual
  * filters Spark keeps still evaluate correctly.
  */
class SyntheticSourceSpec extends SparkSpec {

  private def synth(slices: Int) = spark.read
    .format("graft.sources.SyntheticSource")
    .option("rows", "100000").option("slices", slices.toString)
    .load()

  test("pushed id filter narrows the scan range and prunes columns") {
    val q = synth(4).filter(col("id") < 1000).agg(sum(col("value")))
    val got = q.collect().head.getLong(0)
    val want = (0L until 1000L).map(graft.sources.SyntheticSource.valueOf).sum
    assert(got === want)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth [0, 1000)"),
      s"filter did not narrow the generated range:\n$plan")
    // The filter was consumed at the source, so only `value` survives
    // pruning — the reader never materializes ids.
    assert(plan.contains("cols=value"), s"columns not pruned:\n$plan")
  }

  test("unpushable predicates stay residual and evaluate correctly") {
    val q = synth(4).filter(col("value") % 7 === 0)
    val got = q.count()
    val want = (0L until 100000L)
      .count(i => graft.sources.SyntheticSource.valueOf(i) % 7 == 0)
    assert(got === want.toLong)
  }

  test("partition planning splits the (narrowed) range across slices") {
    val q = synth(8).filter(col("id") >= 1000 && col("id") < 51000)
    assert(q.count() === 50000)
    assert(q.rdd.getNumPartitions === 8)
  }
}
