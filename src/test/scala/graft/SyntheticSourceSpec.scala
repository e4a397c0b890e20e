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

  test("vectorized read path: ColumnarBatch scan, identical values") {
    val rowPath = synth(4).filter(col("id") % 7 === 3)
      .groupBy(col("bucket")).agg(sum(col("value")).as("s"))
      .orderBy(col("bucket")).collect()
    val q = spark.read.format("graft.sources.SyntheticSource")
      .option("rows", "100000").option("slices", "4")
      .option("vectorized", "true").load()
      .filter(col("id") % 7 === 3)
      .groupBy(col("bucket")).agg(sum(col("value")).as("s"))
      .orderBy(col("bucket"))
    assert(q.collect().toSeq === rowPath.toSeq)
    // Inspect AFTER execution: AQE only materializes the columnar
    // transition (ColumnarToRow above the batch scan) in the final
    // per-stage plans.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"vectorized scan did not produce a columnar plan:\n$plan")
  }

  test("vectorized + key-grouped bucket partitions agree with row path") {
    def read(vec: Boolean) = spark.read
      .format("graft.sources.SyntheticSource")
      .option("rows", "50000").option("buckets", "16")
      .option("keyGrouped", "true").option("vectorized", vec.toString)
      .load()
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .orderBy(col("bucket"))
    assert(read(vec = true).collect().toSeq === read(vec = false).collect().toSeq)
  }

  test("time travel: VERSION AS OF serves quarterly snapshots with pushdown") {
    spark.conf.set("spark.sql.catalog.tt_cat", "graft.sources.GraftCatalog")
    try {
      (1 to 4).foreach { v =>
        val n = spark.sql(
          s"SELECT count(*) AS n FROM tt_cat.synth.rows_100000 VERSION AS OF '$v'")
          .collect().head.getLong(0)
        assert(n === 100000L * v / 4, s"snapshot $v")
      }
      // Pushdown still narrows the snapshot scan.
      val q = spark.sql(
        "SELECT * FROM tt_cat.synth.rows_100000 VERSION AS OF '2' WHERE id < 100")
      assert(q.count() === 100)
      assert(q.queryExecution.executedPlan.toString.contains("graft-synth [0, 100)"))
      // Unknown snapshot → analysis error, like a missing Iceberg version.
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT count(*) FROM tt_cat.synth.rows_100000 VERSION AS OF '9'")
          .collect()
      }
    } finally spark.conf.unset("spark.sql.catalog.tt_cat")
  }

  test("connector's custom_scan_time metric reaches the listener rollup") {
    val listener = new MetricListener
    spark.sparkContext.addSparkListener(listener)
    try {
      listener.reset()
      listener.clearStages()
      // 2M generated rows so the scan wall time is measurably > 0 ms;
      // SUM(value) is refused by agg pushdown, forcing the row scan.
      spark.read.format("graft.sources.SyntheticSource")
        .option("rows", "2000000").option("slices", "4").load()
        .agg(sum(col("value"))).collect()
      val execId = listener.awaitExecutionId(10000)
      assert(execId.isDefined, "no SQL execution id observed")
      Thread.sleep(2000) // drain the listener bus (Runner does the same)
      val (_, scanMs) = listener.metrics(execId.get)
      assert(scanMs > 0,
        s"custom_scan_time accumulables did not reach the stage rollup ($scanMs)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("filter boundary cases: empty ranges and point lookups") {
    // Entirely above the table: zero partitions, zero rows.
    assert(synth(4).filter(col("id") >= 200000L).count() === 0)
    // Contradictory range: lo > hi collapses to empty.
    assert(synth(4).filter(col("id") > 500L && col("id") < 100L).count() === 0)
    // Point lookup: EqualTo narrows to a single generated row.
    val row = synth(4).filter(col("id") === 4242L).collect()
    assert(row.length === 1)
    assert(row.head.getLong(2) === graft.sources.SyntheticSource.valueOf(4242L))
    // Single-row boundary at the table edge.
    assert(synth(4).filter(col("id") >= 99999L).count() === 1)
  }

  private def synthGrouped(rows: Long) = spark.read
    .format("graft.sources.SyntheticSource")
    .option("rows", rows.toString).option("buckets", "8")
    .option("keyGrouped", "true")
    .load()

  test("storage-partitioned join: key-grouped scans join with no exchange") {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val a = synthGrouped(4000).select(col("bucket"), col("value").as("va"))
      val b = synthGrouped(8000).select(col("bucket"), col("value").as("vb"))
      val j = a.join(b, Seq("bucket"))
      // 500 × 1000 pairs per bucket × 8 buckets.
      assert(j.count() === 4000000L)
      val plan = j.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("ShuffledHashJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"key-grouped join still shuffled:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("aggregate pushdown: COUNT/MIN/MAX compute in closed form at the source") {
    val df = synth(4).filter(col("id") >= 100 && col("id") < 90000)
    val q = df.agg(count(lit(1)).as("n"),
      min(col("id")).as("mn"), max(col("id")).as("mx"))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((89900L, 100L, 89999L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth-agg") && plan.contains("aggPushed="),
      s"aggregate was not pushed:\n$plan")

    val g = synth(4).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), max(col("id")).as("mx"))
    val rows = g.orderBy("bucket").collect()
      .map(r2 => (r2.getInt(0), r2.getLong(1), r2.getLong(2)))
    // 100000 rows over 16 buckets: 6250 each; max id ≡ bucket (mod 16).
    assert(rows.length === 16)
    assert(rows.forall { case (b, n, mx) =>
      n === 6250L && mx === (99984 + b).toLong })
    val gplan = g.queryExecution.executedPlan.toString
    assert(gplan.contains("grouped=true"), s"grouped agg not pushed:\n$gplan")

    // SUM(value) has no closed form here — the source must REFUSE the
    // pushdown and Spark falls back to the row scan.
    val s = synth(4).agg(sum(col("value")))
    assert(!s.queryExecution.executedPlan.toString.contains("graft-synth-agg"))
    val got = s.collect().head.getLong(0)
    val want = (0L until 100000L).map(graft.sources.SyntheticSource.valueOf).sum
    assert(got === want)
  }

  test("runtime V2 filtering: a selective dim join dynamically prunes buckets") {
    import SparkSpec.spark.implicits._
    graft.sources.SyntheticScan.resetRuntimeFilter()
    val fact = synthGrouped(100000)
    // DPP plans only when the dim side carries a selective predicate
    // on a NON-join column (a join-key predicate would just be
    // inferred across the join as a static filter, no runtime pruning
    // needed — verified: InferFiltersFromConstraints kicks in first).
    val dim = spark.range(0, 8)
      .select(col("id").cast("int").as("b"), (col("id") % 2).as("flag"))
      .filter(col("flag") === 1)
    val j = fact.join(broadcast(dim), col("bucket") === col("b"))
    // 100000 rows over 8 buckets; the 4 odd buckets survive.
    assert(j.count() === 50000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning was planned:\n$plan")
    assert(graft.sources.SyntheticScan.runtimeFilterValues === 4,
      "the scan never received the runtime IN filter")
  }

  test("key-grouped aggregation needs no exchange either") {
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val q = synthGrouped(4000).groupBy(col("bucket"))
        .agg(sum(col("value")).as("s"))
      val got = q.orderBy("bucket").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = (0L until 4000L).groupBy(i => (i % 8).toInt)
        .map { case (b, ids) =>
          b -> ids.map(graft.sources.SyntheticSource.valueOf).sum }
      assert(got === want)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"key-grouped aggregate still shuffled:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }
}
