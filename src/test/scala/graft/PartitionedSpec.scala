package graft

import org.apache.spark.sql.functions._

/** Partitioned-warehouse pruning through the named DSv2 catalog
  * (`partitioned_runner.sh` equivalence): a year filter on the
  * partition column must eliminate other years' directories at
  * planning time, and values must equal the flat-path computation.
  */
class PartitionedSpec extends SparkSpec {

  test("year filter prunes partition directories in the catalog scan") {
    queries.PartitionedWarehouse.register(spark, sf)
    val q = spark.table("graft.tpch_part.lineitem")
      .filter(col("l_shipyear") === 1997)
      .agg(count(lit(1)).as("n"))
    val n = q.collect().head.getLong(0)
    // Ground truth from the raw fixture.
    val want = Tables.lineitem(spark, sf)
      .filter(year(to_date(col("l_shipdate"))) === 1997).count()
    assert(n === want && want > 0)
    // The scan's file set must be the pruned one: strictly fewer
    // files reach the BatchScan's planned input partitions than the
    // unfiltered table's (pushdown runs in the optimizer, so the
    // pre-AQE sparkPlan already carries the pruned file list).
    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.length.toLong
          }.sum
      }.sum
    val all = spark.table("graft.tpch_part.lineitem").agg(count(lit(1)))
    assert(files(q) > 0 && files(q) < files(all),
      s"pruned=${files(q)} total=${files(all)}")
  }

  test("partitioned-scan entry equals the flat-path aggregation") {
    val part = queries.PartitionedWarehouse.partitionedScan(spark, sf).collect()
    val flat = Tables.lineitem(spark, sf)
      .filter(year(to_date(col("l_shipdate"))) === 1997)
      .groupBy(month(to_date(col("l_shipdate"))).as("ship_month"))
      .agg(count(lit(1)).as("n"),
        Cols.dsum(Cols.revenue(col("l_extendedprice"), col("l_discount")))
          .as("rev"))
      .orderBy(col("ship_month"))
      .collect()
    assert(part.toSeq === flat.toSeq)
  }
}
