package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** End-to-end dynamic partition pruning: Spark's PartitionPruning
  * rule injects a runtime filter into the native scan (its
  * SupportsRuntimeV2Filtering face) from a real selective dimension
  * join, and whole files drop from the scan by manifest bounds — the
  * scan's own description records the post-filter file count.
  */
class DppSpec extends SparkSpec {
  test("a selective dim join injects a dynamicpruning subquery into " +
    "the native scan, whole files prune, and results match") {
    val dir = Files.createTempDirectory("graft-dpp-e2e")
    dir.toFile.deleteOnExit()
    val rows = spark.range(0, 4000).select(col("id"),
      pmod(col("id"), lit(8L)).as("part"), (col("id") * 3).as("x"))
    val t = dir.resolve("fact")
    SnapStore.create(spark, t, rows.filter(col("part") === 0L), "part")
    (1L to 7L).foreach(p =>
      SnapStore.append(spark, t, rows.filter(col("part") === p), "part"))
    // Pending MOR delete so the table routes through the native scan
    // regardless of the bucketing conf.
    SnapStore.deleteEquality(spark, t,
      spark.range(0, 10).select(col("id")), "id")
    spark.conf.set("spark.graft.catalog.dir.dppe2e", dir.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dim = spark.range(0, 8).select(col("id").as("part"),
      concat(lit("n-"), col("id")).as("name"))
    dim.createOrReplaceTempView("dpp_dim")
    val q = spark.sql(
      """SELECT f.part, COUNT(*) AS n
        |FROM graft.dppe2e.fact f JOIN dpp_dim d ON f.part = d.part
        |WHERE d.name = 'n-3'
        |GROUP BY f.part""".stripMargin)
    val got = q.collect()
    assert(got.length == 1 && got.head.getLong(1) == 499L,
      s"part=3 holds 500 rows minus 1 MOR-deleted (id=3): ${got.toSeq}")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruningexpression"),
      s"Spark must inject the runtime filter into the scan:\n$plan")
    // The scan's description renders post-runtime-filter file counts:
    // one of eight single-valued files survives part=3.
    assert(plan.contains("1/8 files"),
      s"manifest bounds must drop the other 7 files:\n$plan")
  }
}
