package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: print the executed plan of a clean catalog read under
  * the (r14-default) native route — pushdown + columnar sanity, and
  * the same query under `spark.graft.read.native=false` for an A/B.
  */
object ExplainNative {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-explain")
    val t = root.resolve("t")
    val df = spark.range(0, 100000).select(col("id"),
      pmod(col("id"), lit(8L)).as("part"),
      (col("id") * 3).as("v"))
    graft.sources.SnapStore.create(spark, t, df, "part")
    spark.conf.set("spark.graft.catalog.dir.expl", root.toString)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val sql =
      "SELECT part, SUM(v) AS s FROM graft.expl.t WHERE id > 500 GROUP BY part"
    val q = spark.sql(sql)
    val t0 = System.nanoTime()
    q.collect()
    println(f"native: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println("=== EXECUTED PLAN (native default) ===")
    println(q.queryExecution.executedPlan.toString)
    spark.conf.set("spark.graft.read.native", "false")
    val q2 = spark.sql(sql)
    val t1 = System.nanoTime()
    q2.collect()
    println(f"legacy: ${(System.nanoTime() - t1) / 1e9}%.3f s")
    println("=== EXECUTED PLAN (legacy plain route) ===")
    println(q2.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
