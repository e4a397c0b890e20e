package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write the formatted physical plan of named registry
  * queries to `<outDir>/<name>_<suffix>.txt` — the before/after plan
  * evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name1> [...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Same planner default as the Bench/Verify/Runner sessions so
    // dumped plans match what the bench times; override per dump via
    // SPARK_GRAFT_PREFER_SMJ to capture a before/after conf diff.
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopK.register(spark)
    spark.conf.set("spark.graft.topk.rewrite", "true")
    // SPARK_GRAFT_PLANDUMP_EXEC=1: run the query through the noop
    // sink first so the dump shows the FINAL adaptive plan (AQE join
    // rewrites, coalesced reads) instead of the initial one.
    val exec = sys.env.get("SPARK_GRAFT_PLANDUMP_EXEC").contains("1")
    args.drop(3).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, dir)
      // collect() drives df's OWN QueryExecution (a noop write plans
      // a fresh one), so the explain below shows isFinalPlan=true
      // with AQE's runtime join rewrites in place.
      if (exec) df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), txt)
      spark.catalog.clearCache()
      println(s"[plandump] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
