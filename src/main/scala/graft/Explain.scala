package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally time)
  * for registry queries matching a substring.
  * Usage: runMain graft.Explain <sfDir> <nameSubstring> [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pat = args(1)
    val doTime = args.length > 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "audit" mode: scan every query's physical plan for operators
    // that would not survive a 100× scale-up — cartesian products,
    // nested-loop joins on non-trivial inputs, single-partition sorts
    // of unbounded data.
    if (pat == "audit") {
      Registry.all.foreach { q =>
        val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
          .collect { case (f, true) => f }
        if (flags.nonEmpty) println(s"[audit] ${q.name}: ${flags.mkString(", ")}")
      }
      println("[audit] done")
      spark.stop()
      return
    }
    Registry.all.filter(_.name.contains(pat)).foreach { q =>
      println(s"===== ${q.name}")
      val df = q.fn(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (doTime) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[time] ${q.name} rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
