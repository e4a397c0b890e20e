package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: isolated warm timing + join audit for one query. */
object QTime {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val name = args(1)
    val fn = graft.SparkEntry.queries(name)
    fn(s, dir).write.format("noop").mode("overwrite").save()
    // Time and audit the SAME DataFrame instance: a fresh fn(s, dir)
    // plans a fresh queryExecution, which for cached-CTE queries shows
    // the logical double-build instead of the InMemoryRelation that
    // actually executed (VERDICT r4 "What's wrong" #2).
    val warm = fn(s, dir)
    val t0 = System.nanoTime()
    warm.write.format("noop").mode("overwrite").save()
    println(f"$name warm: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    warm.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("InMemoryTableScan"))
      .map(_.trim.takeWhile(_ != '[').take(80))
      .foreach(l => println("  " + l))
    s.stop()
  }
}
