package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: isolated warm timing for MANY queries in one session —
  * the per-round NOTES heavy-tail table (suite medians on the shared
  * bench box are steal-dominated; an isolated warm run is the
  * per-query signal). Each query runs cold then warm; the warm time
  * and the executed plan's join lines are printed.
  *
  * Usage: QTimeMany <sfDir> <name1> [<name2> ...]
  */
object QTimeMany {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.TopK.register(s)
    s.conf.set("spark.graft.topk.rewrite", "true")
    val dir = args(0)
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(s, dir).write.format("noop").mode("overwrite").save() // cold
      s.catalog.clearCache()
      // Two warm numbers, because cached-CTE queries have two honest
      // costs: `warm` includes rebuilding any frame the query caches
      // (what the Bench suite pays — it clears caches between
      // queries), `hot` re-runs with those caches populated (what
      // QTime reports). Printing both keeps the tools comparable.
      val warm = fn(s, dir)
      val t0 = System.nanoTime()
      warm.write.format("noop").mode("overwrite").save()
      val tWarm = (System.nanoTime() - t0) / 1e9
      val hot = fn(s, dir)
      val t1 = System.nanoTime()
      hot.write.format("noop").mode("overwrite").save()
      val tHot = (System.nanoTime() - t1) / 1e9
      println(f"QTIME $name warm=$tWarm%.2f hot=$tHot%.2f")
      hot.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("InMemoryTableScan"))
        .map(_.trim.takeWhile(_ != '[').take(80))
        .foreach(l => println("  " + l))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
