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
      val warm = fn(s, dir)
      val t0 = System.nanoTime()
      warm.write.format("noop").mode("overwrite").save()
      println(f"QTIME $name ${(System.nanoTime() - t0) / 1e9}%.2f")
      warm.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("InMemoryTableScan"))
        .map(_.trim.takeWhile(_ != '[').take(80))
        .foreach(l => println("  " + l))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
