package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: time corpus_tpcds_q72 in isolation and audit its join
  * plan (round-2 verdict ask: confirm the ~5 s is the 10-way join,
  * not a missing broadcast).
  */
object Q72Check {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("corpus_tpcds_q72")
    fn(s, dir).write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    fn(s, dir).write.format("noop").mode("overwrite").save()
    println(f"q72 warm isolated: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val plan = fn(s, dir).queryExecution.executedPlan.toString
    val joins = plan.linesIterator.filter(l =>
      l.contains("Join")).map(_.trim.takeWhile(_ != '[')).toSeq
    joins.foreach(j => println("  " + j.take(120)))
    s.stop()
  }
}
