package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("corpus_tpcds_q03", "corpus_tpcds_q42")) {
      val df = graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.filter(l => l.contains("PushedFilters") && !l.contains("PushedFilters: []")).toSeq
      println(s"== $q pushed-filter scans: ${pushed.size}")
      pushed.take(4).foreach(l => println("   " + l.trim.take(160)))
      println(s"   rows=${df.count()}")
    }
    s.stop()
  }
}
