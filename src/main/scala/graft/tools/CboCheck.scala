package graft.tools
import org.apache.spark.sql.SparkSession
object CboCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.queries.TpcdsCorpus.register(s, dir)
    for (t <- Seq("catalog_sales", "catalog_returns", "date_dim")) {
      val t0 = System.nanoTime()
      s.sql(s"ANALYZE TABLE tpcds.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      println(f"analyzed $t in ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    val plan = graft.SparkEntry.queries("corpus_tpcds_q77")(s, dir)
      .queryExecution.executedPlan.toString
    println("cartesian=" + plan.contains("CartesianProduct") +
      " bnlj=" + plan.contains("BroadcastNestedLoopJoin"))
    s.stop()
  }
}
