package graft.tools
import org.apache.spark.sql.SparkSession
object Q77Plan {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("corpus_tpcds_q77")(s, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    val i = plan.indexOf("CartesianProduct")
    println(plan.substring(math.max(0, i - 1500), math.min(plan.length, i + 3500)))
    s.stop()
  }
}
