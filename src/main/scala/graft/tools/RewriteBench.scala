package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: q67/q70 wall-clock with the TopKPerKey rewrite on vs off. */
object RewriteBench {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.plans.TopK.register(s)
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("corpus_tpcds_q67", "corpus_tpcds_q70"); _ <- 1 to 2) {
      s.conf.set("spark.graft.topk.rewrite", "false")
      val off = time(q)
      s.conf.set("spark.graft.topk.rewrite", "true")
      val on = time(q)
      println(f"$q: off=$off%.2f s  on=$on%.2f s")
    }
    s.stop()
  }
}
