package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: run a list of queries in bench order (noop sink +
  * clearCache between) to localize positional costs.
  */
object SeqTime {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    graft.queries.Corpus.register(s, dir)
    graft.queries.TpcdsCorpus.register(s, dir)
    graft.plans.TopK.register(s)
    s.conf.set("spark.graft.topk.rewrite", "true")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      s.catalog.clearCache()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
