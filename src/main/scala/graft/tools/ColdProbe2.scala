package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: suite-context timing attribution — register everything
  * (timed), run K tpcds corpus queries, then time corpus_tpch_q01
  * cold and warm. K=0 isolates registration + first-query cost; a
  * large K reproduces in-suite session decay (the r9 retained-
  * executions finding). Usage: ColdProbe2 <sfDir> <K> [cpus].
  */
object ColdProbe2 {
  private def timed(label: String)(body: => Unit): Unit = {
    val t0 = System.nanoTime()
    body
    println(f"PROBE2 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 2) args(2) else "32"
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.TopK.register(s)
    s.conf.set("spark.graft.topk.rewrite", "true")
    val dir = args(0)
    timed("register-corpus") { graft.queries.Corpus.register(s, dir) }
    timed("register-tpcds") { graft.queries.TpcdsCorpus.register(s, dir) }
    val k = args(1).toInt
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("corpus_tpcds")).take(k)
    names.foreach { n =>
      graft.SparkEntry.queries(n)(s, dir)
        .write.format("noop").mode("overwrite").save()
      s.catalog.clearCache()
    }
    timed(s"q01-after-$k") {
      graft.SparkEntry.queries("corpus_tpch_q01")(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    s.catalog.clearCache()
    timed("q01-warm") {
      graft.SparkEntry.queries("corpus_tpch_q01")(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
