package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: Bench-faithful isolated timing — the clock starts BEFORE
  * `fn(s, dir)` is called, so queries that run driver-looped jobs
  * during DataFrame construction (dedup_clusters, graph_pagerank_iter,
  * pipe_kmeans_converge) are measured like the suite measures them
  * (QTime/QTimeMany start the clock after construction and
  * under-measure those).
  *
  * Usage: TimeFull <sfDir> <reps> <name1> [<name2> ...]
  */
object TimeFull {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // A/B knob for session-conf experiments, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.join.preferSortMergeJoin=false;k=v"
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.enabled", "false")
    val s = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.TopK.register(s)
    s.conf.set("spark.graft.topk.rewrite", "true")
    graft.queries.Corpus.register(s, args(0))
    graft.queries.TpcdsCorpus.register(s, args(0))
    graft.queries.Bucketed.register(s, args(0))
    graft.queries.PartitionedWarehouse.register(s, args(0))
    val dir = args(0)
    val reps = args(1).toInt
    args.drop(2).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(s, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEFULL $name min=${times.min}%.2f " +
        times.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    s.stop()
  }
}
