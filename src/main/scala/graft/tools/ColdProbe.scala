package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: cold-vs-warm attribution for one query after the SAME
  * pre-registration Bench performs — isolates what the first timed
  * invocation pays beyond the plan (catalog warm-up, codegen, IO).
  *
  * Usage: ColdProbe <sfDir> <name> [cpus]
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 2) args(2) else "32"
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.TopK.register(s)
    s.conf.set("spark.graft.topk.rewrite", "true")
    val dir = args(0)
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("register-corpus") { graft.queries.Corpus.register(s, dir) }
    t("register-tpcds") { graft.queries.TpcdsCorpus.register(s, dir) }
    val fn = graft.SparkEntry.queries(args(1))
    t("cold") { fn(s, dir).write.format("noop").mode("overwrite").save() }
    s.catalog.clearCache()
    t("warm") { fn(s, dir).write.format("noop").mode("overwrite").save() }
    s.catalog.clearCache()
    t("warm2") { fn(s, dir).write.format("noop").mode("overwrite").save() }
    s.stop()
  }
}
