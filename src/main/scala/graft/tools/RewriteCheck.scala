package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: with spark.graft.topk.rewrite=true, how many corpus
  * queries actually plan through TopKPerKey, and do their results
  * stay identical to the rule-off plans?
  */
object RewriteCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    graft.plans.TopK.register(s)
    val corpus = graft.SparkEntry.queries.keys.filter(_.startsWith("corpus_")).toSeq.sorted
    var hit = Seq.empty[String]
    s.conf.set("spark.graft.topk.rewrite", "true")
    corpus.foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, dir)
      if (df.queryExecution.optimizedPlan.toString.contains("TopKPerKey")) hit :+= name
    }
    println(s"rewrite hits: ${hit.size} of ${corpus.size}: ${hit.mkString(", ")}")
    // Value-compare hit queries rule-on vs rule-off.
    hit.foreach { name =>
      val on = graft.SparkEntry.queries(name)(s, dir).collect().map(_.toString).sorted
      s.conf.set("spark.graft.topk.rewrite", "false")
      val off = graft.SparkEntry.queries(name)(s, dir).collect().map(_.toString).sorted
      s.conf.set("spark.graft.topk.rewrite", "true")
      println(s"$name: ${if (on.toSeq == off.toSeq) "EQUAL" else "MISMATCH"} (${on.length} rows)")
    }
    s.stop()
  }
}
