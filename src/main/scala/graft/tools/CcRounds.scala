package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: round count + per-round wall time of the dedup
  * connected-components loop at a fixture, to size round-reduction
  * work (pointer jumping) against per-round job overhead.
  * Usage: CcRounds <sfDir>
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val links = graft.ops.Dedup.minhashLsh(s, dir)
      .filter(col("jacc") >= 0.8).select(col("a_id"), col("b_id"))
    val edges = links.union(links.select(col("b_id"), col("a_id")))
      .toDF("src", "dst").distinct().cache()
    println(s"[cc] edges=${edges.count()} nodes=${edges.select("dst").distinct().count()}")
    var labels = graft.ops.Pin.pin(edges.select(col("dst").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val t0 = System.nanoTime()
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(min(col("lbl")).as("nlbl"))
      val step = graft.ops.Pin.pin(labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")),
        supersedes = Some(labels))
      changed = step.filter(col("lbl") < col("old")).count()
      labels = step.select(col("node"), col("lbl"))
      rounds += 1
      println(f"[cc] round $rounds changed=$changed dt=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    s.stop()
  }
}
