package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of pipe_dsir_topk's plan to find
  * where its wall time goes. Not part of any registered surface.
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val P = 1000000007L
    val B = 512L
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = graft.Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
    t("scan+split count")(base.count())
    val whs = base
      .withColumn("whs", expr(s"transform(ws, w -> fold_hash(w, 31, 0, $P))"))
    t("word hashes")(whs.select(sum(size(col("whs")))).collect())
    val feats0 = whs.withColumn("feats", expr(
      s"""concat(
         |  transform(whs, h -> pmod(h, ${B}L)),
         |  transform(sequence(1, size(whs) - 1), i ->
         |    pmod((element_at(whs, i) * 131 + element_at(whs, i + 1))
         |      % $P, ${B}L)))""".stripMargin))
    t("feats arrays")(feats0.select(sum(size(col("feats")))).collect())
    val exploded = feats0
      .withColumn("is_target", pmod(col("doc_id") * 2654435761L, lit(10L)) === 0)
      .select(col("doc_id"), col("is_target"), explode(col("feats")).as("b"))
    t("explode count")(exploded.count())
    val docBucket = exploded.groupBy(col("doc_id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("n"))
    t("docBucket agg")(docBucket.count())
    val counts = docBucket.groupBy(col("b")).agg(
      sum(when(col("is_target"), col("n")).otherwise(0L)).as("ct"),
      sum(when(!col("is_target"), col("n")).otherwise(0L)).as("cr"))
    t("bucket counts")(counts.count())
    val totals = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val contrib = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        ((col("ct") + 1) * (col("tr") + B) -
          (col("cr") + 1) * (col("tt") + B)).as("contrib"))
    t("contrib")(contrib.count())
    val out = docBucket.filter(!col("is_target"))
      .join(broadcast(contrib), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(25)
    t("full first run")(out.collect())
    t("full second run")(out.collect())

    // Isolation probes: which lambda is the interpreted cost?
    val uniOnly = whs.select(explode(expr(
      s"transform(whs, h -> pmod(h, ${B}L))")).as("b"))
    t("uni explode sum")(uniOnly.select(sum(col("b"))).collect())
    val bigOnly = whs.select(explode(expr(
      s"""transform(sequence(1, size(whs) - 1), i ->
         |  pmod((element_at(whs, i) * 131 + element_at(whs, i + 1))
         |    % $P, ${B}L))""".stripMargin)).as("b"))
    t("bigram explode sum")(bigOnly.select(sum(col("b"))).collect())
    val hashOnly = base.select(explode(expr(
      s"transform(ws, w -> fold_hash(w, 31, 0, $P))")).as("h"))
    t("hash explode sum")(hashOnly.select(sum(col("h"))).collect())
    val scalarHash = base
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i", "w")))
      .select(expr(s"fold_hash(w, 31, 0, $P)").as("h"))
    t("posexplode+scalar hash")(scalarHash.select(sum(col("h"))).collect())
    spark.stop()
  }
}
