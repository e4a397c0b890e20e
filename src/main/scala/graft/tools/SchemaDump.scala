package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the Spark result schema (exact decimal
  * precision/scale) of a verbatim corpus file — used to pin the
  * DuckDB oracle mirrors of Spark's decimal division/avg semantics.
  *
  * Usage: runMain graft.tools.SchemaDump <sfDir> <tpcds|tpch> <name>
  */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, corpus, name) = (args(0), args(1), args(2))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (dir, db) = corpus match {
      case "tpcds" =>
        graft.queries.TpcdsCorpus.register(spark, sfDir)
        (graft.queries.TpcdsCorpus.corpusDir, graft.queries.TpcdsCorpus.db)
      case _ =>
        graft.queries.Corpus.register(spark, sfDir)
        (graft.queries.Corpus.corpusDir, graft.queries.Corpus.db)
    }
    val raw = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/$name.sql"))
    val sql = graft.Runner.template(raw, "spark_catalog", db).trim.stripSuffix(";")
    val df = spark.sql(sql)
    println("=== SCHEMA " + name)
    df.schema.fields.foreach(f => println(s"  ${f.name}: ${f.dataType.sql}"))
    spark.stop()
  }
}
