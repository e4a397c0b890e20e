package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the reference's Parquet + CSV
  * sink: JSON, ORC, and CSV round-trips preserve the documents table
  * bit-for-bit (schema pinned on read where the format is untyped).
  * Each is a plain `spark.read`/`df.write` — the same DataFrame
  * programs run against any of these sources unchanged.
  */
class FormatsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("text"))
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq

  test("documents round-trip through JSON, ORC, and CSV unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("text"))
    val want = canon(src)

    src.write.mode("overwrite").json(s"$dir/json")
    assert(canon(spark.read.schema(src.schema).json(s"$dir/json")) === want)

    src.write.mode("overwrite").orc(s"$dir/orc")
    assert(canon(spark.read.orc(s"$dir/orc")) === want)

    src.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      .csv(s"$dir/csv")
    assert(canon(spark.read.schema(src.schema)
      .option("header", "true").option("escape", "\"").csv(s"$dir/csv")) === want)
  }
}
