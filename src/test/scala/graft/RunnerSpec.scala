package graft

import java.nio.file.Files

/** Harness-parity behaviors: discovery order, templating, noop
  * execution, continue-on-failure with truncation, results CSV shape
  * (`IcebergBenchmark.java:149-222,388-399` semantics).
  */
class RunnerSpec extends SparkSpec {

  private def writeQueries(): String = {
    val dir = Files.createTempDirectory("graft-queries")
    Files.writeString(dir.resolve("q02_count.sql"),
      "SELECT COUNT(*) AS c FROM ${database}${schema}lineitem")
    Files.writeString(dir.resolve("q01_agg.sql"),
      "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem GROUP BY 1")
    Files.writeString(dir.resolve("q03_bad.sql"),
      "SELECT no_such_column FROM lineitem")
    Files.writeString(dir.resolve("notes.txt"), "ignored")
    dir.toString
  }

  test("discovery lists only .sql files, sorted by filename") {
    val dir = writeQueries()
    val names = Runner.discoverQueries(dir).map(_._1)
    assert(names === Seq("q01_agg", "q02_count", "q03_bad"))
  }

  test("templating replaces placeholders verbatim") {
    assert(Runner.template("USE ${database}.${schema}; SELECT '${database}'", "cat", "db")
      === "USE cat.db; SELECT 'cat'")
  }

  test("reference TPC-H corpus: 22 files discovered and run VERBATIM") {
    val dir = queries.Corpus.corpusDir
    val discovered = Runner.discoverQueries(dir)
    assert(discovered.length === 22)
    assert(discovered.map(_._1) === (1 to 22).map(i => f"q$i%02d"))
    // Raw file text (trailing semicolons and all) through the noop
    // sink, exactly as IcebergBenchmark.java:162-183 executes it.
    queries.Corpus.register(spark, sf)
    val rows = Runner.runSuite(spark, "TPC-H", dir,
      queries.Corpus.catalog, queries.Corpus.db, "run_corpus")
    assert(rows.length === 22)
    val failed = rows.filter(!_.getBoolean(5)).map(r =>
      r.getString(3) + ": " + r.getString(6))
    assert(failed.isEmpty, s"corpus failures: ${failed.mkString("; ")}")
  }

  test("suite runs all queries, failures recorded and truncated, CSV written") {
    val dir = writeQueries()
    Tables.registerAll(spark, sf)
    val listener = new MetricListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val rows = Runner.runSuite(spark, "TEST", dir, "", "", "run_test", Some(listener))
      assert(rows.length === 3)
      val byName = rows.map(r => r.getString(3) -> r).toMap
      assert(byName("q01_agg").getBoolean(5))
      assert(byName("q02_count").getBoolean(5))
      assert(!byName("q03_bad").getBoolean(5))
      assert(byName("q03_bad").getString(6).nonEmpty)
      assert(byName("q03_bad").getString(6).length <= 2000)
      assert(byName("q01_agg").getString(7).contains("executor_run_time_ms"))

      val out = Files.createTempDirectory("graft-results").toString
      Runner.writeResultsCsv(spark, rows, out, "run_test")
      val files = new java.io.File(s"$out/run_test").listFiles()
        .filter(_.getName.endsWith(".csv"))
      assert(files.length === 1) // repartition(1) → one part file
      val content = Files.readString(files.head.toPath)
      assert(content.startsWith("\"run_id\""))
      assert(content.contains("\"q03_bad\""))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
