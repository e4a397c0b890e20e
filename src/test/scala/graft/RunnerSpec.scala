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

  test("named CLI options parse like the reference's picocli surface") {
    val opts = Runner.parseArgs(Array(
      "--tpch-dir", "/q/tpch", "--tpcds-dir", "/q/tpcds",
      "--tpch-data-db", "tpch_sf1", "--tpcds-data-db", "tpcds_sf1",
      "--catalog-name", "cat", "--output-path", "/out", "--run-id", "r1"))
    assert(opts("tpch-dir") === "/q/tpch")
    assert(opts("tpcds-data-db") === "tpcds_sf1")
    assert(opts("catalog-name") === "cat")
    assert(opts("run-id") === "r1")
  }

  test("conf-derived flags: analytics-core + client type per catalog") {
    assert(Runner.confFlags(spark, "nosuchcat") === (false, "HTTP"))
    spark.conf.set("spark.sql.catalog.fcat.gcs.analytics-core.enabled", "true")
    spark.conf.set("spark.sql.catalog.fcat.gcs.client.type", "GRPC_CLIENT")
    assert(Runner.confFlags(spark, "fcat") === (true, "GRPC"))
    val dir = Files.createTempDirectory("graft-flagq")
    Files.writeString(dir.resolve("q1.sql"), "SELECT 1 AS one")
    val rows = Runner.runSuite(spark, "TEST", dir.toString, "", "", "run_f",
      flags = Runner.confFlags(spark, "fcat"))
    assert(rows.head.getBoolean(8) === true)   // analytics_core_enabled
    assert(rows.head.getString(9) === "GRPC")  // client_type
  }

  test("two-suite run resolves unqualified names via distinct namespaces") {
    // Same query file, two databases: the per-suite USE
    // (IcebergBenchmark.java:153) must steer the unqualified name.
    spark.sql("CREATE DATABASE IF NOT EXISTS ns_a")
    spark.sql("CREATE DATABASE IF NOT EXISTS ns_b")
    spark.sql("CREATE OR REPLACE VIEW ns_a.probe AS SELECT 'a' AS side")
    spark.sql("CREATE OR REPLACE VIEW ns_b.probe AS SELECT 'b' AS side")
    val dir = Files.createTempDirectory("graft-nsq")
    Files.writeString(dir.resolve("q1.sql"), "SELECT side FROM probe")
    def run(db: String) = Runner.runSuite(spark, "TEST", dir.toString,
      "spark_catalog", db, "run_ns")
    // `probe` exists only inside the namespaces, so suite success
    // itself proves the USE resolved the unqualified name; the
    // current database must track each suite's USE.
    assert(run("ns_a").forall(_.getBoolean(5)))
    assert(spark.catalog.currentDatabase === "ns_a")
    assert(run("ns_b").forall(_.getBoolean(5)))
    assert(spark.catalog.currentDatabase === "ns_b")
    spark.sql("USE default")
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

  test("reference TPC-DS corpus: 103 files discovered and run VERBATIM") {
    val dir = queries.TpcdsCorpus.corpusDir
    val discovered = Runner.discoverQueries(dir)
    assert(discovered.length === 103)
    queries.TpcdsCorpus.register(spark, sf)
    val rows = Runner.runSuite(spark, "TPC-DS", dir,
      queries.TpcdsCorpus.catalog, queries.TpcdsCorpus.db, "run_ds")
    assert(rows.length === 103)
    val failed = rows.filter(!_.getBoolean(5)).map(r =>
      r.getString(3) + ": " + r.getString(6).take(120))
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
