package graft

import org.apache.spark.sql.functions._

/** The DSv2 write path (two-phase task/job commit) and the custom
  * TableCatalog's 3-part-name resolution — the connector surfaces
  * beyond reading.
  */
class SinkCatalogSpec extends SparkSpec {

  test("checksum sink runs the commit protocol and proves the written rows") {
    val df = spark.range(0, 10000).select(col("id"))
    df.write.format("graft.sources.ChecksumSink")
      .option("runId", "spec-run").mode("append").save()
    val r = graft.sources.ChecksumSink.resultFor("spec-run")
    assert(r.isDefined, "job commit did not publish a result")
    assert(r.get.rows === 10000)
    val want = (0L until 10000L)
      .map(graft.sources.ChecksumSink.contribution)
      .foldLeft(0L)((a, c) => (a + c) % 1000000007L)
    assert(r.get.checksum === want)
    assert(r.get.tasks > 0)
  }

  test("custom catalog resolves USE + 3-part names + SHOW TABLES") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    try {
      // 3-part name straight through the catalog path.
      val n = spark.sql("SELECT count(*) AS n FROM graft_cat.synth.rows_1000")
        .collect().head.getLong(0)
      assert(n === 1000)
      // USE + bare table name, like the reference's per-suite USE.
      spark.sql("USE graft_cat.synth")
      try {
        val bySql = spark.sql(
          "SELECT sum(value) AS s FROM rows_1000 WHERE id < 100")
          .collect().head.getLong(0)
        val want = (0L until 100L).map(graft.sources.SyntheticSource.valueOf).sum
        assert(bySql === want)
        val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
        assert(tables.contains("rows_1000") && tables.contains("rows_100000"))
      } finally spark.sql("USE spark_catalog.default")
      // Pushdown still reaches the scan through the catalog path.
      val q = spark.table("graft_cat.synth.rows_100000").filter(col("id") < 500)
      assert(q.count() === 500)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-synth [0, 500)"), plan)
    } finally spark.conf.unset("spark.sql.catalog.graft_cat")
  }

  test("catalog negative paths: unknown table/namespace, mounted listing") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    try {
      // Unknown table inside a valid namespace.
      val e1 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.table("graft_cat.synth.no_such").collect()
      }
      assert(e1.getMessage.contains("no_such"))
      // Unknown namespace.
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.table("graft_cat.nonsense.rows_10").collect()
      }
      assert(e2.getMessage.toLowerCase.contains("nonsense"))
      // A mounted warehouse namespace appears in SHOW NAMESPACES and
      // its tables list; unmounting (conf removal) hides it again.
      queries.Corpus.register(spark, sf)
      val ns = spark.sql("SHOW NAMESPACES IN graft_cat").collect()
        .map(_.getString(0)).toSet
      assert(ns.contains("synth") && ns.contains("tpch"), ns.mkString(","))
      val tabs = spark.sql("SHOW TABLES IN graft_cat.tpch").collect()
        .map(_.getString(1)).toSet
      assert(tabs.contains("lineitem") && tabs.contains("partsupp"),
        tabs.mkString(","))
      val saved = spark.conf.get("spark.graft.catalog.dir.tpch")
      spark.conf.unset("spark.graft.catalog.dir.tpch")
      try {
        val gone = spark.sql("SHOW NAMESPACES IN graft_cat").collect()
          .map(_.getString(0)).toSet
        assert(!gone.contains("tpch"))
      } finally spark.conf.set("spark.graft.catalog.dir.tpch", saved)
    } finally spark.conf.unset("spark.sql.catalog.graft_cat")
  }

  test("files metadata table lists a mounted table's data files") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    try {
      queries.Corpus.register(spark, sf)
      val rows = spark.sql(
        "SELECT file_path, size_bytes FROM graft_cat.tpch.lineitem.files")
        .collect()
      assert(rows.nonEmpty)
      val root = spark.conf.get("spark.graft.catalog.dir.tpch")
      rows.foreach { r =>
        assert(r.getString(0).startsWith(root), r.getString(0))
        assert(r.getString(0).endsWith(".parquet"))
        assert(r.getLong(1) > 0)
      }
      // Composes with SQL on top, like any table.
      val total = spark.sql(
        "SELECT sum(size_bytes) AS s FROM graft_cat.tpch.lineitem.files")
        .collect().head.getLong(0)
      assert(total === rows.map(_.getLong(1)).sum)
      // Unknown base table → missing metadata table.
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM graft_cat.tpch.no_such.files").collect()
      }
    } finally spark.conf.unset("spark.sql.catalog.graft_cat")
  }
}
