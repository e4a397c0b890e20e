package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** Graft views (Iceberg's view face): definitions persist beside the
  * warehouse through the DSv2 `ViewCatalog` implementation, SELECT
  * resolves them via the injected analyzer rule (stock Spark 4.1 has
  * the interface but wires neither DDL nor resolution — the same gap
  * Iceberg fills with extensions), and the CALL verbs drive
  * create/list/drop from SQL.
  */
class ViewCatalogSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"))

  private def mountAs(db: String, root: java.nio.file.Path): Unit = {
    spark.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  }

  // ----------------------------------------------------------------
  test("create_view persists, SELECT re-plans over the current " +
    "snapshot, view-on-view nests, list/drop work, and a fresh " +
    "catalog instance reloads the stored definition") {
    val root = Files.createTempDirectory("graft-views")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 50), "part")
    mountAs("vws", root)

    spark.sql("""CALL graft.system.create_view('vws.v_by_part',
      'SELECT part, COUNT(*) AS n FROM graft.vws.t GROUP BY part')""")
    assert(Files.isRegularFile(
      root.resolve("_views").resolve("v_by_part.view")),
      "the view definition must persist beside the warehouse")

    val n1 = spark.sql("SELECT SUM(n) AS s FROM graft.vws.v_by_part")
      .collect()(0).getLong(0)
    assert(n1 == 50L)

    // Views are definitions, not snapshots: an append shows through.
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 70), "part")
    val n2 = spark.sql("SELECT SUM(n) AS s FROM graft.vws.v_by_part")
      .collect()(0).getLong(0)
    assert(n2 == 70L, "the view must read the CURRENT snapshot")

    // list_views lists it; duplicate creation refuses; an
    // unresolvable definition refuses at creation (never persists).
    val listed = spark.sql("CALL graft.system.list_views('vws')")
      .collect().map(_.getString(0)).toSet
    assert(listed.exists(_.endsWith("v_by_part")), s"got $listed")
    intercept[Exception] {
      spark.sql("CALL graft.system.create_view('vws.v_by_part', " +
        "'SELECT 1 AS one')")
    }
    intercept[Exception] {
      spark.sql("CALL graft.system.create_view('vws.broken', " +
        "'SELECT nope FROM graft.vws.missing')")
    }
    assert(!Files.exists(root.resolve("_views").resolve("broken.view")),
      "a failed creation must not persist")

    // View-on-view: the inner view resolves on the next pass.
    spark.sql("""CALL graft.system.create_view('vws.v_top',
      'SELECT part FROM graft.vws.v_by_part WHERE n > 10')""")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft.vws.v_top")
      .collect()(0).getLong(0) >= 1L)

    // The stored definition survives a FRESH catalog instance
    // (definition durability, not session state).
    val fresh = new graft.sources.GraftCatalog()
    fresh.initialize("graft",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vws"), "v_by_part")
    val v = fresh.loadView(ident)
    assert(v.query().toLowerCase.contains("group by"))
    assert(v.currentCatalog() == "graft")
    assert(v.schema().fieldNames.toSeq == Seq("part", "n"))

    // rename_view moves the definition; old name stops resolving.
    spark.sql("CALL graft.system.rename_view('vws.v_top', 'v_top2')")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft.vws.v_top2")
      .collect()(0).getLong(0) >= 1L)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.vws.v_top").collect()
    }
    spark.sql("CALL graft.system.rename_view('vws.v_top2', 'v_top')")

    // drop_view removes the definition; the base table is untouched.
    spark.sql("CALL graft.system.drop_view('vws.v_top')")
    spark.sql("CALL graft.system.drop_view('vws.v_by_part')")
    assert(!Files.exists(root.resolve("_views").resolve("v_by_part.view")))
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.vws.t")
      .collect()(0).getLong(0) == 70L)
    // A dropped view no longer resolves.
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.vws.v_by_part").collect()
    }
  }

  // ----------------------------------------------------------------
  test("a corpus-shaped aggregation runs through a created view " +
    "with pushdown reaching the base scan") {
    val root = Files.createTempDirectory("graft-views2")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs, "part")
    mountAs("vws2", root)
    spark.sql("""CALL graft.system.create_view('vws2.docs_view',
      'SELECT doc_id, part, source, text FROM graft.vws2.t')""")
    val out = spark.sql(
      """SELECT source, COUNT(*) AS n
        |FROM graft.vws2.docs_view
        |WHERE part = 2
        |GROUP BY source ORDER BY source""".stripMargin)
    val expect = docs.filter(col("part") === 2)
      .groupBy("source").count().orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == expect)
    // The filter pushes through the view into the base parquet scan.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("part"),
      s"pushdown must reach the base scan:\n$plan")
    spark.sql("CALL graft.system.drop_view('vws2.docs_view')")
  }

  // ----------------------------------------------------------------
  test("a definition cycle closed by rename_view raises a NAMED view-" +
    "cycle error instead of exhausting the analyzer's iteration cap") {
    val root = Files.createTempDirectory("graft-viewcycle")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part")
    mountAs("vcy", root)
    // Creation-time planning keeps direct cycles impossible; renames
    // move names out from under stored definitions without
    // re-planning them, so two renames can close a loop:
    //   c1 -> t;  c2 -> c1;  c3 -> c2
    //   rename c1 -> cx      (c2's stored def still says c1)
    //   rename c3 -> c1      (now c1 -> c2 -> c1)
    spark.sql("CALL graft.system.create_view('vcy.c1', " +
      "'SELECT doc_id, part FROM graft.vcy.t')")
    spark.sql("CALL graft.system.create_view('vcy.c2', " +
      "'SELECT doc_id, part FROM graft.vcy.c1')")
    spark.sql("CALL graft.system.create_view('vcy.c3', " +
      "'SELECT doc_id, part FROM graft.vcy.c2')")
    spark.sql("CALL graft.system.rename_view('vcy.c1', 'cx')")
    spark.sql("CALL graft.system.rename_view('vcy.c3', 'c1')")
    val e = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM graft.vcy.c2").collect()
    }
    def rootMessages(ex: Throwable): Seq[String] =
      Option(ex).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    val msgs = rootMessages(e).mkString(" | ")
    assert(msgs.contains("view cycle detected") && msgs.contains("vcy.c2"),
      s"expected a named cycle error, got: $msgs")
    // The untouched chain keeps serving.
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.vcy.cx")
      .collect()(0).getLong(0) == 30L)
    Seq("c1", "c2", "cx").foreach(v =>
      spark.sql(s"CALL graft.system.drop_view('vcy.$v')"))
  }
}
