package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** Conf-driven write-audit-publish (Iceberg's `spark.wap.branch`
  * face, `spark.graft.wap.branch` here, bare `spark.wap.branch`
  * honored): with the conf set, UNMODIFIED catalog writes stage on
  * the conf's branch and unmodified reads serve it; main provably
  * never moves until an explicit fast-forward publishes; DML that
  * cannot stage (UPDATE/MERGE/DELETE — their replace commit targets
  * main) refuses loudly instead of tearing the staged state.
  */
class WapConfSpec extends SparkSpec {

  private val ConfKey = "spark.graft.wap.branch"

  private def withWap(branch: String)(body: => Unit): Unit = {
    val old = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, branch)
    try body
    finally old match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  test("spark.graft.wap.branch stages INSERT INTO on the branch; " +
    "plain reads serve main; VERSION AS OF sees the staged rows; " +
    "fast-forward publishes exactly the staged batch") {
    val root = Files.createTempDirectory("graft-wapconf")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    val baseRows = spark.range(0, 64).select(col("id"),
      pmod(col("id"), lit(4L)).as("part"),
      concat(lit("d"), col("id")).as("txt"))
    SnapStore.create(spark, t, baseRows, "part")

    spark.conf.set("spark.graft.catalog.dir.wapc", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")

    withWap("audit") {
      // The branch materializes at first write; main must not move.
      spark.sql("INSERT INTO graft.wapc.t " +
        "SELECT id + 1000, part, concat(txt, '-staged') " +
        "FROM graft.wapc.t WHERE id % 8 = 0")
      assert(SnapStore.currentVersion(t).contains(1),
        "staged INSERT must not commit to main")
      assert(SnapStore.branchHead(t, "audit").contains(2),
        "the conf's branch must hold the staged commit")
      // Conf-routed unmodified read = the staged state (the audit's
      // read surface).
      val n = spark.sql(
        "SELECT COUNT(*) AS n FROM graft.wapc.t WHERE id >= 1000")
        .collect()(0).getLong(0)
      assert(n == 8L, s"conf-routed read must see the staged batch, got $n")
      // DML whose commit targets main refuses loudly under the conf.
      val eUp = intercept[Exception](spark.sql(
        "UPDATE graft.wapc.t SET txt = 'x' WHERE id = 0"))
      assert(eUp.getMessage.contains("wap"), eUp.getMessage)
      val eDel = intercept[Exception](spark.sql(
        "DELETE FROM graft.wapc.t WHERE id = 0"))
      assert(eDel.getMessage.contains("wap"), eDel.getMessage)
      val eOvw = intercept[Exception](spark.sql(
        "INSERT OVERWRITE graft.wapc.t SELECT * FROM graft.wapc.t"))
      assert(eOvw.getMessage.contains("wap"), eOvw.getMessage)
    }

    // Conf unset: plain reads serve main — no staged rows — while
    // explicit branch time travel sees them.
    val plain = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.wapc.t WHERE id >= 1000")
      .collect()(0).getLong(0)
    assert(plain == 0L, s"staged rows leaked into a plain read: $plain")
    val tt = spark.sql("SELECT COUNT(*) AS n FROM graft.wapc.t " +
      "VERSION AS OF 'audit' WHERE id >= 1000").collect()(0).getLong(0)
    assert(tt == 8L, s"VERSION AS OF 'audit' must see the staged rows: $tt")

    // Publish: audit passed → fast-forward lands exactly the batch.
    SnapStore.fastForward(t, "audit")
    val after = spark.sql("SELECT COUNT(*) AS n FROM graft.wapc.t")
      .collect()(0).getLong(0)
    assert(after == 72L, s"publish must land base + staged batch: $after")

    // The bare Iceberg key routes too (unmodified WAP workloads).
    val old = spark.conf.getOption("spark.wap.branch")
    spark.conf.set("spark.wap.branch", "audit2")
    try {
      spark.sql("INSERT INTO graft.wapc.t VALUES (9999, 3, 'bare')")
      assert(SnapStore.currentVersion(t).contains(2),
        "bare-key staged INSERT must not commit to main")
      assert(SnapStore.branchHead(t, "audit2").contains(2),
        "bare spark.wap.branch must stage on its branch")
    } finally old match {
      case Some(v) => spark.conf.set("spark.wap.branch", v)
      case None => spark.conf.unset("spark.wap.branch")
    }
  }
}
