package graft

import java.nio.file.{Files, LinkOption}

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** `register_table` (Iceberg's catalog-registration procedure): an
  * EXISTING snapshot-table root adopts under a catalog name with zero
  * copies — manifests, history, branches included. Double-ownership
  * refuses; DROP on a registered name unregisters only.
  */
class RegisterTableSpec extends SparkSpec {

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
  test("register_table adopts an external root zero-copy: reads, " +
    "history, and DML flow through; DROP unregisters only; " +
    "double-ownership and re-registration refuse") {
    val ext = Files.createTempDirectory("graft-regsrc")
    ext.toFile.deleteOnExit()
    val src = ext.resolve("src")
    SnapStore.create(spark, src, docs.filter(col("doc_id") < 50), "part") // v1
    SnapStore.append(spark, src,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 70), "part")     // v2

    val wh = Files.createTempDirectory("graft-regwh")
    wh.toFile.deleteOnExit()
    mountAs("regwh", wh)
    val res = spark.sql("CALL graft.system.register_table(" +
      s"'regwh.alias', '$src')").collect()(0)
    assert(res.getString(0) == "regwh.alias" && res.getInt(1) == 2)

    // Reads resolve the FULL adopted history (manifests, not files).
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.regwh.alias")
      .collect()(0).getLong(0) == 70L)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.regwh.alias " +
      "VERSION AS OF '1'").collect()(0).getLong(0) == 50L)
    // Zero copies: the name is a link, the data lives at the source.
    assert(Files.isSymbolicLink(wh.resolve("alias")))

    // Metadata tables resolve through the registered name too.
    assert(spark.table("graft.regwh.alias.snapshots").count() == 2L)
    assert(spark.table("graft.regwh.alias.files").count() ==
      SnapStore.currentManifest(src).files.size.toLong)

    // DML through the registered name commits to the source root.
    docs.filter(col("doc_id") >= 70 && col("doc_id") < 75)
      .createOrReplaceTempView("reg_batch")
    spark.sql("INSERT INTO graft.regwh.alias " +
      "SELECT doc_id, part, source, text FROM reg_batch")
    assert(SnapStore.currentVersion(src).contains(3),
      "the append must land on the source root")
    assert(SnapStore.read(spark, src).count() == 75L)

    // Re-registering the same root (under another name) refuses:
    // the alias already owns it inside a mounted warehouse.
    val e1 = intercept[Exception] {
      spark.sql(s"CALL graft.system.register_table('regwh.alias2', '$src')")
    }
    assert(e1.getMessage.contains("already owned"), e1.getMessage)
    // A root that is a DIRECT table of a mounted warehouse refuses
    // too (double ownership).
    val owned = wh.resolve("ownedt")
    SnapStore.create(spark, owned, docs.filter(col("doc_id") < 10), "part")
    val e2 = intercept[Exception] {
      spark.sql(s"CALL graft.system.register_table('regwh.o2', '$owned')")
    }
    assert(e2.getMessage.contains("already owned"), e2.getMessage)
    // A non-table source refuses.
    val e3 = intercept[Exception] {
      spark.sql(s"CALL graft.system.register_table('regwh.x', '$ext')")
    }
    assert(e3.getMessage.contains("not a snapshot table root"),
      e3.getMessage)

    // DROP unregisters the NAME; the source root survives whole.
    spark.sql("DROP TABLE graft.regwh.alias")
    assert(!Files.exists(wh.resolve("alias"), LinkOption.NOFOLLOW_LINKS))
    assert(SnapStore.isSnapTable(src) &&
      SnapStore.currentVersion(src).contains(3),
      "dropping a registered name must not touch the source")
    // And it can re-register afterwards.
    spark.sql(s"CALL graft.system.register_table('regwh.alias', '$src')")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.regwh.alias")
      .collect()(0).getLong(0) == 75L)
    spark.sql("DROP TABLE graft.regwh.alias")
  }
}
