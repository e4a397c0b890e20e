package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** Merge-on-read SQL DML (Iceberg's `write.delete.mode` /
  * `write.update.mode` / `write.merge.mode = merge-on-read`): SQL
  * DELETE/UPDATE/MERGE route through the delta-based row-level
  * operation — position-delete files plus new data files, ZERO base
  * data rewritten (untouched paths and mtimes prove it), composing
  * with the fold/compact maintenance lifecycle.
  */
class MorDmlSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"))

  private def mountAs(db: String, root: Path): Unit = {
    spark.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  }

  private def morTable(db: String, root: Path,
      modes: Seq[String] = Seq("delete", "update", "merge")): Path = {
    mountAs(db, root)
    val props = modes.map(m => s"'write.$m.mode' = 'merge-on-read'")
      .mkString(", ")
    spark.sql(s"""CREATE TABLE graft.$db.t
      (doc_id BIGINT, part BIGINT, source STRING, text STRING)
      PARTITIONED BY (part)
      TBLPROPERTIES ($props)""")
    docs.createOrReplaceTempView(s"${db}_seed")
    spark.sql(s"INSERT INTO graft.$db.t " +
      s"SELECT doc_id, part, source, text FROM ${db}_seed")
    root.resolve("t")
  }

  private def dataState(t: Path): Map[String, java.nio.file.attribute.FileTime] =
    SnapStore.currentManifest(t).files
      .map(f => f.path -> Files.getLastModifiedTime(t.resolve(f.path)))
      .toMap

  // ----------------------------------------------------------------
  test("MOR SQL DELETE: commits a position-delete file, zero data " +
    "rewrite (paths and mtimes untouched), reads net the deletes on " +
    "both scan paths") {
    val root = Files.createTempDirectory("graft-mordel")
    root.toFile.deleteOnExit()
    val t = morTable("mordel", root)
    val before = dataState(t)
    val v0 = SnapStore.currentVersion(t).get

    spark.sql("DELETE FROM graft.mordel.t WHERE doc_id % 5 = 0 AND part = 2")

    val m = SnapStore.currentManifest(t)
    assert(m.version == v0 + 1 && m.operation == "delete-mor")
    assert(dataState(t) == before,
      "a MOR delete must not touch any data file")
    val pos = m.deleteFiles.filter(_.kind == "pos")
    assert(pos.nonEmpty, "the delete must commit position-delete files")
    val expectedGone = docs.filter(col("doc_id") % 5 === 0 &&
      col("part") === 2).count()
    assert(pos.map(_.rows).sum == expectedGone,
      s"pair count ${pos.map(_.rows).sum} != matched rows $expectedGone")
    // refs recorded → reads route by manifest metadata.
    assert(pos.forall(_.refs.nonEmpty))

    val left = spark.sql("SELECT COUNT(*) AS n FROM graft.mordel.t")
      .collect()(0).getLong(0)
    assert(left == docs.count() - expectedGone)
    // No survivor matches the predicate.
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.mordel.t " +
      "WHERE doc_id % 5 = 0 AND part = 2").collect()(0).getLong(0) == 0L)
    // The programmatic read path agrees.
    assert(SnapStore.read(spark, t).count() == left)
  }

  // ----------------------------------------------------------------
  test("MOR SQL MERGE: one snapshot carrying position deletes for " +
    "matched rows AND new data files for updates+inserts; base files " +
    "untouched; a second MERGE composes; fold repays the debt") {
    val root = Files.createTempDirectory("graft-mormerge")
    root.toFile.deleteOnExit()
    val t = morTable("mormerge", root)
    val before = dataState(t)
    val baseCount = docs.count()

    // Source: update every doc_id % 7 == 0 (flag its source), insert
    // fresh ids above 100000.
    docs.filter(col("doc_id") % 7 === 0)
      .withColumn("source", lit("merged"))
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("source", lit("inserted")))
      .createOrReplaceTempView("mormerge_changes")

    spark.sql("""MERGE INTO graft.mormerge.t AS tgt
      USING mormerge_changes AS src ON tgt.doc_id = src.doc_id
      WHEN MATCHED THEN UPDATE SET source = src.source
      WHEN NOT MATCHED THEN INSERT (doc_id, part, source, text)
        VALUES (src.doc_id, src.part, src.source, src.text)""")

    val m = SnapStore.currentManifest(t)
    assert(m.operation == "merge-mor")
    // Base files all untouched; NEW files appended for the rewritten
    // rows + inserts.
    before.foreach { case (p, mtime) =>
      assert(m.files.exists(_.path == p),
        s"base file $p must survive a MOR merge")
      assert(Files.getLastModifiedTime(t.resolve(p)) == mtime,
        s"base file $p must not be rewritten")
    }
    assert(m.files.size > before.size, "updates/inserts land as NEW files")
    val pos = m.deleteFiles.filter(_.kind == "pos")
    val matched = docs.filter(col("doc_id") % 7 === 0).count()
    assert(pos.map(_.rows).sum == matched,
      "matched rows suppress via position deletes")

    val merged = spark.sql("SELECT COUNT(*) AS n FROM graft.mormerge.t " +
      "WHERE source = 'merged'").collect()(0).getLong(0)
    assert(merged == matched)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.mormerge.t")
      .collect()(0).getLong(0) == baseCount + 10)

    // Updated rows keep their other columns.
    val sample = spark.sql("SELECT text FROM graft.mormerge.t " +
      "WHERE doc_id = 7").collect()(0).getString(0)
    val orig = docs.filter(col("doc_id") === 7).select("text")
      .collect()(0).getString(0)
    assert(sample == orig, "non-SET columns must carry through the update")

    // applyDeletes folds the MOR debt; contents identical after.
    val afterFold = SnapStore.applyDeletes(spark, t, "part")
    assert(afterFold.deleteFiles.isEmpty)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.mormerge.t " +
      "WHERE source = 'merged'").collect()(0).getLong(0) == matched)
  }

  // ----------------------------------------------------------------
  test("MOR SQL UPDATE: split delete+insert — one snapshot, position " +
    "deletes + replacement rows as new files, base untouched") {
    val root = Files.createTempDirectory("graft-morupd")
    root.toFile.deleteOnExit()
    val t = morTable("morupd", root)
    val before = dataState(t)

    spark.sql("UPDATE graft.morupd.t SET source = 'upd' " +
      "WHERE doc_id % 9 = 1")

    val m = SnapStore.currentManifest(t)
    assert(m.operation == "update-mor")
    before.foreach { case (p, mtime) =>
      assert(m.files.exists(_.path == p) &&
        Files.getLastModifiedTime(t.resolve(p)) == mtime,
        s"base file $p must survive a MOR update untouched")
    }
    val touched = docs.filter(col("doc_id") % 9 === 1).count()
    assert(m.deleteFiles.filter(_.kind == "pos").map(_.rows).sum == touched)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.morupd.t " +
      "WHERE source = 'upd'").collect()(0).getLong(0) == touched)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.morupd.t")
      .collect()(0).getLong(0) == docs.count())
    // Partition column carried → partition counts unchanged.
    val parts = spark.sql("SELECT part, COUNT(*) AS n FROM graft.morupd.t " +
      "GROUP BY part ORDER BY part").collect().map(r => r.getLong(1)).toSeq
    val expect = docs.groupBy("part").count().orderBy("part")
      .collect().map(_.getLong(1)).toSeq
    assert(parts == expect)
  }

  // ----------------------------------------------------------------
  test("MOR SQL DELETE composes with v3 deletion vectors: under the " +
    "DV conf the commit folds the staged pairs into one blob per " +
    "affected file (supersede held), reads net them exactly") {
    val root = Files.createTempDirectory("graft-mordv")
    root.toFile.deleteOnExit()
    val t = morTable("mordv", root)
    val before = dataState(t)
    spark.conf.set("spark.graft.delete.vectors", "true")
    try {
      spark.sql("DELETE FROM graft.mordv.t WHERE doc_id % 6 = 1")
      val m = SnapStore.currentManifest(t)
      val dvs = m.deleteFiles.filter(d => d.path.endsWith(".dv"))
      assert(dvs.nonEmpty, "the DV conf must route the delta commit " +
        s"to blob encoding, got ${m.deleteFiles}")
      assert(m.deleteFiles.filter(_.kind == "pos").forall(d =>
        d.path.endsWith(".dv")), "no parquet pair files under the conf")
      assert(dvs.map(_.refs.head).distinct.size == dvs.size,
        "one DV per data file (v3 invariant)")
      assert(dataState(t) == before, "zero data rewrite")

      // A second DV-mode DELETE supersedes per affected file: still
      // one blob per file, both delete sets applied.
      spark.sql("DELETE FROM graft.mordv.t WHERE doc_id % 6 = 3")
      val m2 = SnapStore.currentManifest(t)
      val dvs2 = m2.deleteFiles.filter(d => d.path.endsWith(".dv"))
      assert(dvs2.map(_.refs.head).distinct.size == dvs2.size,
        "supersede must hold across delta commits")
      val gone = docs.filter(col("doc_id") % 6 === 1 ||
        col("doc_id") % 6 === 3).count()
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.mordv.t")
        .collect()(0).getLong(0) == docs.count() - gone)
      assert(SnapStore.read(spark, t).count() == docs.count() - gone)
    } finally spark.conf.unset("spark.graft.delete.vectors")
  }

  // ----------------------------------------------------------------
  test("the delta scan pushes the DML condition: a MOR DELETE's plan " +
    "carries PushedFilters (unlike the group-based COW scan, which " +
    "must read replaced groups whole)") {
    val root = Files.createTempDirectory("graft-morpush")
    root.toFile.deleteOnExit()
    morTable("morpush", root)
    val plan = spark.sql("EXPLAIN FORMATTED DELETE FROM graft.morpush.t " +
      "WHERE doc_id = 37").collect()(0).getString(0)
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PushedFilters.*doc_id.*"),
      s"the delta scan must report the pushed condition:\n$plan")
  }

  // ----------------------------------------------------------------
  test("racing MOR SQL DELETEs all commit through the delta retry: " +
    "disjoint predicates, distinct snapshots, pair union exact, no " +
    "orphan delete files") {
    val root = Files.createTempDirectory("graft-morrace")
    root.toFile.deleteOnExit()
    val t = morTable("morrace", root)
    val v0 = SnapStore.currentVersion(t).get
    val writers = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (0 until writers).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            spark.sql("DELETE FROM graft.morrace.t " +
              s"WHERE doc_id % 16 = $i")
            SnapStore.currentVersion(t).get
          }
        })
      }
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      val m = SnapStore.currentManifest(t)
      assert(m.version == v0 + writers,
        s"every racer must win its own snapshot, head ${m.version}")
      // Pairs union exactly: each predicate's rows suppressed once.
      val gone = docs.filter(pmod(col("doc_id"), lit(16L)) < writers)
        .count()
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.morrace.t")
        .collect()(0).getLong(0) == docs.count() - gone)
      assert(m.deleteFiles.filter(_.kind == "pos").map(_.rows).sum == gone,
        "no racer's pairs may be lost or duplicated")
      // Lost attempts left no unreferenced delete parquets behind.
      val referenced = m.files.map(_.path).toSet ++
        m.deleteFiles.map(_.path).toSet
      val stream = java.nio.file.Files.list(t.resolve("data"))
      val onDisk =
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala
            .map(p => s"data/${p.getFileName}").toSet
        } finally stream.close()
      assert(onDisk == referenced,
        s"orphans after the race: ${onDisk -- referenced}")
    } finally pool.shutdown()
  }

  // ----------------------------------------------------------------
  test("MOR DML guard rails: no-match DML is a full no-op (staged " +
    "included — no branch fork), id-keyed WAP refuses, unknown modes " +
    "refuse, COW tables are unaffected by the dispatch") {
    val root = Files.createTempDirectory("graft-morguard")
    root.toFile.deleteOnExit()
    val t = morTable("morguard", root)
    val v0 = SnapStore.currentVersion(t).get

    // No-match DELETE: no snapshot.
    spark.sql("DELETE FROM graft.morguard.t WHERE doc_id < 0")
    assert(SnapStore.currentVersion(t).contains(v0),
      "a no-match MOR delete must not commit")

    // A no-match STAGED delete is a full no-op too: no snapshot on
    // main AND no branch fork (branch materializes at first
    // effective write). The effective staged path is WapMorSpec's.
    spark.conf.set("spark.graft.wap.branch", "morstage")
    try {
      spark.sql("DELETE FROM graft.morguard.t WHERE doc_id < 0")
      assert(SnapStore.currentVersion(t).contains(v0))
      assert(SnapStore.branchHead(t, "morstage").isEmpty,
        "a no-match staged delete must not fork the branch")
    } finally spark.conf.unset("spark.graft.wap.branch")

    // Id-keyed WAP (spark.wap.id) covers INSERT faces only — MOR DML
    // refuses at operation build, before any side effect.
    spark.conf.set("spark.graft.wap.id", "morwapid1")
    try {
      val e = intercept[Exception] {
        spark.sql("DELETE FROM graft.morguard.t WHERE doc_id = 1")
      }
      assert(e.getMessage.contains("INSERT INTO/OVERWRITE only"),
        e.getMessage)
      assert(SnapStore.currentVersion(t).contains(v0))
    } finally spark.conf.unset("spark.graft.wap.id")

    // Unknown mode value refuses loudly.
    spark.sql("ALTER TABLE graft.morguard.t SET TBLPROPERTIES " +
      "('write.delete.mode' = 'lazy')")
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM graft.morguard.t WHERE doc_id = 1")
    }
    assert(e2.getMessage.contains("unknown write.delete.mode"),
      e2.getMessage)
    spark.sql("ALTER TABLE graft.morguard.t SET TBLPROPERTIES " +
      "('write.delete.mode' = 'copy-on-write')")

    // Explicit copy-on-write now routes the COW path (rewrites).
    spark.sql("DELETE FROM graft.morguard.t WHERE doc_id % 13 = 2")
    val m = SnapStore.currentManifest(t)
    assert(m.deleteFiles.isEmpty || m.operation != "delete-mor",
      "explicit COW mode must not write delete files")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.morguard.t " +
      "WHERE doc_id % 13 = 2").collect()(0).getLong(0) == 0L)
  }
}
