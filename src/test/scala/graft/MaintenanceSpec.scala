package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.sources.SnapStore

/** Physical contracts of the SnapStore maintenance faces — the
  * claims the DuckDB oracles cannot see: which files a MERGE
  * rewrites, what compaction does to the layout, what expiry
  * deletes, and how evolved columns read from historical files.
  */
class MaintenanceSpec extends SparkSpec {

  private def freshTable(name: String): Path = {
    val dir = Files.createTempDirectory(s"graft-snapspec-$name")
    dir.toFile.deleteOnExit()
    dir.resolve("t")
  }

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"), pmod(col("doc_id"), lit(8L)).as("part"),
    col("source"), col("text"))

  test("merge rewrites only files intersecting changed partitions; " +
    "untouched files carry byte-identical") {
    val t = freshTable("merge")
    SnapStore.create(spark, t, docs, "part")
    val v1 = SnapStore.currentManifest(t)
    // Byte-level fingerprint of every v1 data file before the merge.
    val sizesBefore = v1.files.map(f =>
      f.path -> Files.getLastModifiedTime(t.resolve(f.path))).toMap

    val changes = docs.filter(col("part") === 2)
      .withColumn("text", concat(col("text"), lit(" upd")))
    SnapStore.merge(spark, t, changes, "doc_id", "part")
    val v2 = SnapStore.currentManifest(t)

    val (touched1, untouched1) = v1.files.partition(f =>
      f.partMin <= 2 && 2 <= f.partMax)
    assert(touched1.nonEmpty, "fixture must populate partition 2")
    assert(untouched1.nonEmpty, "fixture must populate other partitions")
    // Every untouched v1 file is in v2 UNDER THE SAME PATH, mtime
    // unchanged (carried, not rewritten); no touched v1 file is.
    untouched1.foreach { f =>
      assert(v2.files.exists(_.path == f.path), s"${f.path} must carry")
      assert(Files.getLastModifiedTime(t.resolve(f.path)) == sizesBefore(f.path),
        s"${f.path} must not be rewritten")
    }
    touched1.foreach { f =>
      assert(!v2.files.exists(_.path == f.path),
        s"${f.path} intersects the changed partition and must be replaced")
    }
    // Contents: part-2 rows all updated, everything else identical.
    val after = SnapStore.read(spark, t)
    assert(after.count() == docs.count())
    assert(after.filter(col("part") === 2 && !col("text").endsWith(" upd"))
      .count() == 0)
    assert(after.filter(col("part") =!= 2 && col("text").endsWith(" upd"))
      .count() == 0)
  }

  test("merge inserts unmatched change rows") {
    val t = freshTable("merge-ins")
    SnapStore.create(spark, t, docs, "part")
    val ins = docs.filter(col("part") === 3).limit(5)
      .withColumn("doc_id", col("doc_id") + 900000L)
    SnapStore.merge(spark, t, ins, "doc_id", "part")
    assert(SnapStore.read(spark, t).count() == docs.count() + 5)
  }

  test("compaction collapses a fragmented layout; contents identical") {
    val t = freshTable("compact")
    SnapStore.create(spark, t, docs, "part", numFiles = 32,
      clusterExprs = Seq(col("part"), pmod(col("doc_id"), lit(4L))))
    val before = SnapStore.currentManifest(t)
    val total = before.files.map(_.bytes).sum
    SnapStore.compact(spark, t, "part", targetBytes = total / 3 + 1)
    val after = SnapStore.currentManifest(t)
    assert(before.files.size > after.files.size,
      s"expected fewer files, got ${before.files.size} -> ${after.files.size}")
    // Layout-only: same rows, same per-row contents.
    val a = SnapStore.read(spark, t, Some(before.version))
      .orderBy("doc_id").collect()
    val b = SnapStore.read(spark, t).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("expiry drops old snapshots, deletes only orphaned files, " +
    "and expired VERSION AS OF raises") {
    val t = freshTable("expire")
    SnapStore.create(spark, t, docs, "part")
    val v1 = SnapStore.currentManifest(t)
    SnapStore.merge(spark, t,
      docs.filter(col("part") === 1)
        .withColumn("text", concat(col("text"), lit(" u"))),
      "doc_id", "part")
    val v2 = SnapStore.currentManifest(t)
    val liveRowsBefore = SnapStore.read(spark, t).count()

    val (expired, deleted) = SnapStore.expire(t, keepLast = 1)
    assert(expired == Seq(1))
    // Orphans = exactly the v1 files v2 no longer references.
    val expectedOrphans = v1.files.map(_.path)
      .filterNot(p => v2.files.exists(_.path == p)).sorted
    assert(deleted.sorted == expectedOrphans)
    deleted.foreach(p => assert(!Files.exists(t.resolve(p))))
    v2.files.foreach(f => assert(Files.exists(t.resolve(f.path))))
    // Live read unaffected; expired read raises the Iceberg-shaped
    // missing-snapshot error.
    assert(SnapStore.read(spark, t).count() == liveRowsBefore)
    val e = intercept[IllegalArgumentException] {
      SnapStore.read(spark, t, Some(1))
    }
    assert(e.getMessage.contains("Cannot find snapshot"))
  }

  test("add-column evolution: metadata-only commit, old files read " +
    "nulls, appended files carry values, filter pushdown intact") {
    val t = freshTable("evo")
    SnapStore.create(spark, t, docs, "part")
    val v1Files = SnapStore.currentManifest(t).files.map(_.path).toSet
    SnapStore.addColumn(t, StructField("score", LongType))
    val v2 = SnapStore.currentManifest(t)
    assert(v2.files.map(_.path).toSet == v1Files, "no data rewrite")
    assert(v2.schema.fieldNames.contains("score"))

    val n = docs.count()
    // Old files: the evolved column reads as null.
    val evolved = SnapStore.read(spark, t)
    assert(evolved.filter(col("score").isNull).count() == n)

    SnapStore.append(spark, t,
      docs.limit(3).withColumn("doc_id", col("doc_id") + 800000L)
        .withColumn("score", lit(7L)),
      "part")
    val after = SnapStore.read(spark, t)
    assert(after.filter(col("score") === 7L).count() == 3)
    assert(after.filter(col("score").isNull).count() == n)
    // Pushdown survives the user-specified evolved schema.
    val plan = after.filter(col("doc_id") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,1)]"),
      s"expected doc_id pushdown in:\n$plan")
  }

  test("catalog route: snapshot table resolves, time travel works, " +
    "ALTER TABLE ADD COLUMN commits through the catalog, files " +
    "metadata lists the live manifest") {
    val dir = Files.createTempDirectory("graft-snapspec-cat")
    dir.toFile.deleteOnExit()
    val t = dir.resolve("docs")
    SnapStore.create(spark, t, docs, "part")
    SnapStore.merge(spark, t,
      docs.filter(col("part") === 4)
        .withColumn("text", concat(col("text"), lit(" c"))),
      "doc_id", "part")
    spark.conf.set("spark.graft.catalog.dir.maintspec", dir.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")

    val n = docs.count()
    assert(spark.table("graft.maintspec.docs").count() == n)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.maintspec.docs VERSION AS OF 1")
      .head().getLong(0) == n)
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft.maintspec.docs VERSION AS OF 9").collect()
    }
    assert(err.getMessage.contains("not found") ||
      err.getMessage.contains("Cannot find snapshot"))

    spark.sql("ALTER TABLE graft.maintspec.docs ADD COLUMN score BIGINT")
    val evolved = spark.table("graft.maintspec.docs")
    assert(evolved.schema.fieldNames.contains("score"))
    assert(evolved.filter(col("score").isNull).count() == n)

    val live = SnapStore.currentManifest(t).files
    val listed = spark.table("graft.maintspec.docs.files")
      .orderBy("file_path").collect()
    assert(listed.length == live.size)
    assert(listed.map(_.getString(0)).toSet ==
      live.map(f => t.resolve(f.path).toString).toSet)
    assert(listed.map(_.getLong(1)).sum == live.map(_.bytes).sum)
  }

  test("registered lifecycle is idempotent: re-running entries " +
    "re-reads the same final snapshots") {
    val a = ops.Maintenance.mergeUpsert(spark, sf).collect()
    val b = ops.Maintenance.mergeUpsert(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    val c = ops.Maintenance.schemaEvolution(spark, sf).collect()
    val d = ops.Maintenance.schemaEvolution(spark, sf).collect()
    assert(c.toSeq == d.toSeq)
  }
}
