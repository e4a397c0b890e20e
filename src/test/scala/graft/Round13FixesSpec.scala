package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.sources.SnapStore

/** Round-13 ADVICE regressions: streaming reads substitute Iceberg v3
  * initial defaults (not null) for pre-add files; UNSET TBLPROPERTIES
  * guards engine-managed keys like SET does; a republished WAP id
  * whose leftover chain has an EMPTY staged diff refuses instead of
  * silently dropping; flat-file adoption refuses hive-partitioned
  * source layouts loudly.
  */
class Round13FixesSpec extends SparkSpec {

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
  test("streaming read substitutes initial defaults: a fresh stream " +
    "over a table with ADD COLUMN ... DEFAULT serves the constant " +
    "for pre-add files, matching both batch paths") {
    val root = Files.createTempDirectory("graft-streamdef")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    val pre = docs.filter(col("doc_id") < 40)
    SnapStore.create(spark, t, pre, "part")                          // v1
    SnapStore.addColumnDefault(t,
      StructField("score", LongType, nullable = true), "7")          // v2
    val post = docs.filter(col("doc_id") >= 40 && col("doc_id") < 60)
      .withColumn("score", lit(99L))
    SnapStore.append(spark, t, post, "part")                         // v3

    val sink = s"streamdef_${System.nanoTime()}"
    spark.readStream.format("graft.sources.SnapStreamSource")
      .option("dir", t.toString).load()
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000L)

    val got = spark.table(sink)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(got.size == 60, s"stream must serve all files, got ${got.size}")
    // Pre-add rows: the v3 initial default, NEVER null (ADVICE r12 —
    // the batch paths substitute the constant; the stream must agree).
    (0L until 40L).foreach(id => assert(got(id) == 7L,
      s"pre-add doc $id must read the default 7, got ${got(id)}"))
    (40L until 60L).foreach(id => assert(got(id) == 99L,
      s"post-add doc $id must read its written value, got ${got(id)}"))

    // Batch agreement, both routes.
    mountAs("sdef", root)
    val batch = spark.sql("SELECT doc_id, score FROM graft.sdef.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == got.map { case (k, v) => k -> v.asInstanceOf[Long] },
      "stream and batch must serve identical defaulted values")
  }

  // ----------------------------------------------------------------
  test("UNSET TBLPROPERTIES guards engine-managed keys: key.column " +
    "and reserved keys refuse, user keys unset normally") {
    val root = Files.createTempDirectory("graft-unsetp")
    root.toFile.deleteOnExit()
    mountAs("unsetp", root)
    spark.sql("""CREATE TABLE graft.unsetp.t
      (doc_id BIGINT, part BIGINT, source STRING, text STRING)
      PARTITIONED BY (part)
      TBLPROPERTIES ('key.column' = 'doc_id', 'owner.team' = 'data')""")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.unsetp.t UNSET TBLPROPERTIES " +
        "('key.column')")
    }
    assert(e.getMessage.contains("engine-managed"), e.getMessage)
    // The stored key-column record survives in SHOW TBLPROPERTIES.
    val props = spark.sql("SHOW TBLPROPERTIES graft.unsetp.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("key.column").contains("doc_id"),
      s"key.column record must survive the refused UNSET: $props")
    // A user key still unsets.
    spark.sql("ALTER TABLE graft.unsetp.t UNSET TBLPROPERTIES " +
      "('owner.team')")
    val after = spark.sql("SHOW TBLPROPERTIES graft.unsetp.t")
      .collect().map(_.getString(0)).toSet
    assert(!after.contains("owner.team"))
  }

  // ----------------------------------------------------------------
  test("cherrypick after publish: an empty staged diff is NOT " +
    "provably stale — a post-publish re-staged chain refuses as a " +
    "duplicate WAP commit even when it added no data files") {
    val root = Files.createTempDirectory("graft-wapdup")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part")
    val id = "dup13"
    val b = SnapStore.wapStageBranch(id)

    // Stage + publish id normally.
    spark.conf.set("spark.wap.id", id)
    try {
      mountAs("wapdup", root)
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 40)
        .createOrReplaceTempView("wapdup_batch")
      spark.sql("INSERT INTO graft.wapdup.t " +
        "SELECT doc_id, part, source, text FROM wapdup_batch")
    } finally spark.conf.unset("spark.wap.id")
    SnapStore.cherrypickSnapshot(spark, t, id)
    assert(SnapStore.branchHead(t, b).isEmpty, "publish drops the branch")

    // Re-stage the SAME id via the direct branch API (bypassing the
    // SQL route's requireUnpublishedWapId), committing a chain head
    // with ZERO new files — the r12 `staged.forall(curPaths)` proof
    // was vacuously true here and silently dropped the chain.
    SnapStore.createBranch(t, b)
    SnapStore.appendToBranch(spark, t, b, docs.filter(col("doc_id") < 0),
      "part")
    val e = intercept[Exception] {
      SnapStore.cherrypickSnapshot(spark, t, id)
    }
    assert(e.getMessage.contains("duplicate WAP commit"),
      s"an empty post-publish chain must refuse, got: ${e.getMessage}")
    assert(SnapStore.branchHead(t, b).nonEmpty,
      "the refused chain must NOT be dropped")
    SnapStore.dropBranch(t, b)
  }

  // ----------------------------------------------------------------
  test(".position_deletes is a DISTRIBUTED scan: multi-delete-file " +
    "tables plan a BatchScan (one partition per delete file, pairs " +
    "decoded task-side, never a driver LocalTableScan), file column " +
    "carries resolved data-file paths") {
    val root = Files.createTempDirectory("graft-pdmeta")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs, "part")
    // Two separate position-delete commits → two pending delete files.
    SnapStore.deletePositions(spark, t, pmod(col("doc_id"), lit(7L)) === 0)
    SnapStore.deletePositions(spark, t, pmod(col("doc_id"), lit(11L)) === 3)
    val m = SnapStore.currentManifest(t)
    val pending = m.deleteFiles.filter(_.kind == "pos")
    assert(pending.size >= 2, s"fixture needs >=2 delete files: $pending")
    mountAs("pdmeta", root)

    val df = spark.table("graft.pdmeta.t.position_deletes")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") &&
      plan.contains("graft-position-deletes"),
      s"must plan the distributed batch, got:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"driver-side materialization crept back:\n$plan")
    // One input partition per pending delete file.
    val parts = df.rdd.getNumPartitions
    assert(parts == pending.size,
      s"expected ${pending.size} partitions (one per delete file), got $parts")

    val rows = df.collect()
    assert(rows.length == pending.map(_.rows).sum.toInt,
      "served pairs must equal the manifest's recorded pair counts")
    // DISTINCT pairs = the logically deleted row set (overlapping
    // commits may repeat a pair; reads apply them as a set).
    val expected = docs.filter(pmod(col("doc_id"), lit(7L)) === 0 ||
      pmod(col("doc_id"), lit(11L)) === 3).count()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet.size ==
      expected.toInt,
      s"distinct pair count must be $expected")
    // `file` carries RESOLVED data-file paths (the _file join key).
    val dataPaths = m.files.map(f => t.resolve(f.path).toString).toSet
    assert(rows.map(_.getString(0)).toSet.subsetOf(dataPaths),
      "file column must resolve to manifest data-file paths")
    // delete_file / seq attribute pairs to their owning commit.
    assert(rows.map(_.getString(2)).toSet ==
      pending.map(_.path).toSet)
  }

  // ----------------------------------------------------------------
  test("flat-file adoption refuses hive-partitioned sources loudly: " +
    "a dir with parquet inside subdirectories never half-adopts") {
    val root = Files.createTempDirectory("graft-flatonly")
    root.toFile.deleteOnExit()
    val src = root.resolve("src")
    // One flat parquet + one hive-style partition subdir.
    docs.filter(col("doc_id") < 10).coalesce(1)
      .write.parquet(src.resolve("flat").toString)
    val flat = Files.list(src.resolve("flat")).iterator()
    var moved = false
    while (flat.hasNext) {
      val p = flat.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        Files.move(p, src.resolve(p.getFileName)); moved = true
      }
    }
    assert(moved, "fixture needs a top-level parquet")
    docs.filter(col("doc_id") >= 10 && col("doc_id") < 20).coalesce(1)
      .write.parquet(src.resolve("part=1").toString)

    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") >= 90), "part")
    val e = intercept[Exception] {
      SnapStore.addFiles(spark, t, src)
    }
    assert(e.getMessage.contains("flat-only"),
      s"partitioned source must refuse loudly: ${e.getMessage}")
    // Nothing was adopted.
    assert(SnapStore.currentManifest(t).operation != "add-files",
      "the refused adoption must not commit")
  }
}
