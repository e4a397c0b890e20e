package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Regression pins for the round-14 ADVICE items:
  *
  *  1. (high) MOR UPDATE/MERGE commits abort when a concurrent commit
  *     added delete files applying to their read set — Iceberg
  *     RowDelta's `validateNoConflictingDeleteFiles`; racing DELETEs
  *     still union idempotently.
  *  2. (medium) the delta commit adopts ONLY the staged parquets the
  *     task commit messages list — leftovers from crashed/zombie
  *     attempts are dropped, never adopted.
  *  3. (medium) partial-lineage rewrites materialize per-file: rows
  *     from lineage-carrying sources keep their ids, rows from
  *     pre-lineage sources serve NULL — never fabricated fresh ids.
  *  4. (low) createView installs exclusively (racing creates: one
  *     winner, one ViewAlreadyExists — never a silent overwrite).
  *  5. (low) changelogWithUpdates pairs DELETE/INSERT one-to-one;
  *     unbalanced sets keep the residual rows' original labels.
  */
class Round14FixesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"))

  private def mountAs(db: String, root: Path): Unit = {
    spark.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  }

  private def morTable(db: String, root: Path): Path = {
    mountAs(db, root)
    spark.sql(s"""CREATE TABLE graft.$db.t
      (doc_id BIGINT, part BIGINT, source STRING, text STRING)
      PARTITIONED BY (part)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    docs.createOrReplaceTempView(s"${db}_seed")
    spark.sql(s"INSERT INTO graft.$db.t " +
      s"SELECT doc_id, part, source, text FROM ${db}_seed")
    root.resolve("t")
  }

  /** Write one position-delete pair parquet with an exact file name
    * into `tmp` — the shape a SnapDeltaWriter task leaves behind.
    */
  private def stagePairs(tmp: Path, name: String,
      pairs: Seq[(String, Long)]): Unit = {
    val scratch = Files.createTempDirectory("graft-pairs")
    val s = spark
    import s.implicits._
    pairs.toDF("file", "pos").coalesce(1)
      .write.mode("overwrite").parquet(scratch.toString)
    val part = {
      val s = Files.list(scratch)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(tmp)
    Files.move(part, tmp.resolve(name))
  }

  /** (file name, ordinal, doc_id) of one row per file via the
    * catalog's metadata columns.
    */
  private def rowAt(db: String, pos: Long): (String, Long) = {
    val r = spark.sql(
      s"SELECT _file, doc_id FROM graft.$db.t WHERE _pos = $pos LIMIT 1")
      .collect()(0)
    val f = r.getString(0)
    (f.substring(f.lastIndexOf('/') + 1), r.getLong(1))
  }

  // ----------------------------------------------------------------
  test("a MOR update/merge delta aborts when a concurrent commit " +
    "added delete files applying to its read set; a delete delta " +
    "with the same stale read snapshot unions idempotently") {
    val root = Files.createTempDirectory("graft-morconf")
    root.toFile.deleteOnExit()
    val t = morTable("morconf", root)
    val n = docs.count()
    val m0 = SnapStore.currentManifest(t)

    // The "concurrent" commit: a MOR SQL DELETE of the row at
    // ordinal 0 of its file — lands a delete file m0 never saw.
    val (f0, victim) = rowAt("morconf", 0L)
    spark.sql(s"DELETE FROM graft.morconf.t WHERE doc_id = $victim")
    val m1 = SnapStore.currentManifest(t)
    assert(m1.deleteFiles.nonEmpty && m1.deleteFiles.forall(_.refs.contains(f0)))

    // An update-mor delta staged against the PRE-delete snapshot,
    // whose pairs reference the same file: write-write conflict.
    val delTmp1 = root.resolve(".conf-del-1")
    stagePairs(delTmp1, "del-x.parquet", Seq((f0, 0L)))
    val ex = intercept[IllegalArgumentException] {
      SnapStore.commitDeltaFromStaging(spark, t, root.resolve(".conf-data-1"),
        delTmp1, "update-mor", m0, Set.empty, Set("del-x.parquet"))
    }
    assert(ex.getMessage.contains("apply to rows this update-mor read"),
      s"wrong abort reason: ${ex.getMessage}")
    assert(SnapStore.currentManifest(t).version == m1.version,
      "the aborted update must not commit")
    // The abort left no orphan parquets under data/.
    val referenced = m1.files.map(_.path).toSet ++
      m1.deleteFiles.map(_.path).toSet
    val onDisk = {
      val s = Files.list(t.resolve("data"))
      try s.iterator().asScala.map(p => s"data/${p.getFileName}").toSet
      finally s.close()
    }
    assert(onDisk == referenced, s"orphans: ${onDisk -- referenced}")

    // The SAME stale-snapshot pairs as a DELETE commit fine — pair
    // application is idempotent, the overlapping row suppresses once.
    val delTmp2 = root.resolve(".conf-del-2")
    stagePairs(delTmp2, "del-y.parquet", Seq((f0, 0L)))
    SnapStore.commitDeltaFromStaging(spark, t, root.resolve(".conf-data-2"),
      delTmp2, "delete-mor", m0, Set.empty, Set("del-y.parquet"))
    assert(spark.sql("SELECT COUNT(*) FROM graft.morconf.t")
      .collect()(0).getLong(0) == n - 1,
      "racing deletes of one row must union, not double-suppress")
  }

  // ----------------------------------------------------------------
  test("the delta commit adopts only the parquets listed in the task " +
    "commit messages; zombie-attempt leftovers are dropped, not " +
    "committed") {
    val root = Files.createTempDirectory("graft-morzombie")
    root.toFile.deleteOnExit()
    val t = morTable("morzombie", root)
    val n = docs.count()
    val m0 = SnapStore.currentManifest(t)
    val (f0, _) = rowAt("morzombie", 0L)

    val dataTmp = root.resolve(".z-data")
    val delTmp = root.resolve(".z-del")
    stagePairs(delTmp, "del-keep.parquet", Seq((f0, 0L)))
    // Leftovers of a crashed attempt whose abort never ran: a second
    // pair parquet and a data parquet, NOT in any commit message.
    stagePairs(delTmp, "del-zombie.parquet", Seq((f0, 1L)))
    Files.createDirectories(dataTmp)
    docs.limit(3).coalesce(1)
      .write.mode("overwrite").parquet(root.resolve(".z-scratch").toString)
    val stray = {
      val s = Files.list(root.resolve(".z-scratch"))
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.move(stray, dataTmp.resolve("ins-zombie.parquet"))

    val m1 = SnapStore.commitDeltaFromStaging(spark, t, dataTmp, delTmp,
      "delete-mor", m0, Set.empty, Set("del-keep.parquet"))
    assert(m1.files.map(_.path) == m0.files.map(_.path),
      "the zombie data parquet must not be adopted")
    assert(m1.deleteFiles.map(_.rows).sum == 1L,
      "only the listed pair file's single pair may commit")
    assert(spark.sql("SELECT COUNT(*) FROM graft.morzombie.t")
      .collect()(0).getLong(0) == n - 1)
  }

  // ----------------------------------------------------------------
  test("a compaction mixing lineage-carrying and pre-lineage source " +
    "files keeps the carried ids and serves NULL for the pre-lineage " +
    "rows — never fabricates fresh ids") {
    val root = Files.createTempDirectory("graft-mixlin")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 60), "part")
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 60 && col("doc_id") < 80), "part")
    mountAs("mixlin", root)

    // Strip lineage from ONE file in the stored manifest — the
    // pre-upgrade shape (manifests written before the lineage fields
    // existed parse as firstRowId=-1/lineage=false).
    val byFile = spark.sql("SELECT _file, doc_id FROM graft.mixlin.t")
      .collect()
      .groupBy(r => r.getString(0).substring(
        r.getString(0).lastIndexOf('/') + 1))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val stripped = byFile.keys.min
    val strippedDocs = byFile(stripped)
    assert(strippedDocs.nonEmpty && strippedDocs.size < 80)
    val v = SnapStore.currentVersion(t).get
    val mPath = SnapStore.manifestFileOf(t, v)
    val edited = Files.readAllLines(mPath).asScala.map { l =>
      if (!l.startsWith(s"file=data/$stripped")) l
      else {
        val parts = l.split("\t", -1)
        (parts.dropRight(2) ++ Array("-1", "0")).mkString("\t")
      }
    }
    Files.write(mPath, edited.mkString("\n").getBytes)

    def lineage(): Map[Long, (Option[Long], Option[Long])] = {
      val cv = SnapStore.currentVersion(t).get
      spark.read.format("graft.sources.SnapReadSource")
        .option("dir", t.toString).option("version", cv).load()
        .select(col("doc_id"), col("_row_id"),
          col("_last_updated_sequence_number"))
        .collect()
        .map(r => r.getLong(0) -> ((
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    }
    val pre = lineage()
    val kept = pre.filter { case (d, _) => !strippedDocs(d) }
    assert(kept.nonEmpty && kept.values.forall(_._1.nonEmpty),
      "unstripped rows must carry ids before the rewrite")

    // All files into one bin: a genuine multi-file rewrite.
    val m2 = SnapStore.compact(spark, t, "part", Long.MaxValue / 4)
    assert(m2.files.forall(_.lineage),
      "the partial-lineage rewrite output must be marked materialized")
    val post = lineage()
    kept.foreach { case (d, ids) =>
      assert(post(d) == ids,
        s"doc $d moved ids across the rewrite: ${ids} -> ${post(d)}")
    }
    strippedDocs.foreach { d =>
      assert(post(d) == ((None, None)),
        s"pre-lineage doc $d must stay NULL, got ${post(d)}")
    }
  }

  // ----------------------------------------------------------------
  test("racing createView calls: exactly one wins, the rest raise " +
    "ViewAlreadyExists, and the winner's definition resolves") {
    val root = Files.createTempDirectory("graft-viewrace")
    root.toFile.deleteOnExit()
    mountAs("viewrace", root)
    spark.sql("CREATE TABLE graft.viewrace.t (id BIGINT) ")
    spark.sql("INSERT INTO graft.viewrace.t VALUES (1), (2), (3)")
    val racers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(racers)
    try {
      val results = (0 until racers).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] =
            try {
              spark.sql("CALL graft.system.create_view('viewrace.v', " +
                s"'SELECT id, $i AS creator FROM graft.viewrace.t')")
              None
            } catch { case e: Throwable => Some(e.toString) }
        })
      }.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      val failures = results.flatten
      assert(failures.size == racers - 1,
        s"exactly one create may win, failures: $failures")
      assert(failures.forall(m =>
        m.toLowerCase.contains("already exists") ||
          m.contains("VIEW_ALREADY_EXISTS")),
        s"losers must see already-exists, got: $failures")
      // The winner's file is whole — the view plans and serves rows.
      assert(spark.sql("SELECT COUNT(*) FROM graft.viewrace.v")
        .collect()(0).getLong(0) == 3L)
    } finally pool.shutdown()
  }

  // ----------------------------------------------------------------
  test("changelogWithUpdates pairs one-to-one: one delete plus two " +
    "inserts of an identifier yields UPDATE_BEFORE/UPDATE_AFTER plus " +
    "a residual INSERT") {
    val root = Files.createTempDirectory("graft-clupair")
    root.toFile.deleteOnExit()
    mountAs("clupair", root)
    spark.sql("""CREATE TABLE graft.clupair.t
      (id BIGINT, part BIGINT, val STRING) PARTITIONED BY (part)""")
    spark.sql("INSERT INTO graft.clupair.t " +
      "SELECT id, id % 2, 'a' FROM range(1, 11)")
    val t = root.resolve("t")
    val vFrom = SnapStore.currentVersion(t).get
    // One commit replacing id=7's single row with TWO rows.
    spark.sql("""INSERT OVERWRITE graft.clupair.t
      SELECT id, id % 2, 'a' FROM range(1, 11) WHERE id != 7
      UNION ALL SELECT 7, 1, 'b'
      UNION ALL SELECT 7, 1, 'c'""")
    val vTo = SnapStore.currentVersion(t).get
    val changes = SnapStore.changelogWithUpdates(spark, t, vFrom, vTo,
      Seq("id"))
      .filter(col("id") === 7)
      .select(col("_change_type"), col("val"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    assert(changes.count(_._1 == "UPDATE_BEFORE") == 1 &&
      changes.collect { case ("UPDATE_BEFORE", v) => v } == Seq("a"),
      s"exactly one pre-image: $changes")
    assert(changes.count(_._1 == "UPDATE_AFTER") == 1,
      s"exactly one post-image (never two AFTERs for one BEFORE): $changes")
    assert(changes.count(_._1 == "INSERT") == 1,
      s"the unpaired insert keeps its label: $changes")
    assert(changes.collect {
      case (k, v) if k != "UPDATE_BEFORE" => v }.toSet == Set("b", "c"))
  }
}
