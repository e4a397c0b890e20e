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
    "files keeps the carried ids exactly; pre-lineage rows pick up " +
    "fresh inherited ids (v3's null rule) that then stay stable") {
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
    val preMaxId = pre.values.flatMap(_._1).foldLeft(-1L)(math.max)
    val m2 = SnapStore.compact(spark, t, "part", Long.MaxValue / 4)
    assert(m2.files.forall(_.lineage),
      "the partial-lineage rewrite output must be marked materialized")
    val post = lineage()
    kept.foreach { case (d, ids) =>
      assert(post(d) == ids,
        s"doc $d moved ids across the rewrite: ${ids} -> ${post(d)}")
    }
    // Pre-lineage rows wrote NULL lineage into the rewrite output;
    // the output file's assigned first_row_id then serves them
    // INHERITED ids (v3's null rule) — fresh, above every carried
    // id, distinct, and stable from now on.
    val inherited = strippedDocs.map(post(_))
    assert(inherited.forall(p => p._1.exists(_ > preMaxId)),
      s"pre-lineage rows must inherit fresh ids above $preMaxId: " +
        s"${inherited.take(5)}")
    assert(inherited.flatMap(_._1).toSet.size == strippedDocs.size,
      "inherited ids must be distinct")
    // A SECOND rewrite materializes the inherited ids — stable now.
    val m3 = SnapStore.compact(spark, t, "part", Long.MaxValue / 4)
    assert(m3.version > m2.version)
    val post2 = lineage()
    strippedDocs.foreach(d => assert(post2(d)._1 == post(d)._1,
      s"doc $d lost its inherited id across the second rewrite"))
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

  // ----------------------------------------------------------------
  private def pdScanBuilder(t: Path) =
    new PositionDeletesMetadataTable("t.position_deletes", t)
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())

  private def pdPartitions(t: Path,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val sb = pdScanBuilder(t)
    sb.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsPushDownFilters].pushFilters(filters)
    sb.build().toBatch.planInputPartitions()
  }

  test(".position_deletes pushes delete_file/file predicates into " +
    "partition planning: one partition per matching delete file, " +
    "file= prunes via manifest refs, results stay exact") {
    val root = Files.createTempDirectory("graft-pdpush")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 80), "part",
      numFiles = 8, keyCol = "doc_id")
    SnapStore.deletePositions(spark, t, col("doc_id") === 3L)
    SnapStore.deletePositions(spark, t, col("doc_id") === 17L)
    val m = SnapStore.currentManifest(t)
    val dels = m.deleteFiles.filter(_.kind == "pos")
    assert(dels.size == 2 && dels.forall(_.refs.nonEmpty))

    assert(pdPartitions(t, Array.empty).length == 2)
    // delete_file = … plans exactly that file's partition.
    val d1 = dels.head
    val byDel = pdPartitions(t, Array(
      org.apache.spark.sql.sources.EqualTo("delete_file", d1.path)))
    assert(byDel.length == 1 &&
      byDel(0).asInstanceOf[PositionDeletesPartition].relPath == d1.path)
    // file = <resolved path> plans only the delete files whose refs
    // name it (the two single-row deletes hit different data files).
    val ref1 = t.resolve(s"data/${d1.refs.head}").toString
    val byFile = pdPartitions(t, Array(
      org.apache.spark.sql.sources.EqualTo("file", ref1)))
    assert(byFile.length ==
      dels.count(_.refs.contains(d1.refs.head)),
      s"file= must prune to referencing delete files, got ${byFile.length}")

    // SQL-level: the filtered read is exact (residual filter held).
    mountAs("pdpush", root)
    val rows = spark.sql("SELECT pos FROM graft.pdpush.t.position_deletes " +
      s"WHERE delete_file = '${d1.path}'").collect()
    assert(rows.length == 1,
      s"one suppressed pair per single-row delete, got ${rows.length}")
  }

  test("refs-less (legacy) .position_deletes partitions carry no " +
    "inline name map — resolution rides one broadcast — and still " +
    "serve resolved paths") {
    val root = Files.createTempDirectory("graft-pdlegacy")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 120), "part",
      numFiles = 60, keyCol = "doc_id",
      clusterExprs = Seq(col("part"), col("doc_id")))
    assert(SnapStore.currentManifest(t).files.size >= 40,
      "fixture needs a many-file table")
    SnapStore.deletePositions(spark, t, col("doc_id") === 7L)
    // Strip the refs field from the stored dfile line — the
    // pre-refs manifest shape.
    val v = SnapStore.currentVersion(t).get
    val mPath = SnapStore.manifestFileOf(t, v)
    val edited = Files.readAllLines(mPath).asScala.map { l =>
      if (!l.startsWith("dfile=")) l
      else l.split("\t", -1).take(6).mkString("\t")
    }
    Files.write(mPath, edited.mkString("\n").getBytes)
    val d = SnapStore.currentManifest(t).deleteFiles.head
    assert(d.refs.isEmpty, "fixture: the delete entry must be refs-less")

    val parts = pdPartitions(t, Array.empty)
    assert(parts.length == 1)
    val part = parts(0).asInstanceOf[PositionDeletesPartition]
    assert(part.nameToPath.isEmpty,
      "a refs-less partition must not inline the name map")
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(part); oos.close()
      bos.size()
    }
    assert(bytes < 4096,
      s"partition payload must stay bounded on a many-file table: $bytes B")
    // The broadcast still resolves the served path.
    mountAs("pdlegacy", root)
    val served = spark.sql(
      "SELECT file FROM graft.pdlegacy.t.position_deletes").collect()
    assert(served.length == 1 && served(0).getString(0).startsWith(
      t.resolve("data").toString),
      s"legacy entries must serve RESOLVED paths: ${served.toSeq}")
  }

  // ----------------------------------------------------------------
  test("multi-column equality deletes: a composite-key MOR delete " +
    "suppresses exactly the matching tuples on both read paths, " +
    "sequence scoping spares later appends, key-list mismatches " +
    "refuse, and applyDeletes folds the debt") {
    val root = Files.createTempDirectory("graft-eqmulti")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    val base = docs.filter(col("doc_id") < 60)
    SnapStore.create(spark, t, base, "part")
    val n = base.count()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val keySchema = StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("part", LongType, nullable = true)))
    // Two REAL (source, part) tuples from the data, plus one
    // null-component tuple (must match nothing).
    val victims = base.select("source", "part").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.take(2).toSeq
    val keys = spark.createDataFrame(
      spark.sparkContext.parallelize(
        victims.map { case (s, p) => Row(s, p) } :+ Row(null, 2L)),
      keySchema)
    SnapStore.deleteEquality(spark, t, keys, Seq("source", "part"))
    val m1 = SnapStore.currentManifest(t)
    assert(m1.deleteFiles.nonEmpty &&
      m1.deleteFiles.forall(d => SnapStore.eqKeyColsOf(d) ==
        Seq("source", "part")),
      s"manifest must store the key LIST: ${m1.deleteFiles.map(_.keyCol)}")

    val victimCond = victims.map { case (s, p) =>
      col("source") === s && col("part") === p }.reduce(_ || _)
    val expectGone = base.filter(victimCond).count()
    assert(expectGone > 0, "fixture must actually hit rows")
    def survivors(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      (df.count(), df.filter(victimCond).count())
    // Native path (catalog/programmatic read) and the DataFrame
    // (readManifest) path must agree.
    assert(survivors(SnapStore.read(spark, t)) == ((n - expectGone, 0L)))
    assert(survivors(SnapStore.readManifest(spark, t, m1)) ==
      ((n - expectGone, 0L)))

    // Sequence scoping: re-appending a suppressed tuple survives (the
    // append outranks the delete by sequence).
    SnapStore.append(spark, t,
      base.filter(victimCond)
        .withColumn("doc_id", col("doc_id") + 900000L), "part")
    val reAdded = SnapStore.read(spark, t).filter(victimCond).count()
    assert(reAdded == expectGone,
      "appended tuples must outrank the older delete")

    // A different key list over pending debt refuses.
    val e = intercept[IllegalArgumentException] {
      SnapStore.deleteEquality(spark, t,
        base.select(col("doc_id")).limit(1), Seq("doc_id"))
    }
    assert(e.getMessage.contains("one key column list"), e.getMessage)

    // Fold: contents identical, debt gone.
    val beforeFold = SnapStore.read(spark, t)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    SnapStore.applyDeletes(spark, t, "part")
    val m2 = SnapStore.currentManifest(t)
    assert(m2.deleteFiles.isEmpty)
    assert(SnapStore.read(spark, t)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == beforeFold, "the fold must preserve exactly the net contents")
  }
}
