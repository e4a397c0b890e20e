package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** A snapshot-manifest table format over parquet — the WRITE /
  * MAINTENANCE faces of the reference's storage layer, re-expressed
  * with the same mechanism Iceberg uses (immutable data files + a
  * versioned manifest listing which files each snapshot contains)
  * but none of its code. The reference mounts Iceberg precisely for
  * these semantics ("Iceberg table read/write APIs … table
  * maintenance", BASELINE.json; `partitionOverwriteMode=dynamic` at
  * `IcebergBenchmark.java:97` exists for the copy-on-write pattern),
  * and no Iceberg jars exist in this container — so the format is
  * built from first principles:
  *
  *  - **Data files are immutable.** Every commit writes NEW parquet
  *    files into `data/` and publishes a NEW manifest under
  *    `_snapshots/v%05d.manifest`; nothing is edited in place, so
  *    readers of older snapshots are never disturbed (time travel =
  *    read an older manifest's file list).
  *  - **Manifests carry per-file partition bounds** (`min`/`max` of
  *    the table's partition column), collected by one stats pass
  *    over the just-written files — the metrics Iceberg gathers at
  *    write time. [[merge]] prunes the files it must rewrite from
  *    these bounds on the driver, at planning time, without opening
  *    a single data file.
  *  - **Commits are atomic and exclusive**: a manifest is written to
  *    a temp name and hard-link-installed at its version path —
  *    atomic (a snapshot exists completely or not at all) AND
  *    exclusive (link creation fails if the version exists, so
  *    exactly one of any number of racing writers wins it; a POSIX
  *    rename would silently replace the winner). Losing writers
  *    retry optimistically against the new current snapshot
  *    ([[withCommitRetry]]), Iceberg's commit model.
  *
  * At 100 TB each operation stays one-or-two Spark jobs over only
  * the affected bytes: merge reads+rewrites touched files only,
  * compaction reads+rewrites small files only, expiry is pure
  * driver-side metadata plus unreferenced-file deletes.
  *
  * Manifest format (line-based, dependency-free):
  * {{{
  * version=3
  * parent=2
  * operation=merge
  * schema=<StructType.json on one line>
  * partcol=<current partition column>
  * file=data/merge-v3-0-<uuid>.parquet\t<partMin>\t<partMax>\t<rows>\t<bytes>\t<specCol>
  * }}}
  */
object SnapStore {

  /** One data file as a manifest records it: path relative to the
    * table root plus the write-time stats pruning needs. `specCol`
    * is the partition column the file's `[partMin, partMax]` bounds
    * DESCRIBE — files written before a partition-spec evolution keep
    * their old spec's bounds (Iceberg's per-file spec-id), and a
    * change-set prune may only trust bounds whose spec matches the
    * change set's column. `""` = legacy entry, treated as the
    * caller's current column.
    */
  final case class FileEntry(path: String, partMin: Long, partMax: Long,
      rows: Long, bytes: Long, specCol: String = "")

  /** `partCol` is the table's CURRENT partition spec at this
    * snapshot (`""` on legacy manifests = whatever the caller says).
    */
  /** An equality-delete file: a small parquet of deleted key values
    * (Iceberg v2 merge-on-read). Reads anti-join the union of a
    * snapshot's delete files on `keyCol`; [[applyDeletes]] folds them
    * back into the data files.
    */
  final case class DeleteFile(path: String, keyCol: String, rows: Long,
      bytes: Long)

  final case class Manifest(version: Int, parent: Int, operation: String,
      schema: StructType, files: Seq[FileEntry], partCol: String = "",
      deleteFiles: Seq[DeleteFile] = Seq.empty)

  private def snapDir(table: Path): Path = table.resolve("_snapshots")
  private def manifestPath(table: Path, v: Int): Path =
    snapDir(table).resolve(f"v$v%05d.manifest")

  /** Is `dir` a snapshot table root? */
  def isSnapTable(dir: Path): Boolean = Files.isDirectory(snapDir(dir))

  /** Live (non-expired) snapshot versions, ascending. */
  def liveVersions(table: Path): Seq[Int] = {
    if (!Files.isDirectory(snapDir(table))) return Seq.empty
    val stream = Files.list(snapDir(table))
    val vs =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d{5,}\\.manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toInt
        }
        .toSeq
      finally stream.close()
    vs.sorted
  }

  def currentVersion(table: Path): Option[Int] = liveVersions(table).lastOption

  /** Load one manifest; raises the Iceberg-shaped missing-snapshot
    * error when the version was expired (or never committed) — the
    * contract `VERSION AS OF` surfaces to SQL users.
    */
  def manifest(table: Path, version: Int): Manifest = {
    val p = manifestPath(table, version)
    if (!Files.exists(p))
      throw new IllegalArgumentException(
        s"Cannot find snapshot $version for table $table " +
          "(expired or never committed)")
    val lines = Files.readAllLines(p).asScala.toSeq
    def field(k: String): String = lines
      .find(_.startsWith(s"$k="))
      .getOrElse(throw new IllegalStateException(s"manifest $p missing $k"))
      .drop(k.length + 1)
    val files = lines.filter(_.startsWith("file=")).map { l =>
      val parts = l.drop(5).split('\t')
      FileEntry(parts(0), parts(1).toLong, parts(2).toLong,
        parts(3).toLong, parts(4).toLong,
        if (parts.length > 5) parts(5) else "")
    }
    val dfiles = lines.filter(_.startsWith("dfile=")).map { l =>
      val parts = l.drop(6).split('\t')
      DeleteFile(parts(0), parts(1), parts(2).toLong, parts(3).toLong)
    }
    Manifest(field("version").toInt, field("parent").toInt,
      field("operation"),
      DataType.fromJson(field("schema")).asInstanceOf[StructType], files,
      lines.find(_.startsWith("partcol="))
        .map(_.drop("partcol=".length)).getOrElse(""), dfiles)
  }

  def currentManifest(table: Path): Manifest =
    manifest(table, currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"No snapshots under $table")))

  /** Publish a new manifest atomically. Returns false when another
    * writer already published this version — the loser of an
    * optimistic-concurrency race (the ATOMIC_MOVE either fully
    * installs the manifest or observes the winner's).
    */
  private def tryCommitManifest(table: Path, m: Manifest): Boolean = {
    Files.createDirectories(snapDir(table))
    val body = new StringBuilder()
      .append(s"version=${m.version}\n")
      .append(s"parent=${m.parent}\n")
      .append(s"operation=${m.operation}\n")
      .append(s"schema=${m.schema.json}\n")
    if (m.partCol.nonEmpty) body.append(s"partcol=${m.partCol}\n")
    m.files.foreach(f => body.append(
      s"file=${f.path}\t${f.partMin}\t${f.partMax}\t${f.rows}\t${f.bytes}" +
        s"\t${f.specCol}\n"))
    m.deleteFiles.foreach(d => body.append(
      s"dfile=${d.path}\t${d.keyCol}\t${d.rows}\t${d.bytes}\n"))
    val tmp = snapDir(table).resolve(
      s".v${m.version}.tmp-${ProcessHandle.current().pid()}-" +
        Thread.currentThread().getId)
    Files.writeString(tmp, body.toString)
    // EXCLUSIVE install, not a rename: POSIX rename(2) — what
    // ATOMIC_MOVE compiles to — silently REPLACES an existing target,
    // so two racing writers would both believe they won the version
    // (observed: duplicate version ids under a 12-writer race).
    // Hard-link creation is atomic AND fails with
    // FileAlreadyExistsException when the target exists — exactly
    // one writer installs a given manifest version.
    try {
      Files.createLink(manifestPath(table, m.version), tmp)
      Files.deleteIfExists(tmp)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      false
    }
  }

  private def commitManifest(table: Path, m: Manifest): Unit =
    if (!tryCommitManifest(table, m))
      throw new java.util.ConcurrentModificationException(
        s"snapshot ${m.version} was committed concurrently for $table")

  /** Run `body` (read current state → write data files → commit)
    * with Iceberg-style optimistic-concurrency retries: `body` must
    * re-read the CURRENT manifest each attempt, return its freshly
    * written file entries with the manifest it tried to commit, and
    * the commit result. On losing the version race the attempt's
    * data files are deleted (they are referenced by nothing) and the
    * whole attempt recomputes against the new current snapshot —
    * correctness never depends on winning, only progress does.
    */
  private def withCommitRetry(table: Path, maxAttempts: Int = 50)(
      body: () => (Manifest, Seq[FileEntry], Boolean)): Manifest = {
    var attempt = 0
    while (true) {
      attempt += 1
      val (m, written, committed) = body()
      if (committed) return m
      written.foreach(f => Files.deleteIfExists(table.resolve(f.path)))
      if (attempt >= maxAttempts)
        throw new java.util.ConcurrentModificationException(
          s"gave up after $maxAttempts conflicting commits on $table")
      // Jittered backoff so a herd of losers doesn't re-collide in
      // lockstep (the losing attempt's recompute is the expensive
      // part; the sleep just de-synchronizes the next read-commit
      // window). ThreadLocalRandom: this is operational jitter, not
      // data — results are identical whatever it draws.
      Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(5L * attempt, 25L * attempt))
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write `df`'s rows as new immutable data files under `data/` and
    * return their manifest entries. One write job (hash-clustered on
    * the partition column so a file's partition bounds stay tight)
    * plus one stats job over the new files only — the write-time
    * metrics collection that makes manifest-level pruning possible.
    */
  private def writeDataFiles(spark: SparkSession, table: Path, df: DataFrame,
      partCol: String, label: String, numFiles: Int,
      clusterExprs: Seq[org.apache.spark.sql.Column] = Seq.empty): Seq[FileEntry] = {
    val dataDir = table.resolve("data")
    Files.createDirectories(dataDir)
    // Unique per invocation (pid + random), not just per process:
    // optimistic-concurrency retries run concurrent writers in one
    // JVM, and two attempts sharing a tmp dir would corrupt each
    // other's staging files.
    val tmp = table.resolve(s".write-tmp-${ProcessHandle.current().pid()}" +
      s"-${UUID.randomUUID().toString.take(8)}")
    deleteTree(tmp)
    // RANGE clustering on the partition column with an EXPLICIT file
    // count: ranges keep each file's [partMin, partMax] span tight
    // and non-overlapping (hash clustering would scatter partition
    // values across files and destroy manifest-level pruning), and
    // an explicit count is exempt from AQE partition coalescing —
    // at tiny fixtures AQE would otherwise fold everything into one
    // file and there'd be no layout to prune, compact, or carry.
    val cluster = if (clusterExprs.nonEmpty) clusterExprs else Seq(col(partCol))
    // Rows inside each file sort by the full cluster key, so file-level
    // min/max (manifest) AND row-group min/max (parquet footer) both
    // stay tight on the clustered columns — the double pruning a
    // sort-order rewrite exists to buy.
    df.repartitionByRange(numFiles, cluster: _*)
      .sortWithinPartitions(cluster: _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val stream = Files.list(tmp)
    val written =
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
      finally stream.close()
    val moved = written.zipWithIndex.map { case (src, i) =>
      val name = s"$label-$i-${UUID.randomUUID().toString.take(8)}.parquet"
      Files.move(src, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    deleteTree(tmp)
    if (moved.isEmpty) return Seq.empty
    // Stats pass over the new files only: per-file row count and
    // partition bounds keyed by the physical file each row came from.
    val paths = moved.map(n => dataDir.resolve(n).toString)
    val stats = spark.read.parquet(paths: _*)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(partCol)).as("mn"), max(col(partCol)).as("mx"),
        count(lit(1)).as("rows"))
      .collect()
      .map(r => fileName(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    moved.flatMap { n =>
      stats.get(n) match {
        case Some((mn, mx, rows)) =>
          Some(FileEntry(s"data/$n", mn, mx, rows,
            Files.size(dataDir.resolve(n)), specCol = partCol))
        case None => // zero-row part file: drop, never reference
          Files.deleteIfExists(dataDir.resolve(n)); None
      }
    }
  }

  private def fileName(uri: String): String =
    uri.substring(uri.lastIndexOf('/') + 1)

  /** Create the table: snapshot v1 from `df`. `clusterExprs`
    * overrides the write clustering (default: the partition column)
    * — passing a finer key deliberately fragments the layout, the
    * precondition [[compact]] exists to repair.
    */
  def create(spark: SparkSession, table: Path, df: DataFrame,
      partCol: String, numFiles: Int = 8,
      clusterExprs: Seq[org.apache.spark.sql.Column] = Seq.empty): Manifest = {
    require(currentVersion(table).isEmpty, s"table $table already exists")
    val files = writeDataFiles(spark, table, df, partCol, "base-v1", numFiles,
      clusterExprs)
    val m = Manifest(1, 0, "create", df.schema, files, partCol)
    commitManifest(table, m)
    m
  }

  /** Read a snapshot (latest when `version` is None) as one parquet
    * scan over exactly the manifest's files, with the MANIFEST's
    * schema — files written before a column was added simply lack it
    * and read as nulls (the Iceberg schema-evolution contract).
    * Filter/column pushdown flow through the plain parquet path.
    */
  def read(spark: SparkSession, table: Path,
      version: Option[Int] = None): DataFrame = {
    val m = version.map(manifest(table, _)).getOrElse(currentManifest(table))
    val base =
      if (m.files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      else
        spark.read.schema(m.schema)
          .parquet(m.files.map(f => table.resolve(f.path).toString): _*)
    // Merge-on-read: pending equality deletes anti-join at read time
    // (Iceberg v2 delete files). The delete set is tiny by definition
    // (it is what was cheap enough to not rewrite), so the anti-join
    // broadcasts.
    if (m.deleteFiles.isEmpty) base
    else {
      val kc = m.deleteFiles.head.keyCol
      val dk = spark.read
        .parquet(m.deleteFiles.map(d => table.resolve(d.path).toString): _*)
        .select(col(kc).as("__delk")).distinct()
      base.join(broadcast(dk), base(kc) === col("__delk"), "left_anti")
    }
  }

  /** Among `candidates` (files the partition-bound prune would carry
    * untouched), find those that actually HOLD one of the change
    * set's keys — the rows a partition-moving update leaves behind.
    * Pruning by the change rows' partition values is only sound when
    * keys never change partition; this key-only, column-pruned scan
    * (one small column of the unpruned files) restores row-level
    * correctness for the general case, exactly like Iceberg's COW
    * MERGE joining the source onto the target to find its matches.
    */
  private def filesHoldingKeys(spark: SparkSession, table: Path,
      schema: StructType, candidates: Seq[FileEntry], keys: DataFrame,
      keyCol: String): Set[String] =
    if (candidates.isEmpty) Set.empty
    else spark.read.schema(schema)
      .parquet(candidates.map(f => table.resolve(f.path).toString): _*)
      .select(col(keyCol), input_file_name().as("__f"))
      .join(keys.select(col(keyCol).as("__k")), col(keyCol) === col("__k"),
        "left_semi")
      .select(col("__f")).distinct()
      .collect().map(r => fileName(r.getString(0))).toSet

  /** Copy-on-write MERGE (matched → update, unmatched → insert): the
    * row-level-write face of the north star. File-level pruning from
    * manifest partition bounds decides the rewrite set ON THE DRIVER
    * — data files whose `[partMin, partMax]` misses every changed
    * partition are carried into the new snapshot UNTOUCHED (same
    * path, no IO). Only touched files are read, merged with the
    * change set, and rewritten. This is exactly the
    * `partitionOverwriteMode=dynamic` write pattern the reference
    * configures (`IcebergBenchmark.java:97`), done at file
    * granularity.
    */
  def merge(spark: SparkSession, table: Path, changes: DataFrame,
      keyCol: String, partCol: String, numFiles: Int = 8,
      operation: String = "merge"): Manifest = withCommitRetry(table) { () =>
    val cur = currentManifest(table)
    require(cur.deleteFiles.isEmpty,
      "pending equality deletes: run applyDeletes first")
    require(cur.partCol.isEmpty || cur.partCol == partCol,
      s"table is partitioned by '${cur.partCol}', not '$partCol' — " +
        "evolve the spec first (evolveSpec)")
    // The changed-partition set: small by definition (it is the
    // merge's write footprint — a batch touching every partition is
    // a full rewrite, not a merge).
    val parts = changes.select(col(partCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    // A file's bounds are only trustworthy under the change set's
    // spec: files written before a partition-spec evolution carry
    // their OLD spec's bounds (specCol), so they are conservatively
    // touched — the first post-evolution merge migrates them to the
    // new spec, after which pruning bites again (Iceberg's per-file
    // spec-id semantics, resolved by rewrite-on-touch).
    val (touched0, untouched0) = cur.files.partition(f =>
      (f.specCol.nonEmpty && f.specCol != partCol) ||
        parts.exists(p => p >= f.partMin && p <= f.partMax))
    // Partition-moving updates: a matched row whose CURRENT partition
    // differs from its change row's would otherwise survive in a
    // carried file while the change inserts — a duplicate key. Find
    // the bound-pruned files that hold matched keys and rewrite them
    // too ([[filesHoldingKeys]]).
    val holding = filesHoldingKeys(spark, table, cur.schema, untouched0,
      changes, keyCol)
    val (extraTouched, untouched) =
      untouched0.partition(f => holding(fileName(f.path)))
    val touched = touched0 ++ extraTouched
    val touchedDf =
      if (touched.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cur.schema)
      else spark.read.schema(cur.schema)
        .parquet(touched.map(f => table.resolve(f.path).toString): _*)
    // Matched base rows are replaced by their change row; unmatched
    // change rows insert. Null-safe key join is unnecessary (keys are
    // non-null by contract).
    val merged = touchedDf
      .join(changes.select(col(keyCol).as("__k")), col(keyCol) === col("__k"),
        "left_anti")
      .unionByName(changes.select(cur.schema.fieldNames.map(col): _*))
    val v = cur.version + 1
    val newFiles = writeDataFiles(spark, table, merged, partCol, s"merge-v$v",
      numFiles)
    val m = Manifest(v, cur.version, operation, cur.schema,
      untouched ++ newFiles, partCol)
    (m, newFiles, tryCommitManifest(table, m))
  }

  /** Copy-on-write row-level DELETE — the third row-level write face
    * (Iceberg `DELETE FROM`). Same file-level pruning as [[merge]]:
    * data files whose partition bounds miss every partition in the
    * delete set carry untouched; touched files are read once,
    * anti-joined against the delete keys, and rewritten. At 100 TB a
    * delete confined to k partitions costs one job over those
    * partitions' bytes only.
    */
  def delete(spark: SparkSession, table: Path, deleteKeys: DataFrame,
      keyCol: String, partCol: String, numFiles: Int = 8): Manifest = withCommitRetry(table) { () =>
    val cur = currentManifest(table)
    require(cur.deleteFiles.isEmpty,
      "pending equality deletes: run applyDeletes first")
    require(cur.partCol.isEmpty || cur.partCol == partCol,
      s"table is partitioned by '${cur.partCol}', not '$partCol' — " +
        "evolve the spec first (evolveSpec)")
    val parts = deleteKeys.select(col(partCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    val (touched0, untouched0) = cur.files.partition(f =>
      (f.specCol.nonEmpty && f.specCol != partCol) ||
        parts.exists(p => p >= f.partMin && p <= f.partMax))
    // Same partition-moving guard as [[merge]]: a delete key whose
    // row sits outside the stated partitions must still rewrite the
    // file holding it.
    val holding = filesHoldingKeys(spark, table, cur.schema, untouched0,
      deleteKeys, keyCol)
    val (extraTouched, untouched) =
      untouched0.partition(f => holding(fileName(f.path)))
    val touched = touched0 ++ extraTouched
    val v = cur.version + 1
    val newFiles =
      if (touched.isEmpty) Seq.empty
      else {
        val touchedDf = spark.read.schema(cur.schema)
          .parquet(touched.map(f => table.resolve(f.path).toString): _*)
        val kept = touchedDf.join(
          deleteKeys.select(col(keyCol).as("__k")),
          col(keyCol) === col("__k"), "left_anti")
        writeDataFiles(spark, table, kept, partCol, s"delete-v$v", numFiles)
      }
    val m = Manifest(v, cur.version, "delete", cur.schema,
      untouched ++ newFiles, partCol)
    (m, newFiles, tryCommitManifest(table, m))
  }

  /** Merge-on-read equality DELETE — Iceberg v2's delete files: the
    * delete commits as one TINY parquet of deleted key values beside
    * the untouched data files (zero data rewritten — contrast with
    * the copy-on-write [[delete]]), and every read of the snapshot
    * anti-joins the pending delete keys. The trade every MOR table
    * makes: O(batch) write cost now, a broadcast anti-join on each
    * read until [[applyDeletes]] folds the deletes into the data.
    */
  def deleteEquality(spark: SparkSession, table: Path, keys: DataFrame,
      keyCol: String): Manifest = {
    val cur0 = currentManifest(table)
    require(cur0.schema.fieldNames.contains(keyCol),
      s"delete key column '$keyCol' is not in the table schema")
    require(cur0.deleteFiles.forall(_.keyCol == keyCol),
      "all pending delete files must share one key column")
    // The delete file is written ONCE outside the commit retry, like
    // an append's data files — it doesn't depend on the snapshot the
    // commit lands on.
    val dataDir = table.resolve("data")
    Files.createDirectories(dataDir)
    val tmp = table.resolve(s".edel-tmp-${ProcessHandle.current().pid()}" +
      s"-${UUID.randomUUID().toString.take(8)}")
    keys.select(col(keyCol)).distinct().coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val stream = Files.list(tmp)
      try stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      finally stream.close()
    }
    val name = s"edelete-${UUID.randomUUID().toString.take(8)}.parquet"
    Files.move(part, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    deleteTree(tmp)
    val rows = spark.read.parquet(dataDir.resolve(name).toString).count()
    val d = DeleteFile(s"data/$name", keyCol, rows,
      Files.size(dataDir.resolve(name)))
    try withCommitRetry(table) { () =>
      val cur = currentManifest(table)
      require(cur.deleteFiles.forall(_.keyCol == keyCol),
        "all pending delete files must share one key column")
      val m = Manifest(cur.version + 1, cur.version, "delete-mor",
        cur.schema, cur.files, cur.partCol, cur.deleteFiles :+ d)
      (m, Seq.empty, tryCommitManifest(table, m))
    } catch { case e: java.util.ConcurrentModificationException =>
      Files.deleteIfExists(dataDir.resolve(name))
      throw e
    }
  }

  /** Fold pending equality deletes into the data — Iceberg's
    * `rewrite_position_delete_files` / compaction-with-deletes: every
    * data file is read through the delete anti-join and rewritten;
    * the new snapshot carries no delete files, restoring plain-scan
    * reads (and re-enabling the COW ops, which refuse to run over
    * pending deletes). The displaced data and delete files expire
    * with their snapshots.
    */
  def applyDeletes(spark: SparkSession, table: Path, partCol: String,
      numFiles: Int = 8): Manifest = withCommitRetry(table) { () =>
    val cur = currentManifest(table)
    require(cur.deleteFiles.nonEmpty, "no pending equality deletes")
    val df = read(spark, table) // data minus pending delete keys
    val v = cur.version + 1
    val newFiles = writeDataFiles(spark, table, df, partCol,
      s"applydel-v$v", numFiles)
    val m = Manifest(v, cur.version, "apply-deletes", cur.schema, newFiles,
      if (cur.partCol.nonEmpty) cur.partCol else partCol, Seq.empty)
    (m, newFiles, tryCommitManifest(table, m))
  }

  /** Incremental (changelog) read: the rows ADDED between two
    * snapshots, served by scanning exactly the data files present in
    * `toVersion`'s manifest but not in `fromVersion`'s — Iceberg's
    * incremental append scan. No base data is touched at all (the
    * scale contrast with a logical diff join: consuming a day of
    * appends from a 100 TB table reads only that day's files).
    * Restricted, like Iceberg's, to append-only history: a
    * replace-style commit (merge/delete/compact) between the two
    * versions would surface rewritten old rows as "new", so it
    * raises instead.
    */
  def incrementalRead(spark: SparkSession, table: Path,
      fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion < toVersion,
      s"fromVersion $fromVersion must precede toVersion $toVersion")
    val to = manifest(table, toVersion)
    ((fromVersion + 1) to toVersion).foreach { v =>
      val op = manifest(table, v).operation
      require(op == "append" || op == "add-column" || op == "evolve-spec",
        s"incremental read requires append-only history; " +
          s"snapshot $v is '$op'")
    }
    val fromFiles = manifest(table, fromVersion).files.map(_.path).toSet
    val added = to.files.filterNot(f => fromFiles(f.path))
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], to.schema)
    else
      spark.read.schema(to.schema)
        .parquet(added.map(f => table.resolve(f.path).toString): _*)
  }

  /** Snapshot history of the live (non-expired) manifests, ascending
    * — the data behind the `.snapshots` metadata table (Iceberg's
    * `table.snapshots` / `table.history` surface). Driver-side by
    * definition: manifests are metadata.
    */
  def history(table: Path): Seq[(Int, Int, String, Long, Long, Long)] =
    liveVersions(table).map { v =>
      val m = manifest(table, v)
      (m.version, m.parent, m.operation, m.files.size.toLong,
        m.files.map(_.rows).sum, m.files.map(_.bytes).sum)
    }

  /** Append-only commit: new files for `df`, everything live carried
    * over. The schema used is the CURRENT manifest's (an appended
    * batch after `addColumn` carries the new column).
    */
  def append(spark: SparkSession, table: Path, df: DataFrame,
      partCol: String, numFiles: Int = 8): Manifest = {
    // Data files are written ONCE, outside the retry loop: an
    // append's files don't depend on the snapshot it lands on, so a
    // lost commit race re-publishes the SAME files against the new
    // current instead of deleting and rewriting them. Beyond saving
    // the rewrite, this keeps the data/ directory append-only under
    // racing appenders — the invariant the streaming read
    // ([[graft.streaming.SnapshotStream]]) relies on (a deleted
    // attempt file would already sit in the stream's file log).
    val entrySchema = currentManifest(table).schema
    val newFiles = writeDataFiles(spark, table,
      df.select(entrySchema.fieldNames.map(col): _*), partCol,
      s"append-${UUID.randomUUID().toString.take(8)}", numFiles)
    try withCommitRetry(table) { () =>
      val cur = currentManifest(table)
      // Delete keys apply to EVERY data file of their snapshot in
      // this model (no per-file sequence numbers), so appending under
      // pending deletes would wrongly suppress re-inserted keys.
      require(cur.deleteFiles.isEmpty,
        "pending equality deletes: run applyDeletes first")
      val m = Manifest(cur.version + 1, cur.version, "append", cur.schema,
        cur.files ++ newFiles,
        if (cur.partCol.nonEmpty) cur.partCol else partCol)
      (m, Seq.empty, tryCommitManifest(table, m))
    } catch { case e: java.util.ConcurrentModificationException =>
      // Retry budget exhausted: the never-published files must not
      // linger as orphans.
      newFiles.foreach(f => Files.deleteIfExists(table.resolve(f.path)))
      throw e
    }
  }

  /** Bin-pack small-file compaction — the core Iceberg maintenance
    * action (`rewrite_data_files`). Files are walked in partition
    * order and packed into bins of ≈`targetBytes`; every bin holding
    * more than one file is read once and rewritten as one file,
    * single-file bins carry over with zero IO. Contents are
    * byte-for-byte the same rows; only the layout changes.
    */
  def compact(spark: SparkSession, table: Path, partCol: String,
      targetBytes: Long): Manifest = withCommitRetry(table) { () =>
    val cur = currentManifest(table)
    require(cur.deleteFiles.isEmpty,
      "pending equality deletes: run applyDeletes first")
    val sorted = cur.files.sortBy(f => (f.partMin, f.path))
    val bins = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[FileEntry])
    sorted.foreach { f =>
      if (bins.last.nonEmpty && bins.last.map(_.bytes).sum + f.bytes > targetBytes)
        bins += scala.collection.mutable.ArrayBuffer.empty[FileEntry]
      bins.last += f
    }
    val v = cur.version + 1
    val newFiles = bins.filter(_.nonEmpty).zipWithIndex.flatMap {
      case (bin, _) if bin.size == 1 => bin // already compact: zero IO
      case (bin, i) =>
        val df = spark.read.schema(cur.schema)
          .parquet(bin.map(f => table.resolve(f.path).toString).toSeq: _*)
        // One output file per bin — that is the bin's definition.
        writeDataFiles(spark, table, df, partCol, s"compact-v$v-b$i",
          numFiles = 1)
    }.toSeq
    val m = Manifest(v, cur.version, "compact", cur.schema, newFiles,
      if (cur.partCol.nonEmpty) cur.partCol else partCol)
    // Carried single-file bins are NOT attempt-written files — only
    // the bins this attempt rewrote may be deleted on a lost race.
    val attemptWritten = newFiles.filterNot(cur.files.contains)
    (m, attemptWritten, tryCommitManifest(table, m))
  }

  /** Partition-spec evolution — Iceberg's headline storage feature:
    * change the table's partition column WITHOUT rewriting a single
    * data file. A pure metadata commit: the new manifest lists the
    * same files (each still carrying the bounds of the spec it was
    * written under, `FileEntry.specCol`) and records the new current
    * spec. Old-spec files lose bound-based pruning against new-spec
    * change sets, so the first merge/delete that touches them
    * migrates them by rewrite (rewrite-on-touch); new writes cluster
    * and bound on the new column immediately.
    */
  def evolveSpec(table: Path, newPartCol: String): Manifest =
    withCommitRetry(table) { () =>
      val cur = currentManifest(table)
      require(cur.schema.fieldNames.contains(newPartCol),
        s"partition column '$newPartCol' is not in the table schema")
      require(cur.partCol != newPartCol, s"spec is already '$newPartCol'")
      val m = Manifest(cur.version + 1, cur.version, "evolve-spec",
        cur.schema, cur.files, newPartCol)
      (m, Seq.empty, tryCommitManifest(table, m))
    }

  /** Sort-order rewrite — Iceberg's `rewrite_data_files` with a sort
    * order (the read-locality maintenance action behind Z-ordering):
    * every live file is rewritten range-clustered on `clusterExprs`,
    * so rows that are filtered together land together and per-file /
    * per-row-group min-max pruning bites on the clustered columns.
    * Contents are exactly the same rows; only placement changes. At
    * scale this is one shuffle-write job over the table (or a
    * partition subset — callers can compose with manifest pruning),
    * traded for every subsequent scan's pruning win.
    */
  def rewriteClustered(spark: SparkSession, table: Path,
      partCol: String, clusterExprs: Seq[org.apache.spark.sql.Column],
      numFiles: Int = 8): Manifest = withCommitRetry(table) { () =>
    val cur = currentManifest(table)
    require(cur.deleteFiles.isEmpty,
      "pending equality deletes: run applyDeletes first")
    val df = spark.read.schema(cur.schema)
      .parquet(cur.files.map(f => table.resolve(f.path).toString): _*)
    val v = cur.version + 1
    // Sort WITHIN the partition layout (Iceberg sort orders apply
    // under the partition spec): the partition column leads the
    // clustering so per-file partition bounds stay tight for manifest
    // pruning, and the sort columns cluster inside it.
    val newFiles = writeDataFiles(spark, table, df, partCol,
      s"cluster-v$v", numFiles, col(partCol) +: clusterExprs)
    val m = Manifest(v, cur.version, "rewrite-sorted", cur.schema, newFiles,
      if (cur.partCol.nonEmpty) cur.partCol else partCol)
    (m, newFiles, tryCommitManifest(table, m))
  }

  /** Snapshot expiry: keep the newest `keepLast` snapshots, delete
    * older manifests, then delete any data file referenced ONLY by
    * the expired snapshots (orphan cleanup). Live reads are
    * untouched — their files were carried forward by the commits
    * that superseded the expired ones. Expired `VERSION AS OF` reads
    * fail with the missing-snapshot error from [[manifest]].
    * Returns (expired versions, deleted data files).
    */
  def expire(table: Path, keepLast: Int): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val vs = liveVersions(table)
    val protect = tags(table).values.toSet
    // Tagged snapshots are retention-protected, like Iceberg's tagged
    // references: expiry skips them (and keeps their files live).
    val (dead, live) = {
      val (d, l) = vs.splitAt(math.max(0, vs.size - keepLast))
      val (protected_, reallyDead) = d.partition(protect)
      (reallyDead, protected_ ++ l)
    }
    val keepFiles = live.flatMap { v =>
      val m = manifest(table, v)
      m.files.map(_.path) ++ m.deleteFiles.map(_.path)
    }.toSet
    val deadFiles = dead.flatMap { v =>
      val m = manifest(table, v)
      m.files.map(_.path) ++ m.deleteFiles.map(_.path)
    }.distinct.filterNot(keepFiles)
    dead.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    deadFiles.foreach(p => Files.deleteIfExists(table.resolve(p)))
    (dead, deadFiles)
  }

  // ----------------------------------------------------------------
  // Tagged references + rollback — the snapshot-lifecycle faces
  // Iceberg exposes as `CREATE TAG` / `VERSION AS OF 'tag'` /
  // `rollback_to_snapshot`.

  private def refsPath(table: Path): Path = snapDir(table).resolve("refs")

  /** Named snapshot tags: `name=version` lines under
    * `_snapshots/refs`. Tags pin a version for readers (audit sets,
    * eval checkpoints) and protect it from [[expire]].
    */
  def tags(table: Path): Map[String, Int] = {
    val p = refsPath(table)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.filter(_.contains("="))
      .map { l => val Array(n, v) = l.split("=", 2); n -> v.toInt }
      .toMap
  }

  /** Create (or move) a tag pointing at `version`. */
  def tag(table: Path, name: String, version: Int): Unit = synchronized {
    require(name.nonEmpty && !name.forall(_.isDigit),
      s"tag name '$name' must be non-numeric (numeric = version id)")
    manifest(table, version) // raises if missing/expired
    val all = tags(table) + (name -> version)
    val tmp = refsPath(table).resolveSibling(
      s".refs.tmp-${ProcessHandle.current().pid()}")
    Files.writeString(tmp,
      all.toSeq.sortBy(_._1).map { case (n, v) => s"$n=$v" }.mkString("", "\n", "\n"))
    Files.move(tmp, refsPath(table),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Resolve a version string as a tag name or numeric version. */
  def resolveVersion(table: Path, ref: String): Int =
    if (ref.forall(_.isDigit)) ref.toInt
    else tags(table).getOrElse(ref,
      throw new IllegalArgumentException(
        s"Cannot find snapshot reference '$ref' for table $table"))

  /** Rollback — Iceberg's `rollback_to_snapshot`: make the table's
    * CURRENT state an older snapshot's contents again, as a NEW
    * commit that lists the old snapshot's files (history is never
    * rewritten; the bad commits stay inspectable until expiry).
    * Pure metadata — zero data IO.
    */
  def rollback(table: Path, toVersion: Int): Manifest =
    withCommitRetry(table) { () =>
      val cur = currentManifest(table)
      val target = manifest(table, toVersion)
      require(toVersion < cur.version,
        s"rollback target $toVersion must precede current ${cur.version}")
      val m = Manifest(cur.version + 1, cur.version, "rollback",
        target.schema, target.files, target.partCol, target.deleteFiles)
      (m, Seq.empty, tryCommitManifest(table, m))
    }

  /** Schema evolution: `ADD COLUMN` is a pure metadata commit — the
    * new manifest lists the SAME data files under the widened
    * schema; historical files lack the column and read as nulls,
    * new appends carry it. No data is rewritten, exactly Iceberg's
    * evolution contract.
    */
  def addColumn(table: Path, field: StructField): Manifest =
    withCommitRetry(table) { () =>
      val cur = currentManifest(table)
      require(!cur.schema.fieldNames.contains(field.name),
        s"column ${field.name} already exists")
      val m = Manifest(cur.version + 1, cur.version, "add-column",
        StructType(cur.schema.fields :+ field.copy(nullable = true)),
        cur.files, cur.partCol, cur.deleteFiles)
      (m, Seq.empty, tryCommitManifest(table, m))
    }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
}
