package graft.sources

import java.nio.file.Paths
import java.util

import scala.collection.mutable

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NATIVE streaming read from a [[SnapStore]] table — a DSv2
  * `MicroBatchStream` over the manifest log, superseding the
  * label-glob file feed ([[graft.streaming.SnapshotStream.appendFeed]])
  * where schema evolution is in play:
  *
  *  - **Offsets are feed indexes.** The feed is the current
  *    manifest's data files ordered by `(seq, path)` — append-only
  *    history only ever EXTENDS that order (new files carry a higher
  *    sequence), so an offset checkpointed yesterday still denotes
  *    the same files today: exactly-once across restarts, straight
  *    from manifest metadata, no separate file log.
  *  - **Per-batch evolution resolution (VERDICT r9 #3).** Every
  *    trigger re-reads the CURRENT manifest's evolution log and maps
  *    each file's as-written columns onto the stream's start schema —
  *    exactly the inversion batch reads do ([[SnapStore.scanFiles]]).
  *    A rename committed MID-STREAM therefore rides through without
  *    a restart: appends written under the new physical name arrive
  *    with correct values in the started column (Spark pins a
  *    stream's output schema at start; the logical column is the
  *    same — Iceberg's field-id indirection re-expressed over the
  *    evolution log). The old feed served such rows as silent nulls,
  *    then grew a loud opt-in guard; this source needs neither.
  *  - **Loud on the genuinely unrepresentable**: a post-start WIDEN
  *    of a streamed column (values may exceed the started type) or a
  *    post-start DROP fails the trigger with the evolve error, and a
  *    replace-style commit (merge/delete/compact/MOR) fails the
  *    append-only contract check — never silent wrong rows.
  *  - **Rate limiting**: `maxFilesPerTrigger` and
  *    `maxBytesPerTrigger` bound each batch (composable — the most
  *    restrictive wins; byte budgets come straight from manifest
  *    stats, zero IO), and `Trigger.AvailableNow` drains exactly the
  *    snapshots present at start then stops — the admission-control
  *    faces of Iceberg's streaming read (`max-files-per-micro-batch`,
  *    `max-bytes-per-micro-batch`).
  *
  * Reference face: Iceberg's `SparkMicroBatchStream` (the streaming
  * read inside the runtime `spark_submit_with_analytics_core.sh`
  * loads).
  */
class SnapStreamSource extends TableProvider {
  private def dirOf(opts: CaseInsensitiveStringMap): java.nio.file.Path =
    Paths.get(Option(opts.get("dir")).getOrElse(
      throw new IllegalArgumentException(
        "SnapStreamSource requires a 'dir' option")))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapStore.currentManifest(dirOf(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val dir = dirOf(opts)
    // Zero/negative caps refuse at option parse (ADVICE r11):
    // maxFilesPerTrigger=0 would yield ReadLimit.maxFiles(0) — an
    // offset that never advances, a silently stalled stream (and a
    // composite min() would inherit the stall).
    val maxFiles = Option(opts.get("maxFilesPerTrigger")).map(_.toInt)
    maxFiles.foreach(n => require(n > 0,
      s"maxFilesPerTrigger must be positive, got $n"))
    val maxBytes = Option(opts.get("maxBytesPerTrigger")).map(_.toLong)
    maxBytes.foreach(b => require(b > 0,
      s"maxBytesPerTrigger must be positive, got $b"))
    val skipDeletes = Option(opts.get("skipDeleteSnapshots"))
      .exists(_.toBoolean)
    new SnapStreamTable(dir, schema, maxFiles, maxBytes, skipDeletes)
  }

  override def supportsExternalMetadata(): Boolean = false
}

final class SnapStreamTable(dir: java.nio.file.Path,
    startSchema: StructType, maxFiles: Option[Int],
    maxBytes: Option[Long] = None,
    skipDeletes: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snap-stream-${dir.getFileName}"
  override def schema(): StructType = startSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = startSchema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream = {
          // The version whose schema the output was derived from: the
          // anchor every per-batch rename walk starts at. Loud if the
          // table evolved between schema inference and planning.
          val m = SnapStore.currentManifest(dir)
          require(m.schema == startSchema,
            s"table $dir evolved during stream construction — restart")
          new SnapMicroBatchStream(SparkSession.active, dir, startSchema,
            m.version, maxFiles, maxBytes, skipDeletes)
        }
        override def description(): String =
          s"graft-snap-stream $dir"
      }
    }
}

private final case class SnapStreamOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** One feed file range with everything the task needs baked in: a
  * serializable parquet reader under the file's AS-WRITTEN schema and
  * the projection onto the stream's start schema.
  */
private final case class SnapStreamPartition(
    reader: PartitionedFile => Iterator[InternalRow],
    outExprs: Seq[Expression],
    path: String, start: Long, length: Long,
    fileSize: Long) extends InputPartition

final class SnapMicroBatchStream(spark: SparkSession,
    dir: java.nio.file.Path, startSchema: StructType, startVersion: Int,
    maxFiles: Option[Int], maxBytes: Option[Long] = None,
    skipDeletes: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  import graft.streaming.SnapshotStream.appendOnly

  /** Ops tolerated under `skipDeleteSnapshots=true` — Iceberg's
    * `streaming-skip-delete-snapshots` face, safe for THIS feed by
    * construction: a MOR equality/position delete or a delete-file
    * compaction commits DELETE files only, so the `(seq, path)` data-
    * file order the offsets index never changes. The feed keeps
    * serving raw appends (pending deletes are not applied — the same
    * appends-only view Iceberg's option yields). Replace-style
    * commits (merge, compact, overwrite) still fail: they rewrite the
    * data-file list itself and no skip can make the offsets stable.
    */
  private val deleteOnly = Set("delete-mor", "delete-pos", "rewrite-deletes")

  /** History versions already validated append-only — each trigger
    * checks only the versions committed since (manifest reads stay
    * O(new commits), not O(history)).
    */
  private var checkedThrough = 0

  private def requireStreamable(): SnapStore.Manifest = {
    // Read the manifest FIRST, then validate the history up to AND
    // INCLUDING its version from a listing taken after it — the other
    // order (validate a version listing, then separately read the
    // current manifest) lets a replace-style commit land between the
    // two reads and return a manifest whose rewritten file list was
    // never checked, silently reordering the (seq, path) feed for one
    // trigger (ADVICE r10). Commits are sequential, so every version
    // <= m.version is already installed when the post-read listing
    // runs; versions ABOVE m.version validate on the trigger that
    // serves them.
    val m = SnapStore.currentManifest(dir)
    SnapStore.liveVersions(dir)
      .filter(v => v > checkedThrough && v <= m.version)
      .foreach { v =>
        val op = SnapStore.operationOf(dir, v)
        require(appendOnly(op) || (skipDeletes && deleteOnly(op)),
          s"streaming read requires append-only history; snapshot $v is " +
            s"'$op'" + (if (!skipDeletes && deleteOnly(op))
              " (set skipDeleteSnapshots=true to stream past " +
                "delete-file-only commits)" else ""))
      }
    checkedThrough = math.max(checkedThrough, m.version)
    m
  }

  /** The feed order: current files by `(seq, path)` — append-only
    * history only extends it, so indexes are checkpoint-stable.
    */
  private def feed(m: SnapStore.Manifest): Seq[SnapStore.FileEntry] =
    m.files.sortBy(f => (f.seq, f.path))

  override def initialOffset(): Offset = SnapStreamOffset(0L)
  override def deserializeOffset(json: String): Offset =
    SnapStreamOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFiles.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxBytes.map(b => ReadLimit.maxBytes(b)).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** `Trigger.AvailableNow` (Iceberg streams support it too): the end
    * offset is pinned at prepare time, Spark then drains up to it in
    * rate-limited batches and stops — snapshots committed after the
    * prepare are NOT served this run.
    */
  private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(feed(requireStreamable()).size.toLong)

  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  /** One ReadLimit's cap on the next end index, from the feed's file
    * sizes (manifest stats — no IO). Bytes admit whole files while
    * the budget holds, ALWAYS at least one (progress guarantee, the
    * file-source/Iceberg `max-bytes-per-trigger` contract: a file
    * larger than the budget still streams, alone). Composite = the
    * most restrictive of its members.
    */
  private def capFor(files: Seq[SnapStore.FileEntry], s: Long,
      limit: ReadLimit): Long = limit match {
    case f: ReadMaxFiles => math.min(files.size.toLong, s + f.maxFiles())
    case b: ReadMaxBytes =>
      var i = s.toInt
      var acc = 0L
      while (i < files.size &&
        (i == s.toInt || acc + files(i).bytes <= b.maxBytes())) {
        acc += files(i).bytes
        i += 1
      }
      i.toLong
    case c: CompositeReadLimit =>
      c.getReadLimits.map(l => capFor(files, s, l)).min
    case _ => files.size.toLong
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val files = feed(requireStreamable())
    val s = start.asInstanceOf[SnapStreamOffset].index
    val capped = math.min(capFor(files, s, limit),
      availableNowEnd.getOrElse(Long.MaxValue))
    SnapStreamOffset(math.max(s, capped))
  }

  override def reportLatestOffset(): Offset =
    SnapStreamOffset(feed(SnapStore.currentManifest(dir)).size.toLong)

  /** The stream-start-schema name of a column as of the CURRENT
    * schema: renames committed after the start version walk forward.
    * Returns the current physical name; loud when the column was
    * dropped mid-stream.
    */
  private def currentNameOf(m: SnapStore.Manifest, n0: String): String = {
    val nc = m.evos.filter(e => e.kind == "rename" && e.seq > startVersion)
      .sortBy(_.seq)
      .foldLeft(n0)((n, e) => if (e.col == n) e.arg else n)
    require(m.schema.fieldNames.contains(nc),
      s"streamed column '$n0' was dropped mid-stream (table $dir) — " +
        "restart the stream against the current schema")
    nc
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val m = requireStreamable()
    val s = start.asInstanceOf[SnapStreamOffset].index.toInt
    val e = end.asInstanceOf[SnapStreamOffset].index.toInt
    val files = feed(m).slice(s, e)
    if (files.isEmpty) return Array.empty
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val evos = m.evos.filter(_.kind != "drop").sortBy(_.seq)
    // Current physical name + mid-stream widen guard, once per batch.
    val currentNames = startSchema.fields.toSeq.map { f0 =>
      val nc = currentNameOf(m, f0.name)
      val tc = m.schema(nc).dataType
      // A current type differing from the started one can only be a
      // post-start WIDEN — new values may not fit the started type,
      // so this is the one evolution that genuinely needs a restart.
      require(tc == f0.dataType,
        s"streamed column '${f0.name}' was widened mid-stream " +
          s"(${f0.dataType.simpleString} -> ${tc.simpleString}) — values " +
          "may not fit the started type; restart the stream")
      nc
    }
    val maxSplit = math.max(1L,
      spark.sessionState.conf.filesMaxPartitionBytes)
    val parts = mutable.ArrayBuffer.empty[InputPartition]
    // Files group by how many evolutions apply (a suffix of the log),
    // exactly like SnapStore.scanFiles: one reader + projection per
    // treatment.
    files.groupBy(f => evos.count(_.seq > f.seq)).foreach { case (k, gfs) =>
      val applicable = evos.takeRight(k)
      val written = SnapStore.readSchemaFor(m, applicable)
      val writtenByCurrent = m.schema.fieldNames.zip(written.fields).toMap
      // Start-schema field -> (as-written name, as-written type): the
      // applicable renames invert from the current name; fields the
      // file predates (added later) keep the start type and read null.
      val readFields = startSchema.fields.toSeq.zip(currentNames).map {
        case (f0, nc) =>
          val wf = writtenByCurrent(nc)
          StructField(wf.name, wf.dataType, nullable = true)
      }
      val readSchema = StructType(readFields)
      val reader = SnapBatch.rowReader(spark, written, readSchema)
      // Initial-default substitutions (Iceberg v3 `adddef` evos,
      // ADVICE r12): every file of this treatment predates the
      // ADD COLUMN ... DEFAULT, so the null-filled physical column
      // IS the constant — emit the literal, exactly as both batch
      // paths do. Keyed by CURRENT name (what addDefaultsFor
      // yields); the mid-stream widen guard above proved the current
      // type equals the started one, so the literal's type is right.
      val defaults = SnapStore.addDefaultsFor(applicable, m.schema)
        .map { case (fin, sql) =>
          fin -> SnapStore.defaultLiteral(sql, m.schema(fin).dataType)
        }.toMap
      val outExprs = startSchema.fields.toSeq.zipWithIndex.map {
        case (f0, i) =>
          defaults.get(currentNames(i)) match {
            case Some(litv) => litv: Expression
            case None =>
              val wt = readFields(i).dataType
              val br = BoundReference(i, wt, nullable = true)
              (if (wt == f0.dataType) br else Cast(br, f0.dataType, Some(tz)))
                : Expression
          }
      }
      gfs.foreach { f =>
        val abs = dir.resolve(f.path).toString
        var off = 0L
        while (off < f.bytes) {
          val len = math.min(maxSplit, f.bytes - off)
          parts += SnapStreamPartition(reader, outExprs, abs, off, len,
            f.bytes)
          off += len
        }
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val sp = p.asInstanceOf[SnapStreamPartition]
        val it = sp.reader(PartitionedFile(InternalRow.empty,
          SparkPath.fromPathString(sp.path), sp.start, sp.length,
          Array.empty[String], 0L, sp.fileSize, Map.empty))
        new PartitionReader[InternalRow] {
          private lazy val proj = UnsafeProjection.create(sp.outExprs)
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            cur = proj(it.next()); true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = it match {
            case c: java.io.Closeable => c.close()
            case _ => ()
          }
        }
      }
    }
}
