package graft.sources

import java.nio.file.{Files, Path}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read SQL DML (VERDICT r12 #2) — the delta-based
  * row-level operation behind `DELETE`/`UPDATE`/`MERGE INTO` when the
  * table's write-mode properties say `merge-on-read`:
  * `write.delete.mode`, `write.update.mode`, `write.merge.mode` —
  * Iceberg's per-command write modes (the affordable default real
  * 100 TB tables run: a one-row DELETE writes a few-KB delete file
  * instead of rewriting whole data files).
  *
  * Spark's delta rewrite (`SupportsDelta`) identifies each matched
  * row by the [[rowId]] metadata columns `_file`/`_pos` and streams
  * per-row delete/insert instructions to [[SnapDeltaWriter]]s:
  * deletes append `(file, pos)` pairs to position-delete parquets,
  * inserts (MERGE) and update-reinserts write new data files —
  * nothing rewrites base data. Updates arrive split
  * ([[representUpdateAsDeleteAndInsert]]), exactly Iceberg's
  * position-delta encoding.
  *
  * Unlike the group-based COW operation, the scan may push ROW
  * filters: rows are identified individually, so the untouched rows
  * of a touched file never re-write — the scan is the table's normal
  * native read ([[BridgedReadTable]]), condition pushdown, column
  * pruning, manifest pruning and runtime filtering included.
  *
  * Reference face: Iceberg's `SparkPositionDeltaOperation` behind
  * `spark_submit_with_analytics_core.sh:11-17`'s runtime.
  */
final class SnapDeltaOperation(
    cmd: RowLevelOperation.Command,
    dir: Path) extends RowLevelOperation with SupportsDelta {

  // WAP staging (Iceberg `spark.wap.branch`) COMPOSES with MOR delta
  // DML (r14, lifting the r13 refusal): the delta's delete files and
  // new data files commit on the staging branch — stamped
  // fork-relative like branch appends — main byte-frozen until the
  // explicit publish, and fast-forward adopts the delete files with
  // their relative sequence order preserved. Id-keyed staging
  // (`spark.wap.id`) covers the INSERT faces only — refuse, the same
  // guard the COW row-level path holds (cherry-pick can only
  // re-apply appends onto a moved main).
  SnapStore.requireOneWapConf(SparkSession.active)
  private val wapBranch: Option[String] =
    SnapStore.wapBranch(SparkSession.active)
  require(wapBranch.nonEmpty ||
    SnapStore.wapId(SparkSession.active).isEmpty,
    "spark.wap.id staging covers INSERT INTO/OVERWRITE only; use " +
      "spark.graft.wap.branch for staged DML")

  /** The snapshot the whole operation runs against — scan and commit
    * validate against this one manifest. A WAP session reads the
    * staged branch head (stacked staged DML composes); until the
    * branch materializes (at first write, never at plan time) the
    * main head IS the would-be fork state.
    */
  private val readM: SnapStore.Manifest =
    wapBranch.flatMap(b => SnapStore.branchHead(dir, b)
      .map(_ => SnapStore.branchHeadManifest(dir, b)))
      .getOrElse(SnapStore.currentManifest(dir))

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(SnapBatch.MetaFile),
      Expressions.column(SnapBatch.MetaPos))

  /** v3 row-lineage carry on the DELTA path too (matching the COW
    * group rewrite): `_row_id` is declared preserve-on-reinsert, so
    * a split-update's reinserted row keeps its identity; the
    * sequence column nullifies and the read re-stamps it from the
    * new file. Fresh MERGE inserts carry no metadata and inherit
    * fresh ids. Skipped only when a data column shadows the names.
    */
  private val lineageMeta: Seq[String] = {
    val want = Seq(SnapBatch.MetaRowId, SnapBatch.MetaLastSeq)
    if (want.forall(n => !readM.schema.fieldNames.contains(n))) want
    else Seq.empty
  }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    lineageMeta.map(Expressions.column).toArray

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BridgedReadTable(s"graft-mor-dml-$dir", dir, readM)
      .newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new SnapDeltaWrite(dir, readM, cmd, info, wapBranch, lineageMeta)
    }

  override def description(): String = s"graft-mor-$cmd $dir"
}

/** The delta write: task-side parquet writers for new data rows and
  * position-delete pairs, one atomic manifest commit adopting both.
  */
final class SnapDeltaWrite(dir: Path, readM: SnapStore.Manifest,
    cmd: RowLevelOperation.Command, info: LogicalWriteInfo,
    wapBranch: Option[String] = None,
    lineageMeta: Seq[String] = Seq.empty)
    extends DeltaWrite with RequiresDistributionAndOrdering {

  private val spark = SparkSession.active
  private val runId =
    s"${ProcessHandle.current().pid()}-${UUID.randomUUID().toString.take(8)}"
  private val dataTmp = dir.resolve(s".mor-dml-data-$runId")
  private val delTmp = dir.resolve(s".mor-dml-del-$runId")

  override def description(): String = s"graft-mor-delta-$cmd $dir"

  /** Cluster + order the delta stream so the files it produces stay
    * prunable: delete instructions group by their TARGET file with
    * sorted ordinals (one pair run per touched file), and — when the
    * plan carries data columns (MERGE/UPDATE) — insert rows cluster
    * by the partition source first, keeping new data files'
    * manifest bounds tight. A DELETE plan carries only
    * operation+rowId, so only the rowId sort applies there.
    */
  private lazy val sorts: Array[SortOrder] = {
    val rowIdSorts = Array(
      Expressions.sort(Expressions.column(SnapBatch.MetaFile),
        SortDirection.ASCENDING),
      Expressions.sort(Expressions.column(SnapBatch.MetaPos),
        SortDirection.ASCENDING))
    if (cmd == RowLevelOperation.Command.DELETE) rowIdSorts
    else PartTransforms.parseMulti(readM.partCol)
      .map(s => Expressions.sort(Expressions.column(s.source),
        SortDirection.ASCENDING)).toArray ++ rowIdSorts
  }
  override def requiredDistribution(): Distribution =
    Distributions.ordered(sorts)
  override def requiredOrdering(): Array[SortOrder] = sorts

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    // Driver-built serializable parquet writer factories — the same
    // prepareWrite recipe Spark's own file writes use; the captured
    // job configuration carries the output schema settings the
    // task-side ParquetOutputWriter reads back.
    private def factoryFor(schema: StructType):
        (OutputWriterFactory, SerializableHadoopConf) = {
      val job = Job.getInstance(spark.sessionState.newHadoopConf())
      // `write.parquet.compression-codec` (table property) drives the
      // codec, like every owned writer.
      val f = new ParquetFileFormat().prepareWrite(
        spark, job, SnapStore.parquetWriteOptions(dir), schema)
      (f, new SerializableHadoopConf(job.getConfiguration))
    }

    // v3 lineage carry: the staged data parquets materialize the
    // lineage metadata after the data columns (reinserts keep their
    // preserved `_row_id`; the nullified sequence and fresh inserts'
    // NULLs re-stamp/assign via the read's v3 null rule).
    private val stagedSchema: StructType =
      if (lineageMeta.isEmpty) info.schema()
      else StructType(info.schema().fields ++
        lineageMeta.map(SnapBatch.metaField))

    override def createBatchWriterFactory(
        p: PhysicalWriteInfo): DeltaWriterFactory = {
      Files.createDirectories(dataTmp)
      Files.createDirectories(delTmp)
      val (df, dc) = factoryFor(stagedSchema)
      val (pf, pc) = factoryFor(SnapDeltaWriter.PairSchema)
      SnapDeltaWriterFactory(dataTmp.toString, delTmp.toString,
        stagedSchema, df, dc, pf, pc, lineageMeta.size)
    }

    // The commit adopts ONLY the files the committed task attempts
    // reported ([[SnapDeltaTaskFiles]]): a crashed or zombie attempt
    // whose abort never ran may have left parquets in the staging
    // dirs, and adopting them would duplicate rows (or commit a
    // truncated footer). commitDeltaFromStaging drops the unlisted
    // leftovers.
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val msgs = messages.collect { case m: SnapDeltaTaskFiles => m }
      SnapStore.commitDeltaFromStaging(spark, dir, dataTmp, delTmp,
        s"${cmd.toString.toLowerCase(java.util.Locale.ROOT)}-mor", readM,
        msgs.flatMap(_.dataFiles).toSet, msgs.flatMap(_.deleteFiles).toSet,
        branch = wapBranch, materializedLineage = lineageMeta.nonEmpty)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      SnapStore.dropDeltaStaging(dataTmp, delTmp)
  }
}

/** A Java-serializable Hadoop `Configuration` envelope (the shared
  * Spark one is `private[spark]`).
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

final case class SnapDeltaTaskFiles(dataFiles: Seq[String],
    deleteFiles: Seq[String]) extends WriterCommitMessage

final case class SnapDeltaWriterFactory(dataTmp: String, delTmp: String,
    dataSchema: StructType,
    dataFactory: OutputWriterFactory, dataConf: SerializableHadoopConf,
    pairFactory: OutputWriterFactory, pairConf: SerializableHadoopConf,
    metaFields: Int = 0)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new SnapDeltaWriter(this, partitionId, taskId)
}

/** One task's delta writer: both outputs open LAZILY (a delete-only
  * task writes no data parquet and vice versa), rows stream straight
  * through — no task-side buffering, bounded by nothing but disk.
  * `_file` arrives as the RESOLVED path (the `_file` metadata-column
  * convention); pair files store the bare NAME, the key the manifest
  * routes and the read-side [[SnapDeleteCache]] loads by.
  */
final class SnapDeltaWriter(f: SnapDeltaWriterFactory, partitionId: Int,
    taskId: Long) extends DeltaWriter[InternalRow] {

  private def ctx(conf: Configuration): TaskAttemptContext =
    new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID("graft-mor-dml", partitionId,
        TaskType.MAP, partitionId), taskId.toInt & Int.MaxValue))

  private val suffix =
    s"$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}.parquet"
  private var dataW: OutputWriter = _
  private var pairW: OutputWriter = _
  private val pairRow = new GenericInternalRow(2)

  private val metaNulls = new GenericInternalRow(f.metaFields)
  private val joined =
    new org.apache.spark.sql.catalyst.expressions.JoinedRow()

  private def writeData(row: InternalRow): Unit = {
    if (dataW == null)
      dataW = f.dataFactory.newInstance(
        s"${f.dataTmp}/ins-$suffix", f.dataSchema, ctx(f.dataConf.value))
    dataW.write(row)
  }

  // Fresh inserts carry NO metadata: NULL lineage columns, which the
  // read inherits as fresh first_row_id + pos ids (v3's null rule).
  override def insert(row: InternalRow): Unit =
    if (f.metaFields == 0) writeData(row)
    else writeData(joined(row, metaNulls))

  // A split-update's reinsert keeps its metadata: the preserved
  // `_row_id` (row identity survives the update) and the NULLIFIED
  // sequence (re-stamped to this commit by the read).
  override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
    if (f.metaFields == 0) writeData(row)
    else writeData(joined(row, metadata))

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (pairW == null)
      pairW = f.pairFactory.newInstance(
        s"${f.delTmp}/del-$suffix", SnapDeltaWriter.PairSchema,
        ctx(f.pairConf.value))
    val path = id.getUTF8String(0).toString
    pairRow.update(0,
      UTF8String.fromString(path.substring(path.lastIndexOf('/') + 1)))
    pairRow.update(1, id.getLong(1))
    pairW.write(pairRow)
  }

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new IllegalStateException(
      "updates arrive split (representUpdateAsDeleteAndInsert)")

  override def commit(): WriterCommitMessage = {
    close()
    SnapDeltaTaskFiles(
      Option(dataW).map(_ => s"ins-$suffix").toSeq,
      Option(pairW).map(_ => s"del-$suffix").toSeq)
  }

  override def abort(): Unit = {
    close()
    Files.deleteIfExists(java.nio.file.Paths.get(f.dataTmp, s"ins-$suffix"))
    Files.deleteIfExists(java.nio.file.Paths.get(f.delTmp, s"del-$suffix"))
  }

  // Idempotent: Spark closes the writer after commit() (which
  // already closed it to flush footers before reporting the files).
  private var closed = false
  override def close(): Unit = if (!closed) {
    closed = true
    if (dataW != null) { dataW.close() }
    if (pairW != null) { pairW.close() }
  }
}

object SnapDeltaWriter {
  /** The position-delete pair schema — identical to
    * [[SnapStore]]'s `(file, pos)` delete parquets.
    */
  val PairSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))
}
