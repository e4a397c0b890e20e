package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DSv2 WRITE path, end to end: a validating sink that runs the
  * full two-phase distributed commit protocol — per-task
  * [[ChecksumWriter]]s accumulate a count and an order-independent
  * checksum of the first column, task `commit()` ships a
  * [[ChecksumMessage]] to the driver, and job-level `commit()` folds
  * the task messages into a published [[ChecksumSink.Result]] (task
  * `abort()` discards). This is the same
  * WriteBuilder → BatchWrite → DataWriterFactory → DataWriter →
  * commit-message machinery every real DSv2 sink (Iceberg, Delta)
  * implements; the reference exercises it through `noop`
  * (`IcebergBenchmark.java:183`) — this sink additionally PROVES the
  * rows that arrived, which makes it a verification device: writes
  * can be asserted without reading anything back.
  *
  * Results publish into a driver-side registry keyed by the `runId`
  * option (the pattern a real sink uses for its commit coordinator
  * state). Speculative/retried tasks are safe: only task-commit
  * messages reach the job commit, and Spark guarantees exactly one
  * commit per task.
  */
class ChecksumSink extends TableProvider {
  // The sink accepts whatever schema the query writes.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChecksumTable(schema, properties.getOrDefault("runId", "default"))
}

object ChecksumSink {
  final case class Result(rows: Long, checksum: Long, tasks: Int)
  private val results = new ConcurrentHashMap[String, Result]()
  def resultFor(runId: String): Option[Result] = Option(results.get(runId))
  private[sources] def publish(runId: String, r: Result): Unit =
    results.put(runId, r)

  private[sources] val P = 1000000007L
  /** Order-independent per-row contribution (rows arrive in any
    * partition order): an affine hash of the first column's long
    * value, summed mod P.
    */
  def contribution(v: Long): Long = (((v % P) * 31 + 7) % P + P) % P
}

final class ChecksumTable(writeSchema: StructType, runId: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_checksum($runId)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChecksumBatchWrite(runId)
      }
    }
}

final case class ChecksumMessage(rows: Long, checksum: Long)
    extends WriterCommitMessage

final class ChecksumBatchWrite(runId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[ChecksumMessage])
    ChecksumSink.publish(runId, ChecksumSink.Result(
      ms.map(_.rows).sum,
      ms.map(_.checksum).foldLeft(0L)((a, c) => (a + c) % ChecksumSink.P),
      ms.length))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class ChecksumWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        sum = (sum + ChecksumSink.contribution(record.getLong(0))) % 1000000007L
      }
      override def commit(): WriterCommitMessage = ChecksumMessage(rows, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
