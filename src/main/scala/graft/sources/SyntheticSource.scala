package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** A complete DataSource V2 connector: the `graft-synth` table
  * generates a deterministic synthetic event stream
  * `(id BIGINT, bucket INT, value BIGINT)` with
  * `bucket = id % buckets` and `value = (id * 2654435761 + 7) %
  * 1000000007` — the same DSv2 read path (TableProvider → ScanBuilder
  * → Batch → InputPartition → PartitionReader) an Iceberg/Delta
  * connector implements, exercised end-to-end in this repo since the
  * container carries no Iceberg jars (the reference's catalog scan is
  * DSv2: `spark_submit_with_analytics_core.sh:11-14`).
  *
  * The connector implements REAL pushdown, not just the interfaces:
  * - `SupportsPushDownRequiredColumns`: the reader materializes only
  *   the pruned columns (a `SELECT sum(value)` never builds ids);
  * - `SupportsPushDownFilters`: range predicates on `id` narrow the
  *   generated [lo, hi) interval BEFORE partition planning, so a
  *   `WHERE id < k` scan plans k/rowsPerSlice partitions and
  *   generates k rows, not `rows` rows. Pushed filters are consumed
  *   (returned residual-free) exactly when fully applied.
  *
  * Because the data is a pure formula, DuckDB reproduces the whole
  * table with `range()` — so the DSv2 read path itself sits under the
  * exact oracle gate like every other operator.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("buckets", "16").toInt,
      properties.getOrDefault("keyGrouped", "false").toBoolean,
      properties.getOrDefault("vectorized", "false").toBoolean)

  override def supportsExternalMetadata(): Boolean = false
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("value", LongType, nullable = false)))

  def valueOf(id: Long): Long = (id * 2654435761L + 7L) % 1000000007L
}

final class SyntheticTable(rows: Long, slices: Int, buckets: Int,
    keyGrouped: Boolean = false, vectorized: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices, buckets, keyGrouped, vectorized)
}

final class SyntheticScanBuilder(rows: Long, slices: Int, buckets: Int,
    keyGrouped: Boolean = false, vectorized: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticSource.schema
  private var aggPushed: Option[(Boolean, Seq[String])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Consume id-range filters by narrowing [lo, hi); anything else is
    * left as a residual for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // --- aggregate pushdown -----------------------------------------
  private def fieldOf(e: Expression): Option[String] = e match {
    case r: NamedReference => Some(r.fieldNames.mkString("."))
    case _ => None
  }

  /** COUNT(*) / MIN(id) / MAX(id), optionally grouped by `bucket`,
    * have closed forms over the generated interval — those (and only
    * those) are accepted for COMPLETE pushdown: the scan itself emits
    * the final aggregated rows and no id is ever generated.
    */
  private def accepts(agg: Aggregation): Boolean = {
    val groupOk = agg.groupByExpressions().isEmpty ||
      (agg.groupByExpressions().length == 1 &&
        agg.groupByExpressions().flatMap(fieldOf).sameElements(Array("bucket")))
    val fns = agg.aggregateExpressions()
    fns.nonEmpty && fns.forall {
      case _: CountStar => true
      case m: Min => fieldOf(m.column()).contains("id")
      case m: Max => fieldOf(m.column()).contains("id")
      case _ => false
    } && groupOk
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = accepts(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!accepts(agg)) return false
    aggPushed = Some((agg.groupByExpressions().nonEmpty,
      agg.aggregateExpressions().toSeq.map {
        case _: CountStar => "count"
        case _: Min       => "min_id"
        case _: Max       => "max_id"
        case f: AggregateFunc => f.describe() // unreachable by accepts
      }))
    true
  }

  override def build(): Scan = aggPushed match {
    case Some((grouped, fns)) =>
      new SyntheticAggScan(lo, math.max(lo, hi), buckets, grouped, fns)
    case None =>
      new SyntheticScan(lo, math.max(lo, hi), slices, buckets, required,
        keyGrouped, vectorized)
  }
}

/** Complete-pushdown aggregate scan: one partition, rows computed in
  * closed form (per bucket: first id ≥ lo in the residue class, then
  * an arithmetic progression) — the aggregate of N rows costs O(buckets).
  */
final class SyntheticAggScan(lo: Long, hi: Long, buckets: Int,
    grouped: Boolean, fns: Seq[String]) extends Scan with Batch {

  override def readSchema(): StructType = {
    val aggFields = fns.map {
      case "count" => StructField("count", LongType, nullable = false)
      case "min_id" => StructField("min_id", LongType, nullable = true)
      case "max_id" => StructField("max_id", LongType, nullable = true)
    }
    StructType(
      (if (grouped) Seq(StructField("bucket", IntegerType, nullable = false))
       else Seq.empty) ++ aggFields)
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth-agg [$lo, $hi) grouped=$grouped aggPushed=${fns.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticRange(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val (g, b, l, h, f) = (grouped, buckets, lo, hi, fns)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows: Iterator[InternalRow] = {
            def row(pre: Seq[Any], n: Long, min: Long, max: Long) =
              new GenericInternalRow((pre ++ f.map {
                case "count"  => n
                case "min_id" => if (n == 0) null else min
                case "max_id" => if (n == 0) null else max
              }).toArray[Any])
            if (g) (0 until b).iterator.flatMap { bk =>
              val first = l + (((bk - l % b) + b) % b)
              if (first >= h) None
              else {
                val n = (h - 1 - first) / b + 1
                Some(row(Seq(bk), n, first, first + (n - 1) * b))
              }
            }
            else Iterator.single(row(Seq.empty, math.max(0, h - l), l, h - 1))
          }
          override def next(): Boolean = rows.hasNext
          override def get(): InternalRow = rows.next()
          override def close(): Unit = ()
        }
    }
  }
}

final case class SyntheticRange(from: Long, until: Long) extends InputPartition

/** One whole bucket (ids ≡ bucket mod buckets within [from, until)) —
  * the key-grouped split shape: it can declare its partition key, so
  * Spark's storage-partitioned join machinery can co-locate it with
  * the matching bucket of another table.
  */
final case class SyntheticBucket(bucket: Int, from: Long, until: Long,
    buckets: Int) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

final class SyntheticScan(lo: Long, hi: Long, slices: Int, buckets: Int,
    required: StructType, keyGrouped: Boolean, vectorized: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo, $hi) slices=$slices cols=${required.fieldNames.mkString(",")}" +
      (if (keyGrouped) " keyGrouped" else "") +
      (if (vectorized) " vectorized" else "")

  // --- runtime (dynamic) filtering on the partition key -----------
  // The DSv2 DPP contract: Spark builds the dim side first, then
  // hands the scan an IN predicate over `filterAttributes`; the scan
  // drops whole buckets BEFORE planning input partitions.
  @volatile private var allowedBuckets: Option[Set[Int]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (keyGrouped) Array(Expressions.column("bucket")) else Array.empty

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val onBucket = p.children().head match {
          case r: NamedReference => r.fieldNames.sameElements(Array("bucket"))
          case _ => false
        }
        if (onBucket) {
          val vals = p.children().tail.collect {
            case l: V2Literal[_] => l.value() match {
              case i: java.lang.Integer => i.intValue()
              case l2: java.lang.Long   => l2.intValue()
            }
          }.toSet
          allowedBuckets = Some(allowedBuckets.fold(vals)(_ intersect vals))
          SyntheticScan.recordRuntimeFilter(vals.size)
        }
      }
    }

  /** Storage-partitioned reporting: in key-grouped mode the scan
    * declares `bucket`-identity KeyGroupedPartitioning, so joins and
    * aggregations clustered on `bucket` need no exchange — the DSv2
    * contract Iceberg's storage-partitioned joins ride on.
    */
  override def outputPartitioning(): Partitioning =
    if (keyGrouped) new KeyGroupedPartitioning(
      Array(Expressions.identity("bucket")), buckets)
    else new UnknownPartitioning(planInputPartitions().length)

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    if (keyGrouped)
      return (0 until buckets)
        .filter(b => allowedBuckets.forall(_.contains(b)))
        .map(b => SyntheticBucket(b, lo, hi, buckets)).toArray
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by per).map(s =>
      SyntheticRange(s, math.min(hi, s + per))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(buckets, required.fieldNames, vectorized)

  /** The reference's `custom_scan_time*` surface
    * (`IcebergBenchmark.java:306-309`): its patched Iceberg reader
    * emits scan-time accumulables the harness sums as
    * total_batch_scan_time_ms. This connector emits the same metric
    * through the standard DSv2 CustomMetric API, so
    * [[graft.MetricListener]]'s rollup has a live local producer.
    */
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new ScanTimeMetric)
}

/** Sum-aggregated scan wall time; the name prefix is what the
  * listener's accumulable filter matches on.
  */
final class ScanTimeMetric extends CustomSumMetric {
  override def name(): String = "custom_scan_time_ms"
  override def description(): String = "custom_scan_time_ms"
}

final case class ScanTimeTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "custom_scan_time_ms"
}

object SyntheticScan {
  /** Spec observability: how many runtime-filter values the last
    * dynamic-pruning call delivered (the DPP path is otherwise
    * invisible from the outside).
    */
  @volatile private var lastRuntimeFilterValues: Int = -1
  private[sources] def recordRuntimeFilter(n: Int): Unit =
    lastRuntimeFilterValues = n
  def runtimeFilterValues: Int = lastRuntimeFilterValues
  def resetRuntimeFilter(): Unit = lastRuntimeFilterValues = -1
}

final class SyntheticReaderFactory(buckets: Int, cols: Array[String],
    vectorized: Boolean = false)
    extends PartitionReaderFactory {

  /** Vectorized read path (`vectorized=true`): the scan emits
    * `ColumnarBatch`es of on-heap vectors instead of one
    * `InternalRow` per `next()` — the same columnar DSv2 contract
    * Iceberg's vectorized parquet reader uses (the reference enables
    * it via its Iceberg runtime; `spark_submit_with_analytics_core
    * .sh:11-17`). Spark inserts a codegen'd `ColumnarToRow` above the
    * scan, and per-value virtual calls disappear from the inner loop.
    */
  override def supportColumnarReads(p: InputPartition): Boolean = vectorized

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val (start, until, step) = p match {
      case r: SyntheticRange => (r.from, r.until, 1L)
      case b: SyntheticBucket =>
        (b.from + (((b.bucket - b.from % b.buckets) + b.buckets) % b.buckets),
          b.until, b.buckets.toLong)
    }
    new PartitionReader[ColumnarBatch] {
      private val t0 = System.nanoTime()
      private val capacity = 4096
      private val schema = StructType(cols.map {
        case "id"     => StructField("id", LongType, nullable = false)
        case "bucket" => StructField("bucket", IntegerType, nullable = false)
        case "value"  => StructField("value", LongType, nullable = false)
      })
      private val vectors = OnHeapColumnVector.allocateColumns(capacity, schema)
      private val batch =
        new ColumnarBatch(vectors.asInstanceOf[Array[ColumnVector]])
      private var id = start

      override def next(): Boolean = {
        if (id >= until) return false
        vectors.foreach(_.reset())
        var n = 0
        while (n < capacity && id < until) {
          var i = 0
          while (i < cols.length) {
            cols(i) match {
              case "id"     => vectors(i).putLong(n, id)
              case "bucket" => vectors(i).putInt(n, (id % buckets).toInt)
              case "value"  => vectors(i).putLong(n, SyntheticSource.valueOf(id))
            }
            i += 1
          }
          id += step
          n += 1
        }
        batch.setNumRows(n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
      override def currentMetricsValues(): Array[CustomTaskMetric] =
        Array(ScanTimeTaskMetric((System.nanoTime() - t0) / 1000000L))
    }
  }

  private def rowFor(id: Long): InternalRow = {
    // Only the pruned columns are materialized.
    val vals: Array[Any] = cols.map {
      case "id"     => id
      case "bucket" => (id % buckets).toInt
      case "value"  => SyntheticSource.valueOf(id)
    }
    new GenericInternalRow(vals)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case r: SyntheticRange =>
        new PartitionReader[InternalRow] {
          private val t0 = System.nanoTime()
          private var id = r.from - 1
          override def next(): Boolean = { id += 1; id < r.until }
          override def get(): InternalRow = rowFor(id)
          override def close(): Unit = ()
          override def currentMetricsValues(): Array[CustomTaskMetric] =
            Array(ScanTimeTaskMetric((System.nanoTime() - t0) / 1000000L))
        }
      case b: SyntheticBucket =>
        new PartitionReader[InternalRow] {
          private val t0 = System.nanoTime()
          // First id >= from with id ≡ bucket (mod buckets), then
          // stride by buckets.
          private var id = b.from +
            (((b.bucket - b.from % b.buckets) + b.buckets) % b.buckets) - b.buckets
          override def next(): Boolean = { id += b.buckets; id < b.until }
          override def get(): InternalRow = rowFor(id)
          override def close(): Unit = ()
          override def currentMetricsValues(): Array[CustomTaskMetric] =
            Array(ScanTimeTaskMetric((System.nanoTime() - t0) / 1000000L))
        }
    }
}
