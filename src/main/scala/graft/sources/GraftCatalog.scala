package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` plugin: registers as a named catalog
  * (`spark.sql.catalog.<name> = graft.sources.GraftCatalog`) and
  * resolves 3-part names through Spark's catalog-resolution path —
  * the exact mechanism the reference mounts Iceberg with
  * (`spark.sql.catalog.$CATALOG_NAME = org.apache.iceberg.spark
  * .SparkCatalog`, `spark_submit_with_analytics_core.sh:11-14`) and
  * then drives via `USE catalog.db` (`IcebergBenchmark.java:153`).
  * No Iceberg jars exist in this container, so the catalog serves
  * the [[SyntheticSource]] tables: namespace `synth`, table
  * `rows_<N>` → an N-row deterministic table. `USE`, 3-part SELECTs,
  * SHOW TABLES, and the scan-level pushdown all flow through the
  * same DSv2 entry points an Iceberg catalog implements.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val ns = Array("synth")
  private val defaultTables = Seq("rows_1000", "rows_100000")
  private val TableName = "rows_([0-9]+)".r

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNs(namespace)
    defaultTables.map(t => Identifier.of(ns, t)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    requireNs(ident.namespace())
    ident.name() match {
      case TableName(n) => new SyntheticTable(n.toLong, slices = 4, buckets = 16)
      case _ => throw new NoSuchTableException(ident)
    }
  }

  private def requireNs(namespace: Array[String]): Unit =
    if (!namespace.sameElements(ns))
      throw new NoSuchNamespaceException(namespace)

  // Read-only catalog: DDL is rejected like any immutable warehouse.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def listNamespaces(): Array[Array[String]] = Array(ns)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(ns) else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(ns)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    requireNs(namespace); new util.HashMap[String, String]()
  }
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
