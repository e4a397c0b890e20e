package graft.queries

import java.nio.file.Paths

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-layout lever the prompt's
  * scale guidance calls out ("repartition/bucketing for co-located
  * joins") and the warehouse-side analogue of the reference's
  * pre-built Iceberg tables (`IcebergBenchmark.java:153` reads tables
  * whose layout was decided at load time, not per query).
  *
  * `lineitem` and `orders` are written once per fixture with
  * `bucketBy(8, orderkey).sortBy(orderkey)`: both sides hash into the
  * same bucket scheme, so Catalyst plans their join with ZERO
  * Exchange (each task zips bucket i with bucket i) and a per-order
  * aggregate with zero shuffle — at 100 TB this removes the dominant
  * lineitem⋈orders shuffle entirely, the same effect storage-
  * partitioned joins give the DSv2 connector ([[graft.sources
  * .SyntheticSource]]) but through the file-layout path a real
  * warehouse loads. BucketedSpec pins the Exchange-free plans; the
  * driver-visible entries below prove values match the plain-scan
  * oracle.
  */
object Bucketed {

  /** Bucketed tables live in their own database so plain-table
    * queries are untouched.
    */
  val db = "tpch_b"

  private val buckets = 8

  // Weakly keyed by the session ITSELF (not an identity hash, which
  // can collide or be reused after a session is GC'd — ADVICE r4);
  // all access is under this object's lock.
  private val lastDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Write (once per session+fixture) and register the bucketed
    * pair. The in-memory catalog forgets tables across JVMs, so a
    * fresh JVM rewrites them — seconds at local fixtures; a real
    * deployment does this once at load time.
    */
  def register(s: SparkSession, dir: String): Unit = synchronized {
    if (lastDir.get(s) != dir) {
      s.sql(s"CREATE DATABASE IF NOT EXISTS spark_catalog.$db")
      val tag = Paths.get(dir).getFileName.toString
        .replaceAll("[^A-Za-z0-9._-]+", "_")
      val root = Paths.get(sys.props("java.io.tmpdir"), "graft-bucketed", tag)
      Seq(("lineitem", "l_orderkey"), ("orders", "o_orderkey")).foreach {
        case (t, key) =>
          Materialize.resetRelation(s, db, t)
          Tables.load(s, dir, t).write
            .bucketBy(buckets, key).sortBy(key)
            .option("path", root.resolve(t).toString)
            .mode("overwrite")
            .saveAsTable(s"spark_catalog.$db.$t")
      }
      lastDir.put(s, dir)
    }
  }

  /** lineitem⋈orders on the bucket key: co-located join (no
    * Exchange on either side once both scans expose the bucket
    * distribution), revenue per order status.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    register(s, dir)
    s.table(s"spark_catalog.$db.lineitem")
      .join(s.table(s"spark_catalog.$db.orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
      .orderBy(col("o_orderstatus"))
  }

  val bucketedJoinOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
       |FROM lineitem, orders
       |WHERE l_orderkey = o_orderkey
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  /** Per-order aggregate on the bucket key: the hash aggregate
    * consumes the scan's bucket distribution directly — no Exchange
    * before the groupBy. HAVING-style cut keeps the output small.
    */
  def bucketedAgg(s: SparkSession, dir: String): DataFrame = {
    register(s, dir)
    s.table(s"spark_catalog.$db.lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
      .filter(col("n_lines") >= 7 && col("sum_qty") > 250)
      .orderBy(col("l_orderkey"))
  }

  // sum_qty stays double on both sides: quantities are small integral
  // doubles, so the sum is exact (≪ 2^53) and order-independent.
  val bucketedAggOracle: String =
    """SELECT l_orderkey, COUNT(*) AS n_lines,
      |  SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY l_orderkey
      |HAVING COUNT(*) >= 7 AND SUM(l_quantity) > 250
      |ORDER BY l_orderkey""".stripMargin

  def all: Seq[Q] = Seq(
    Q("tpch_bucketed_join", bucketedJoin, Some(bucketedJoinOracle),
      "co-located lineitem⋈orders via bucketBy(8, orderkey) — Exchange-free join"),
    Q("tpch_bucketed_agg", bucketedAgg, Some(bucketedAggOracle),
      "per-order aggregate on the bucket key — shuffle-free groupBy"))
}
