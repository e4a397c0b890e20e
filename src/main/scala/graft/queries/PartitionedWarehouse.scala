package graft.queries

import java.nio.file.{Files, Paths}


import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PARTITIONED warehouse variant: the reference maintains a
  * second Iceberg warehouse laid out with partition transforms,
  * swept by its own runner solely to exercise partition pruning
  * (`partitioned_runner.sh:8,12` — `gcs_prod_partitioned` /
  * `partitioned_warehouse`; `spark-sql.sh:20-25`). Locally the same
  * pair exists: [[Materialize]] writes the FLAT warehouse; this
  * module writes `lineitem`/`orders` hive-partitioned by ship/order
  * YEAR and mounts them through the same
  * `spark.graft.catalog.dir.<db>` mechanism, so
  * `graft.tpch_part.lineitem` resolves through the DSv2 catalog and
  * a year filter prunes whole partition directories before any file
  * is opened — the exact behavior the partitioned warehouse exists
  * to measure. PartitionedSpec pins the pruning; the oracled entry
  * below proves values match the flat path.
  */
object PartitionedWarehouse {

  val db = "tpch_part"

  // Weakly keyed by the session itself (ADVICE r4 — identity hashes
  // collide / get reused); all access is under this object's lock.
  private val lastDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Write (idempotent per fixture on disk, keyed like
    * [[Materialize]] by a `_SUCCESS` marker) and mount the
    * year-partitioned pair for the GraftCatalog. The on-disk tag
    * hashes the FULL fixture path (ADVICE r4), so two fixtures
    * sharing a basename under different roots can never serve each
    * other's data.
    */
  def register(s: SparkSession, dir: String): Unit = synchronized {
    if (lastDir.get(s) != dir) {
      val root = Paths.get(sys.props("java.io.tmpdir"), "graft-part",
        Materialize.pathTag(dir))
      Seq(
        ("lineitem", "l_shipdate", "l_shipyear"),
        ("orders", "o_orderdate", "o_orderyear")).foreach {
        case (t, dateCol, partCol) =>
          val out = root.resolve(t)
          if (!Files.exists(out.resolve("_SUCCESS")))
            Tables.load(s, dir, t)
              .withColumn(partCol, year(to_date(col(dateCol))))
              .write.mode("overwrite")
              .partitionBy(partCol)
              .parquet(out.toString)
      }
      s.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
      if (s.conf.getOption("spark.sql.catalog.graft").isEmpty)
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      lastDir.put(s, dir)
    }
  }

  /** Year-pruned monthly revenue over the partitioned warehouse,
    * resolved through the named catalog: the `l_shipyear = 1997`
    * predicate eliminates every other year's directories at planning
    * time (partition pruning), then the month aggregate runs over
    * the surviving files only.
    */
  def partitionedScan(s: SparkSession, dir: String): DataFrame = {
    register(s, dir)
    s.table(s"graft.$db.lineitem")
      .filter(col("l_shipyear") === 1997)
      .groupBy(month(to_date(col("l_shipdate"))).as("ship_month"))
      .agg(count(lit(1)).as("n"),
        dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
      .orderBy(col("ship_month"))
  }

  val partitionedScanOracle: String =
    s"""SELECT month(CAST(l_shipdate AS DATE)) AS ship_month, COUNT(*) AS n,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
       |FROM lineitem
       |WHERE year(CAST(l_shipdate AS DATE)) = 1997
       |GROUP BY 1
       |ORDER BY ship_month""".stripMargin

  def all: Seq[Q] = Seq(
    Q("tpch_partitioned_scan", partitionedScan, Some(partitionedScanOracle),
      "partitioned-warehouse catalog scan: year partition pruning + month agg"))
}
