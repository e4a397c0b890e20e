package graft.sources

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate face of the [[SyntheticSource]] DSv2 connector: an aggregate
  * over the generated table with a pushed id-range filter. The DuckDB
  * oracle rebuilds the identical table from `range()` — hash equality
  * covers the connector's partition planning, pushdown narrowing,
  * column handling, and row generation end to end.
  */
object SyntheticQueries {

  def synthAgg(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.SyntheticSource")
      .option("rows", "100000").option("slices", "8").option("buckets", "16")
      .load()
      .filter(col("id") >= 1000 && col("id") < 51000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("bucket"))

  val synthAggOracle: String =
    """SELECT CAST(id % 16 AS INTEGER) AS bucket, COUNT(*) AS n,
      |  CAST(SUM((id * 2654435761 + 7) % 1000000007) AS BIGINT) AS value_sum,
      |  MIN(id) AS min_id, MAX(id) AS max_id
      |FROM range(0, 100000) t(id)
      |WHERE id >= 1000 AND id < 51000
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** The same connector through its VECTORIZED read path
    * (`vectorized=true` → `ColumnarBatch`es + codegen'd
    * ColumnarToRow): residual modulo filter above the scan, keyed
    * aggregate below the sort. Hash equality against the row-path
    * oracle proves the columnar batches carry identical values.
    */
  def synthVectorized(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.SyntheticSource")
      .option("rows", "200000").option("slices", "8").option("buckets", "16")
      .option("vectorized", "true")
      .load()
      .filter(col("id") % 7 === 3)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"),
        max(col("id")).as("max_id"))
      .orderBy(col("bucket"))

  val synthVectorizedOracle: String =
    """SELECT CAST(id % 16 AS INTEGER) AS bucket, COUNT(*) AS n,
      |  CAST(SUM((id * 2654435761 + 7) % 1000000007) AS BIGINT) AS value_sum,
      |  MAX(id) AS max_id
      |FROM range(0, 200000) t(id)
      |WHERE id % 7 = 3
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** Time travel through the catalog: one aggregate per quarterly
    * snapshot (`VERSION AS OF 'v'` → the first rows·v/4 ids), the
    * Iceberg snapshot-read surface on [[GraftCatalog]]. The oracle
    * reproduces each snapshot's prefix with `range()`.
    */
  def synthTimeTravel(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_tt", "graft.sources.GraftCatalog")
    (1 to 4).map(v =>
      s.sql(s"""SELECT $v AS snapshot, count(*) AS n,
                |  sum(value) AS value_sum, max(id) AS max_id
                |FROM graft_tt.synth.rows_100000 VERSION AS OF '$v'""".stripMargin))
      .reduce(_ unionAll _)
      .orderBy(col("snapshot"))
  }

  val synthTimeTravelOracle: String =
    (1 to 4).map(v =>
      s"""SELECT $v AS snapshot, COUNT(*) AS n,
         |  CAST(SUM((id * 2654435761 + 7) % 1000000007) AS BIGINT) AS value_sum,
         |  MAX(id) AS max_id
         |FROM range(0, ${100000L * v / 4}) t(id)""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY snapshot")

  def all: Seq[Q] = Seq(
    Q("dsv2_synth_agg", synthAgg, Some(synthAggOracle),
      "custom DSv2 connector scan: pushdown-narrowed range aggregate"),
    Q("dsv2_synth_vectorized", synthVectorized, Some(synthVectorizedOracle),
      "DSv2 vectorized read path: ColumnarBatch scan + ColumnarToRow"),
    Q("dsv2_synth_time_travel", synthTimeTravel, Some(synthTimeTravelOracle),
      "VERSION AS OF snapshot reads through the DSv2 catalog"))
}
