package graft

import org.apache.spark.sql.functions._

/** Evidence for the q39 oracle design (TpcdsCorpus.q39Prefix):
  *
  * 1. The Jan/Feb-2001 inventory burst gives every (warehouse, item)
  *    pair n=4 snapshots in January and n=2 in February; all other
  *    2001 months are singletons (stddev_samp NULL → dropped by the
  *    reference's `cov > 1` in both engines).
  * 2. The cov = stdev/mean values stay far from the filter boundaries
  *    (1.0, 1.5) and from the 6-decimal rounding half-grid, so the
  *    round-to-6 gate transform and the mirror's integer-identity
  *    stddev agree regardless of Spark's partition-order M2
  *    accumulation (double noise ~1e-15 ≪ measured margins).
  */
class Q39Spec extends SparkSpec {

  private lazy val groups = {
    queries.TpcdsCorpus.register(spark, sf)
    spark.sql(
      """SELECT inv_warehouse_sk w, inv_item_sk i, month(d_date) moy,
        |  count(*) n, sum(inv_quantity_on_hand) sx,
        |  sum(inv_quantity_on_hand * inv_quantity_on_hand) sx2
        |FROM tpcds.inventory JOIN tpcds.date_dim ON inv_date_sk = d_date_sk
        |WHERE d_year = 2001
        |GROUP BY 1, 2, 3""".stripMargin).cache()
  }

  test("q39: Jan groups are n=4, Feb n=2, other 2001 months singletons") {
    val byMoy = groups.groupBy("moy").agg(
      min("n").as("mn"), max("n").as("mx")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byMoy(1) === ((4L, 4L)))
    assert(byMoy(2) === ((2L, 2L)))
    byMoy.filter(_._1 > 2).foreach { case (_, (mn, mx)) =>
      assert(mn === 1L && mx === 1L)
    }
  }

  test("q39: cov margins to filter boundaries and round-6 grid are wide") {
    val covs = groups.filter(col("n") > 1 && col("sx") > 0)
      .withColumn("cov",
        sqrt((col("n") * col("sx2") - col("sx") * col("sx")).cast("double") /
          (col("n").cast("double") * (col("n") - 1))) /
          (col("sx").cast("double") / col("n")))
      .select("cov").as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect()
    assert(covs.nonEmpty)
    val g1 = covs.map(c => math.abs(c - 1.0)).min
    val g15 = covs.map(c => math.abs(c - 1.5)).min
    val grid = covs.map(c => math.abs(c * 1e6 % 1 - 0.5)).min * 1e-6
    assert(g1 > 1e-6, s"cov too close to the >1 filter boundary: $g1")
    assert(g15 > 1e-6, s"cov too close to the >1.5 filter boundary: $g15")
    assert(grid > 1e-12, s"cov too close to a round-6 boundary: $grid")
  }
}
