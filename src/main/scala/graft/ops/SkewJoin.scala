package graft.ops

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (builder brief: "salting for skew, AQE
  * for runtime re-plan"). Both operators produce results identical to
  * their unsalted equivalents — the DECIMAL(38,6) exact sums in
  * [[graft.Cols]] make the decomposition order-independent — so the
  * DuckDB oracle is simply the plain query, proving the rewrite is
  * semantics-preserving.
  *
  * At 100 TB these are the difference between a stage bounded by its
  * hottest key and one bounded by data/parallelism: AQE's skew-join
  * split handles sort-merge inputs automatically, but aggregation
  * hot-keys and broadcast-infeasible dimension joins still need
  * explicit salt.
  */
object SkewJoin {

  private val Salts = 16

  // ---------------------------------------------------------------
  /** Two-phase salted aggregation: revenue per returnflag (3 hot keys
    * over all of lineitem — maximal key skew). Phase 1 groups on
    * (key, salt) so every task owns 1/16 of a hot key; phase 2
    * combines the 3×16 partials. Same result as the direct GROUP BY.
    */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salts)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("partial_rev"),
        count(lit(1)).as("partial_n"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("partial_rev").cast("decimal(38,6)")).cast("double").as("revenue"),
        sum(col("partial_n")).as("n"))
      .orderBy(col("l_returnflag"))

  val saltedAggOracle: String =
    s"""SELECT l_returnflag,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  /** Salt-replicated join: lineitem (fact, skewed foreign key) joined
    * to part (dimension) on (key, salt) after replicating the
    * dimension across all 16 salts — the pattern for dimensions too
    * big to broadcast whose fact-side keys skew. Aggregated to brand
    * revenue; identical to the plain join.
    */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(s, dir)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salts)))
    val dim = Tables.part(s, dir)
      .withColumn("salt", explode(expr(s"sequence(0, ${Salts - 1})")))
    fact.join(dim, col("l_partkey") === col("p_partkey") && fact("salt") === dim("salt"))
      .groupBy(col("p_brand"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  val saltedJoinOracle: String =
    s"""SELECT p_brand,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("skew_salted_agg", saltedAgg, Some(saltedAggOracle),
      "two-phase salted aggregation == direct GROUP BY"),
    Q("skew_salted_join", saltedJoin, Some(saltedJoinOracle),
      "salt-replicated dimension join == plain join"))
}
