package graft.queries

import graft.{Cols, Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H suite, adapted to the fixture star schema (FIXTURES.md §2:
  * no partsupp, reduced columns). Every query preserves the operator
  * shape of its reference counterpart (`/root/reference/queries/tpch/
  * qNN.sql`) on the columns the fixtures carry; substitutions are
  * documented per query.
  */
object Tpch {

  /** q01 — pricing summary report (`queries/tpch/q01.sql`).
    * Full-scan filter -> hash aggregate (8 aggs) -> sort. The flagship
    * query: exercises scan pruning (only 7 of 11 lineitem columns
    * read), partial aggregation, and deterministic decimal summation.
    */
  def q01(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(asDate(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        dsum(revenue(col("l_extendedprice"), col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def all: Seq[Q] = Seq(
    Q("tpch_q01", q01, Some(q01Oracle),
      "pricing summary: filter -> groupBy agg -> sort"))
}
