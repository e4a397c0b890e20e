package graft.queries

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H suite, adapted to the fixture star schema (FIXTURES.md §2:
  * no partsupp, reduced columns). Every query preserves the operator
  * shape of its reference counterpart (`/root/reference/queries/tpch/
  * qNN.sql`) on the columns the fixtures carry; substitutions are
  * documented per query.
  *
  * Queries are DataFrame programs (Catalyst plans them; predicate
  * pushdown / column pruning / broadcast selection are automatic).
  * The subquery-heavy shapes whose semantics are defined by SQL
  * (null-aware NOT IN, correlated [NOT] EXISTS — SURVEY.md §7 "hard
  * parts") run as `spark.sql` over registered views, sharing one text
  * with the DuckDB oracle.
  */
object Tpch {

  private def dt(s: String): Column = lit(s).cast("date")

  /** Runs one SQL text in both Spark and DuckDB (dialect-intersection
    * queries only).
    */
  private def shared(name: String, sql: String, doc: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql), doc)

  // ---------------------------------------------------------------
  /** q01 — pricing summary report (`queries/tpch/q01.sql`).
    * Full-scan filter -> hash aggregate (8 aggs) -> sort; reads 7 of
    * 11 lineitem columns (column pruning).
    */
  def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(asDate(col("l_shipdate")) <= dt("1998-09-02"))
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

  // ---------------------------------------------------------------
  /** q02 shape (`queries/tpch/q02.sql:24-38`) — correlated scalar MIN
    * subquery + multi-join. Fixtures lack partsupp, so the correlated
    * minimum is min(s_acctbal) per region instead of min supplycost
    * per part; the plan shape (agg -> equi-join back on the
    * correlation key + value equality) is identical.
    */
  def q02(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
    val minBal = joined
      .groupBy(col("r_regionkey").as("mb_regionkey"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    joined
      .join(broadcast(minBal),
        col("r_regionkey") === col("mb_regionkey") && col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("r_name"))
      .orderBy(col("s_acctbal").desc, col("s_name"))
      .limit(100)
  }

  val q02Oracle: String =
    """SELECT s_acctbal, s_name, n_name, r_name
      |FROM supplier, nation, region
      |WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND s_acctbal = (SELECT MIN(s2.s_acctbal)
      |                   FROM supplier s2, nation n2
      |                   WHERE s2.s_nationkey = n2.n_nationkey
      |                     AND n2.n_regionkey = region.r_regionkey)
      |ORDER BY s_acctbal DESC, s_name
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  /** q03 (`queries/tpch/q03.sql`) — shipping priority: 3-way join,
    * group, top-10 by revenue (shippriority column absent in fixture).
    */
  def q03(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(asDate(col("o_orderdate")) < dt("1998-03-15"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(asDate(col("l_shipdate")) > dt("1998-03-15"))
      .groupBy(col("l_orderkey"), asDate(col("o_orderdate")).as("o_orderdate"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  val q03Oracle: String =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING'
       |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
       |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
       |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
       |ORDER BY revenue DESC, o_orderdate, l_orderkey
       |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  /** q04 (`queries/tpch/q04.sql:9`) — order priority checking: EXISTS
    * semi-join with a non-equi correlated conjunct. Fixture lineitem
    * has no commit/receipt dates, so "late" = shipped >60 days after
    * order date.
    */
  def q04(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(asDate(col("o_orderdate")) >= dt("1996-07-01") &&
        asDate(col("o_orderdate")) < dt("1996-10-01"))
    val li = Tables.lineitem(s, dir)
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          asDate(col("l_shipdate")) > date_add(asDate(col("o_orderdate")), 60),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL '60' DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  /** q05 (`queries/tpch/q05.sql`) — local supplier volume: 6-way star
    * join incl. the c_nationkey = s_nationkey "local" constraint.
    */
  def q05(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(asDate(col("o_orderdate")) >= dt("1996-01-01") &&
        asDate(col("o_orderdate")) < dt("1997-01-01"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  val q05Oracle: String =
    s"""SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------
  /** q06 (`queries/tpch/q06.sql`) — forecasting revenue change: pure
    * scan + global aggregate; every predicate pushes to Parquet.
    */
  def q06(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(asDate(col("l_shipdate")) >= dt("1996-01-01") &&
        asDate(col("l_shipdate")) < dt("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q06Oracle: String =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------
  /** q07 (`queries/tpch/q07.sql`) — volume shipping: double nation
    * join with symmetric pair filter + extract(YEAR).
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("n1_nationkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("n2_nationkey"), col("n_name").as("cust_nation"))
    Tables.supplier(s, dir)
      .join(Tables.lineitem(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("s_nationkey") === col("n1_nationkey"))
      .join(n2, col("c_nationkey") === col("n2_nationkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .filter(asDate(col("l_shipdate")).between(dt("1995-01-01"), dt("1996-12-31")))
      .withColumn("l_year", year(asDate(col("l_shipdate"))))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q07Oracle: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |  AND c_nationkey = n2.n_nationkey
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------
  /** q08 (`queries/tpch/q08.sql`) — national market share:
    * conditional-sum ratio over an 8-way join.
    */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("n1_nationkey"), col("n_regionkey").as("n1_regionkey"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("n2_nationkey"), col("n_name").as("supp_nation"))
    val vol = revenue(col("l_extendedprice"), col("l_discount"))
    Tables.part(s, dir).filter(col("p_type") === "STANDARD")
      .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(asDate(col("o_orderdate")).between(dt("1995-01-01"), dt("1996-12-31")))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(n1, col("c_nationkey") === col("n1_nationkey"))
      .join(Tables.region(s, dir), col("n1_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .join(n2, col("s_nationkey") === col("n2_nationkey"))
      .withColumn("o_year", year(asDate(col("o_orderdate"))))
      .groupBy(col("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_5", vol).otherwise(0.0)) /
        dsum(vol)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q08Oracle: String = {
    val vol = "l_extendedprice * (1.0 - l_discount)"
    s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
       |  ${dsumSql(s"CASE WHEN n2.n_name = 'NATION_5' THEN $vol ELSE 0.0 END")} /
       |  ${dsumSql(vol)} AS mkt_share
       |FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
       |WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
       |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |  AND s_nationkey = n2.n_nationkey
       |  AND r_name = 'AMERICA' AND p_type = 'STANDARD'
       |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q09 (`queries/tpch/q09.sql`) — product type profit: LIKE filter +
    * 5-way join + profit expression (supplycost replaced by
    * p_retailprice * 0.1 — fixtures lack partsupp).
    */
  def q09(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).filter(col("p_name").like("%red%"))
      .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(asDate(col("o_orderdate"))))
      .groupBy(col("n_name"), col("o_year"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)

  val q09Oracle: String =
    s"""SELECT n_name, CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity * 0.1")} AS sum_profit
       |FROM part, lineitem, supplier, orders, nation
       |WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
       |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
       |  AND p_name LIKE '%red%'
       |GROUP BY n_name, o_year
       |ORDER BY n_name, o_year DESC""".stripMargin

  // ---------------------------------------------------------------
  /** q10 (`queries/tpch/q10.sql`) — returned item reporting: 4-way
    * join, wide group key, top-20 by revenue.
    */
  def q10(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(asDate(col("o_orderdate")) >= dt("1997-01-01") &&
        asDate(col("o_orderdate")) < dt("1997-04-01"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10Oracle: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  /** q11 (`queries/tpch/q11.sql`) — important stock: group-agg with
    * HAVING against a global scalar subquery (broadcast cross join of
    * a 1-row aggregate). Value = extendedprice*quantity per part
    * (fixtures lack partsupp supplycost*availqty).
    */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val value = col("l_extendedprice") * col("l_quantity")
    val perPart = li.groupBy(col("l_partkey")).agg(dsum(value).as("part_value"))
    val total = li.agg((dsum(value) * lit(0.0005)).as("threshold"))
    perPart.join(broadcast(total))
      .filter(col("part_value") > col("threshold"))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11Oracle: String =
    s"""SELECT l_partkey, ${dsumSql("l_extendedprice * l_quantity")} AS part_value
       |FROM lineitem
       |GROUP BY l_partkey
       |HAVING ${dsumSql("l_extendedprice * l_quantity")} >
       |  (SELECT ${dsumSql("l_extendedprice * l_quantity")} * 0.0005 FROM lineitem)
       |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------
  /** q12 (`queries/tpch/q12.sql`) — shipping modes / priority classes:
    * join + conditional aggregation (shipmode absent -> returnflag).
    */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag").isin("R", "A") &&
        asDate(col("l_shipdate")) >= dt("1997-01-01") &&
        asDate(col("l_shipdate")) < dt("1998-01-01"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Oracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey AND l_returnflag IN ('R','A')
      |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  /** q13 (`queries/tpch/q13.sql`) — customer distribution: LEFT OUTER
    * JOIN with an ON-side filter, count-per-customer, then a
    * distribution over the counts (group-of-group).
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  /** q14 (`queries/tpch/q14.sql`) — promotion effect: conditional-sum
    * ratio (fixture p_type carries a literal 'PROMO' class).
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val vol = revenue(col("l_extendedprice"), col("l_discount"))
    Tables.lineitem(s, dir)
      .filter(asDate(col("l_shipdate")) >= dt("1997-09-01") &&
        asDate(col("l_shipdate")) < dt("1997-10-01"))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO", vol).otherwise(0.0)) /
        dsum(vol)).as("promo_revenue"))
  }

  val q14Oracle: String = {
    val vol = "l_extendedprice * (1.0 - l_discount)"
    s"""SELECT 100.0 * ${dsumSql(s"CASE WHEN p_type = 'PROMO' THEN $vol ELSE 0.0 END")} /
       |  ${dsumSql(vol)} AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q15 (`queries/tpch/q15.sql`) — top supplier: CTE (revenue view)
    * reused by an uncorrelated scalar MAX subquery, then equi-joined.
    * Exact decimal sums make the double equality deterministic.
    */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(asDate(col("l_shipdate")) >= dt("1997-01-01") &&
        asDate(col("l_shipdate")) < dt("1997-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    Tables.supplier(s, dir)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Oracle: String = {
    val rev0 =
      s"""SELECT l_suppkey AS supplier_no,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
         |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
         |  GROUP BY l_suppkey""".stripMargin
    s"""WITH revenue0 AS ($rev0)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier, revenue0
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
       |ORDER BY s_suppkey""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q16 (`queries/tpch/q16.sql:14`) — parts/supplier relationship:
    * null-aware NOT IN (NOT the same plan as left_anti — Spark plans a
    * NullAwareAntiJoin), distinct-count, multi-key sort. Kept in SQL
    * form; one text runs on both engines.
    */
  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part, lineitem
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#1'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%007%')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------
  /** q17 (`queries/tpch/q17.sql:10-16`) — small-quantity-order
    * revenue: correlated scalar AVG subquery per partkey, expressed as
    * aggregate + broadcast join (what Catalyst decorrelates to).
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perPart = li.groupBy(col("l_partkey").as("agg_partkey"))
      .agg((lit(0.2) * davg(col("l_quantity"))).as("avg_threshold"))
    Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_size") === 5)
      .join(li, col("p_partkey") === col("l_partkey"))
      .join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(col("l_quantity") < col("avg_threshold"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q17Oracle: String =
    s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_size = 5
       |  AND l_quantity < (SELECT 0.2 * (${davgSql("l_quantity")})
       |                    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  // ---------------------------------------------------------------
  /** q18 (`queries/tpch/q18.sql:13-21`) — large volume customers: IN
    * over GROUP BY + HAVING (left-semi join), wide group key, top-100.
    * Quantity sums are integral doubles — exact in any order.
    */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy(col("l_orderkey").as("big_orderkey"))
      .agg(sum(col("l_quantity")).as("tot_qty"))
      .filter(col("tot_qty") > 300.0)
      .select(col("big_orderkey"))
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        asDate(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Oracle: String =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  o_totalprice, SUM(l_quantity) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  /** q19 (`queries/tpch/q19.sql`) — discounted revenue: OR of three
    * AND-bands across the part-lineitem join (Catalyst extracts the
    * common equi-conjunct so this stays a hash join, not NLJ).
    */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val band1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1.0, 11.0)
    val band2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10.0, 20.0)
    val band3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20.0, 30.0)
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .filter(band1 || band2 || band3)
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
  }

  val q19Oracle: String =
    s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND (
       |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1.0 AND 11.0)
       |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10.0 AND 20.0)
       |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20.0 AND 30.0))""".stripMargin

  // ---------------------------------------------------------------
  /** q20 (`queries/tpch/q20.sql:8-14`) — potential part promotion:
    * nested IN-in-IN (semi-join over a semi-joined aggregate). SQL
    * form, one text for both engines.
    */
  val q20Sql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |      AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |    GROUP BY l_suppkey
      |    HAVING SUM(l_quantity) > 50.0)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |ORDER BY s_name""".stripMargin

  // ---------------------------------------------------------------
  /** q21 (`queries/tpch/q21.sql:14-33`) — suppliers who kept orders
    * waiting: correlated EXISTS + NOT EXISTS self-joins on lineitem.
    * "Late" = returnflag 'R' (fixtures lack receipt/commit dates).
    * SQL form, one text for both engines.
    */
  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  /** q22 (`queries/tpch/q22.sql`) — global sales opportunity: substr
    * bucketing (customer key digits replace phone country codes),
    * uncorrelated scalar AVG threshold, NOT EXISTS anti-join. SQL
    * form, one text for both engines.
    */
  val q22Sql: String = {
    val codes = "('1','3','5','7')"
    s"""SELECT cntrycode, COUNT(*) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
       |FROM (SELECT substr(c_name, 17, 1) AS cntrycode, c_acctbal
       |      FROM customer
       |      WHERE substr(c_name, 17, 1) IN $codes
       |        AND c_acctbal > (SELECT ${davgSql("c_acctbal")}
       |                         FROM customer
       |                         WHERE c_acctbal > 0.0
       |                           AND substr(c_name, 17, 1) IN $codes)
       |        AND NOT EXISTS (SELECT 1 FROM orders
       |                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
       |     ) custsale
       |GROUP BY cntrycode
       |ORDER BY cntrycode""".stripMargin
  }

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("tpch_q01", q01, Some(q01Oracle), "pricing summary: filter -> groupBy agg -> sort"),
    Q("tpch_q02", q02, Some(q02Oracle), "correlated MIN subquery as agg + join-back"),
    Q("tpch_q03", q03, Some(q03Oracle), "shipping priority: 3-way join + top-k"),
    Q("tpch_q04", q04, Some(q04Oracle), "EXISTS semi-join w/ non-equi conjunct"),
    Q("tpch_q05", q05, Some(q05Oracle), "local supplier volume: 6-way star join"),
    Q("tpch_q06", q06, Some(q06Oracle), "global aggregate, full predicate pushdown"),
    Q("tpch_q07", q07, Some(q07Oracle), "double nation join, symmetric pair filter"),
    Q("tpch_q08", q08, Some(q08Oracle), "market share: conditional-sum ratio"),
    Q("tpch_q09", q09, Some(q09Oracle), "product profit: LIKE + 5-way join"),
    Q("tpch_q10", q10, Some(q10Oracle), "returned items: wide group key + top-k"),
    Q("tpch_q11", q11, Some(q11Oracle), "HAVING vs global scalar (broadcast cross join)"),
    Q("tpch_q12", q12, Some(q12Oracle), "conditional aggregation buckets"),
    Q("tpch_q13", q13, Some(q13Oracle), "left outer join + count distribution"),
    Q("tpch_q14", q14, Some(q14Oracle), "promo ratio: conditional sum / total"),
    Q("tpch_q15", q15, Some(q15Oracle), "CTE + scalar MAX subquery + join"),
    shared("tpch_q16", q16Sql, "null-aware NOT IN + count(DISTINCT)"),
    Q("tpch_q17", q17, Some(q17Oracle), "correlated scalar AVG per partkey"),
    Q("tpch_q18", q18, Some(q18Oracle), "IN over GROUP BY + HAVING (semi-join)"),
    Q("tpch_q19", q19, Some(q19Oracle), "OR-of-AND predicate bands over join"),
    shared("tpch_q20", q20Sql, "nested IN-in-IN semi-joins"),
    shared("tpch_q21", q21Sql, "EXISTS + NOT EXISTS correlated self-joins"),
    shared("tpch_q22", q22Sql, "substr buckets + scalar AVG + NOT EXISTS"))
}
