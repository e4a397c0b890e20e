package graft.queries

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS operator shapes (SURVEY.md §7 step 4) ported onto the
  * fixture star schema (the local testdata carries no TPC-DS tables —
  * FIXTURES.md §3). Each query preserves the *operator shape* of its
  * reference counterpart (`/root/reference/queries/tpcds/qNN.sql`):
  * the same plan skeleton — rollup + GROUPING() feeding a window
  * partition key, running-total ROWS frames over a FULL JOIN,
  * rn±1 self-joins emulating lag/lead, INTERSECT/EXCEPT customer
  * sets, channel UNION ALLs, cross-joined scalar aggregates — on the
  * tables the fixtures have.
  *
  * Determinism contract: every double aggregate goes through the
  * DECIMAL(38,6) pattern in [[graft.Cols]] (including *window*
  * aggregates via dsumOver/davgOver) so results hash-match DuckDB.
  */
object TpcdsShapes {

  private def dt(s: String): Column = lit(s).cast("date")

  private def shared(name: String, sql: String, doc: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql), doc)

  // ---------------------------------------------------------------
  /** q36/q70/q86 shape (`queries/tpcds/q36.sql:5-6,25`): ROLLUP with
    * GROUPING() summed into `lochierarchy`, which then feeds a window
    * partition key together with a CASE over GROUPING() — the
    * "rank within parent" idiom. SURVEY.md §7 lists this as a hard
    * part: aggregate first (rollup + grouping cols materialized),
    * then window over the rolled-up frame.
    */
  def rollupGrouping(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        dsum(col("o_totalprice")).as("total_sales"),
        (grouping(col("r_name")) + grouping(col("n_name"))).cast("long").as("lochierarchy"),
        grouping(col("n_name")).cast("long").as("g_n"))
    val w = Window
      .partitionBy(col("lochierarchy"), when(col("g_n") === 0, col("r_name")))
      .orderBy(col("total_sales").desc)
    agg
      .withColumn("rank_within_parent", rank().over(w).cast("long"))
      .select(col("r_name"), col("n_name"), col("total_sales"),
        col("lochierarchy"), col("rank_within_parent"))
      .orderBy(col("lochierarchy").desc,
        when(col("lochierarchy") === 2, lit(null)).otherwise(col("r_name")),
        col("rank_within_parent"))
  }

  val rollupGroupingOracle: String =
    s"""WITH agg AS (
       |  SELECT r_name, n_name,
       |    ${dsumSql("o_totalprice")} AS total_sales,
       |    CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy,
       |    CAST(GROUPING(n_name) AS BIGINT) AS g_n
       |  FROM orders, customer, nation, region
       |  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
       |    AND n_regionkey = r_regionkey
       |  GROUP BY ROLLUP(r_name, n_name))
       |SELECT r_name, n_name, total_sales, lochierarchy,
       |  CAST(RANK() OVER (
       |    PARTITION BY lochierarchy, CASE WHEN g_n = 0 THEN r_name END
       |    ORDER BY total_sales DESC) AS BIGINT) AS rank_within_parent
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------
  /** q51 shape (`queries/tpcds/q51.sql:6,19,36-37,47`): per-channel
    * cumulative revenue (`ROWS BETWEEN UNBOUNDED PRECEDING AND
    * CURRENT ROW`), FULL JOIN of the two channels on the time key,
    * running `max` to carry values across the join's null gaps, then
    * a crossover filter. Channels = returnflag N vs R lineitems.
    */
  def runningTotalFullJoin(s: SparkSession, dir: String): DataFrame = {
    def chan(flag: String): DataFrame = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === flag)
      .groupBy(trunc(asDate(col("l_shipdate")), "month").as("month"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
    val wCum = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = chan("N")
      .select(col("month").as("n_month"), dsumOver(col("rev"), wCum).as("n_cum"))
    val r = chan("R")
      .select(col("month").as("r_month"), dsumOver(col("rev"), wCum).as("r_cum"))
    val wRun = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n.join(r, col("n_month") === col("r_month"), "full")
      .select(coalesce(col("n_month"), col("r_month")).as("month"),
        col("n_cum"), col("r_cum"))
      .withColumn("n_run", max(col("n_cum")).over(wRun))
      .withColumn("r_run", max(col("r_cum")).over(wRun))
      .filter(col("r_run") > col("n_run"))
      .select(col("month"), col("n_run"), col("r_run"))
      .orderBy(col("month"))
  }

  val runningTotalFullJoinOracle: String = {
    def chan(flag: String) =
      s"""SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
         |  FROM lineitem WHERE l_returnflag = '$flag'
         |  GROUP BY date_trunc('month', CAST(l_shipdate AS DATE))""".stripMargin
    s"""WITH n_chan AS (${chan("N")}),
       |r_chan AS (${chan("R")}),
       |n_cum AS (SELECT month AS n_month,
       |  CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER (ORDER BY month
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS n_cum
       |  FROM n_chan),
       |r_cum AS (SELECT month AS r_month,
       |  CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER (ORDER BY month
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS r_cum
       |  FROM r_chan),
       |joined AS (
       |  SELECT COALESCE(n_month, r_month) AS month, n_cum, r_cum
       |  FROM n_cum FULL JOIN r_cum ON n_month = r_month),
       |run AS (
       |  SELECT month,
       |    MAX(n_cum) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_run,
       |    MAX(r_cum) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r_run
       |  FROM joined)
       |SELECT month, n_run, r_run FROM run WHERE r_run > n_run
       |ORDER BY month""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q12/q20/q98 shape (`queries/tpcds/q98.sql:8`): ratio-to-class —
    * `sum(x) * 100 / sum(sum(x)) OVER (PARTITION BY class)` on the
    * aggregated frame.
    */
  def ratioToClass(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_brand"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("itemrevenue"))
    val w = Window.partitionBy(col("p_type"))
    agg
      .withColumn("revenueratio",
        col("itemrevenue") * lit(100.0) / dsumOver(col("itemrevenue"), w))
      .orderBy(col("p_type"), col("p_brand"))
  }

  val ratioToClassOracle: String =
    s"""WITH agg AS (
       |  SELECT p_type, p_brand,
       |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS itemrevenue
       |  FROM lineitem, part WHERE l_partkey = p_partkey
       |  GROUP BY p_type, p_brand)
       |SELECT p_type, p_brand, itemrevenue,
       |  itemrevenue * 100.0 / CAST(SUM(CAST(itemrevenue AS DECIMAL(38,6)))
       |    OVER (PARTITION BY p_type) AS DOUBLE) AS revenueratio
       |FROM agg
       |ORDER BY p_type, p_brand""".stripMargin

  // ---------------------------------------------------------------
  /** q47/q57 shape (`queries/tpcds/q47.sql:11-12,41-53`): monthly
    * sales per nation with `avg(sum(...)) OVER (PARTITION BY nation,
    * year)` (window over aggregate-of-aggregate), row_number giving a
    * dense sequence, and lag/lead *emulated via rn±1 self-joins* —
    * the corpus never uses lag()/lead() (SURVEY.md §2.5), so neither
    * do we.
    */
  def lagLeadSelfJoin(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), trunc(asDate(col("l_shipdate")), "month").as("month"))
      .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("sum_sales"))
    val wSeq = Window.partitionBy(col("n_name")).orderBy(col("month"))
    val wYear = Window.partitionBy(col("n_name"), year(col("month")))
    // v1 is referenced 3× (self, lag, lead) — cache the small
    // aggregated frame rather than recomputing the base join per ref.
    val v1 = base
      .withColumn("rn", row_number().over(wSeq).cast("long"))
      .withColumn("avg_monthly", davgOver(col("sum_sales"), wYear))
      .cache()
    val prev = v1.select(col("n_name").as("p_name"), col("rn").as("p_rn"),
      col("sum_sales").as("psum"))
    val next = v1.select(col("n_name").as("x_name"), col("rn").as("x_rn"),
      col("sum_sales").as("nsum"))
    v1.filter(year(col("month")) === 1997)
      .join(prev, col("p_name") === col("n_name") && col("p_rn") === col("rn") - 1)
      .join(next, col("x_name") === col("n_name") && col("x_rn") === col("rn") + 1)
      .filter(col("avg_monthly") > 0.0 &&
        abs(col("sum_sales") - col("avg_monthly")) / col("avg_monthly") > lit(0.05))
      .select(col("n_name"), col("month"), col("sum_sales"),
        col("avg_monthly"), col("psum"), col("nsum"))
      .orderBy(col("n_name"), col("month"))
  }

  val lagLeadSelfJoinOracle: String =
    s"""WITH base AS (
       |  SELECT n_name, date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
       |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_sales
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  GROUP BY n_name, date_trunc('month', CAST(l_shipdate AS DATE))),
       |v1 AS (
       |  SELECT n_name, month, sum_sales,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY month) AS BIGINT) AS rn,
       |    CAST(SUM(CAST(sum_sales AS DECIMAL(38,6)))
       |        OVER (PARTITION BY n_name, year(month)) AS DOUBLE)
       |      / COUNT(*) OVER (PARTITION BY n_name, year(month)) AS avg_monthly
       |  FROM base)
       |SELECT v1.n_name, v1.month, v1.sum_sales, v1.avg_monthly,
       |  p.sum_sales AS psum, x.sum_sales AS nsum
       |FROM v1, v1 p, v1 x
       |WHERE year(v1.month) = 1997
       |  AND p.n_name = v1.n_name AND p.rn = v1.rn - 1
       |  AND x.n_name = v1.n_name AND x.rn = v1.rn + 1
       |  AND v1.avg_monthly > 0.0
       |  AND abs(v1.sum_sales - v1.avg_monthly) / v1.avg_monthly > 0.05
       |ORDER BY v1.n_name, v1.month""".stripMargin

  // ---------------------------------------------------------------
  /** q38 shape (`queries/tpcds/q38.sql:15,26`): INTERSECT of customer
    * identity sets from two periods, counted.
    */
  def intersectCustomers(s: SparkSession, dir: String): DataFrame = {
    def active(from: String, to: String): DataFrame =
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(asDate(col("o_orderdate")) >= dt(from) &&
          asDate(col("o_orderdate")) < dt(to))
        .select(col("c_custkey"), col("c_name"))
    active("1996-01-01", "1996-07-01")
      .intersect(active("1997-01-01", "1997-07-01"))
      .agg(count(lit(1)).as("num_customers"))
  }

  val intersectCustomersOracle: String =
    """SELECT COUNT(*) AS num_customers FROM (
      |  SELECT c_custkey, c_name FROM customer, orders
      |  WHERE c_custkey = o_custkey
      |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      |  INTERSECT
      |  SELECT c_custkey, c_name FROM customer, orders
      |  WHERE c_custkey = o_custkey
      |    AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1997-07-01') hot""".stripMargin

  // ---------------------------------------------------------------
  /** q87 shape (`queries/tpcds/q87.sql:16,28`): EXCEPT over the same
    * customer sets (distinct-set difference), counted.
    */
  def exceptCustomers(s: SparkSession, dir: String): DataFrame = {
    def active(from: String, to: String): DataFrame =
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(asDate(col("o_orderdate")) >= dt(from) &&
          asDate(col("o_orderdate")) < dt(to))
        .select(col("c_custkey"), col("c_name"))
    active("1996-01-01", "1996-07-01")
      .except(active("1997-01-01", "1997-07-01"))
      .agg(count(lit(1)).as("num_lost"))
  }

  val exceptCustomersOracle: String =
    """SELECT COUNT(*) AS num_lost FROM (
      |  SELECT c_custkey, c_name FROM customer, orders
      |  WHERE c_custkey = o_custkey
      |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      |  EXCEPT
      |  SELECT c_custkey, c_name FROM customer, orders
      |  WHERE c_custkey = o_custkey
      |    AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1997-07-01') lost""".stripMargin

  // ---------------------------------------------------------------
  /** q76/q05 shape (`queries/tpcds/q76.sql`): UNION ALL of
    * heterogeneous channels padded with literal columns, then one
    * aggregation over the union. Includes a NOT LIKE filter
    * (`queries/tpch/q13.sql:14` idiom).
    */
  def unionChannels(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(!col("o_orderpriority").like("%LOW%"))
      .select(lit("orders").as("channel"), col("o_orderpriority").as("seg"),
        year(asDate(col("o_orderdate"))).as("yr"), col("o_totalprice").as("amt"))
    val l = Tables.lineitem(s, dir)
      .select(lit("lineitem").as("channel"), col("l_returnflag").as("seg"),
        year(asDate(col("l_shipdate"))).as("yr"),
        revenue(col("l_extendedprice"), col("l_discount")).as("amt"))
    o.unionAll(l)
      .groupBy(col("channel"), col("seg"), col("yr"))
      .agg(count(lit(1)).as("cnt"), dsum(col("amt")).as("total"))
      .orderBy(col("channel"), col("seg"), col("yr"))
  }

  val unionChannelsOracle: String =
    s"""SELECT channel, seg, yr, COUNT(*) AS cnt, ${dsumSql("amt")} AS total
       |FROM (
       |  SELECT 'orders' AS channel, o_orderpriority AS seg,
       |    CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
       |    o_totalprice AS amt
       |  FROM orders WHERE o_orderpriority NOT LIKE '%LOW%'
       |  UNION ALL
       |  SELECT 'lineitem' AS channel, l_returnflag AS seg,
       |    CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS yr,
       |    l_extendedprice * (1.0 - l_discount) AS amt
       |  FROM lineitem) channels
       |GROUP BY channel, seg, yr
       |ORDER BY channel, seg, yr""".stripMargin

  // ---------------------------------------------------------------
  /** q75 shape (`queries/tpcds/q75.sql:28,43`): UNION (distinct) of
    * two key sets, joined back to a dimension and counted per brand.
    * Spark's `union` is bag semantics, so `.distinct()` supplies the
    * SQL UNION.
    */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    def keys(flag: String): DataFrame = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === flag)
      .select(col("l_partkey"), col("l_suppkey"))
    keys("R").union(keys("A")).distinct()
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy(col("p_brand"))
  }

  val unionDistinctOracle: String =
    """SELECT p_brand, COUNT(*) AS pairs
      |FROM (
      |  SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      |  UNION
      |  SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A') pairs
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------
  /** q62/q50/q99 shape (`queries/tpcds/q62.sql:5-12`): day-bucket
    * latency histogram via conditional sums over a date difference.
    */
  def dayBuckets(s: SparkSession, dir: String): DataFrame = {
    val lag = datediff(asDate(col("l_shipdate")), asDate(col("o_orderdate")))
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .withColumn("lag_days", lag)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("lag_days") <= 30, 1L).otherwise(0L)).as("d30"),
        sum(when(col("lag_days") > 30 && col("lag_days") <= 60, 1L).otherwise(0L)).as("d60"),
        sum(when(col("lag_days") > 60 && col("lag_days") <= 90, 1L).otherwise(0L)).as("d90"),
        sum(when(col("lag_days") > 90, 1L).otherwise(0L)).as("dmore"))
      .orderBy(col("o_orderpriority"))
  }

  val dayBucketsOracle: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |  CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      |  CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      |  CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
      |FROM (SELECT o_orderpriority,
      |        date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days
      |      FROM orders, lineitem WHERE o_orderkey = l_orderkey) lagged
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  /** q88 shape (`queries/tpcds/q88.sql:1-162`): eight single-row
    * scalar aggregates cross-joined into one row (Catalyst turns each
    * into a 1-row broadcast; no shuffle beyond the partial aggs).
    */
  def crossJoinScalars(s: SparkSession, dir: String): DataFrame = {
    def bucket(i: Int, lo: Double, hi: Double): DataFrame =
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > lo && col("l_quantity") <= hi)
        .agg(count(lit(1)).as(s"h$i"))
    (1 to 8).map(i => bucket(i, (i - 1) * 6.0, i * 6.0))
      .reduce((a, b) => a.crossJoin(b))
  }

  val crossJoinScalarsOracle: String = {
    val subs = (1 to 8).map { i =>
      val lo = (i - 1) * 6.0
      val hi = i * 6.0
      s"(SELECT COUNT(*) AS h$i FROM lineitem WHERE l_quantity > $lo AND l_quantity <= $hi) t$i"
    }
    s"SELECT * FROM ${subs.mkString(", ")}"
  }

  // ---------------------------------------------------------------
  /** q74/q11/q04 shape (`queries/tpcds/q74.sql`): `year_total` CTE
    * computed once over a channel UNION ALL, then referenced four
    * times (first/second year × two channels) with a growth-ratio
    * comparison. The DataFrame `yearTotal` val is naturally shared;
    * Catalyst's ReuseExchange dedups the scan.
    */
  def yearOverYear(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"), lit("o").as("chan"),
      year(asDate(col("o_orderdate"))).as("yr"), col("o_totalprice").as("amt"))
    val l = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), lit("l").as("chan"),
        year(asDate(col("l_shipdate"))).as("yr"),
        revenue(col("l_extendedprice"), col("l_discount")).as("amt"))
    // Referenced 4×; without caching, Spark pushes each slice's
    // chan/yr filter below the aggregate and recomputes the full
    // union+join per slice (no ReuseExchange — the subplans differ).
    // The aggregated frame is tiny (customers × channels × years), so
    // cache it — SURVEY.md §2.9's multi-reference-CTE guidance.
    // Every slice reads ONLY 1996/1997, so the year filter belongs
    // BELOW the cached aggregate — `queries/tpcds/q74.sql:16,31` puts
    // `d_year IN (…)` inside the year_total CTE for the same reason;
    // at 100 TB this is the difference between aggregating two years
    // and aggregating the whole fact history (VERDICT r15 #2).
    val yearTotal = o.unionAll(l)
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("custkey"), col("chan"), col("yr"))
      .agg(dsum(col("amt")).as("year_total"))
      .cache()
    def slice(chan: String, yr: Int, k: String, v: String): DataFrame =
      yearTotal.filter(col("chan") === chan && col("yr") === yr)
        .select(col("custkey").as(k), col("year_total").as(v))
    val of = slice("o", 1996, "of_key", "o_first").filter(col("o_first") > 0.0)
    val os = slice("o", 1997, "os_key", "o_sec")
    val lf = slice("l", 1996, "lf_key", "l_first").filter(col("l_first") > 0.0)
    val ls = slice("l", 1997, "ls_key", "l_sec")
    of.join(os, col("of_key") === col("os_key"))
      .join(lf, col("of_key") === col("lf_key"))
      .join(ls, col("of_key") === col("ls_key"))
      .filter(col("l_sec") / col("l_first") > col("o_sec") / col("o_first"))
      .join(Tables.customer(s, dir), col("of_key") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        round(col("l_sec") / col("l_first"), 6).as("l_growth"),
        round(col("o_sec") / col("o_first"), 6).as("o_growth"))
      .orderBy(col("c_custkey"))
  }

  val yearOverYearOracle: String =
    s"""WITH year_total AS (
       |  SELECT custkey, chan, yr, ${dsumSql("amt")} AS year_total
       |  FROM (
       |    SELECT o_custkey AS custkey, 'o' AS chan,
       |      CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
       |      o_totalprice AS amt
       |    FROM orders
       |    UNION ALL
       |    SELECT o_custkey, 'l',
       |      CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER),
       |      l_extendedprice * (1.0 - l_discount)
       |    FROM lineitem, orders WHERE l_orderkey = o_orderkey) channels
       |  WHERE yr IN (1996, 1997)
       |  GROUP BY custkey, chan, yr)
       |SELECT c_custkey, c_name,
       |  round(ls.year_total / lf.year_total, 6) AS l_growth,
       |  round(os.year_total / of.year_total, 6) AS o_growth
       |FROM year_total of, year_total os, year_total lf, year_total ls, customer
       |WHERE of.chan = 'o' AND of.yr = 1996 AND of.year_total > 0.0
       |  AND os.chan = 'o' AND os.yr = 1997
       |  AND lf.chan = 'l' AND lf.yr = 1996 AND lf.year_total > 0.0
       |  AND ls.chan = 'l' AND ls.yr = 1997
       |  AND os.custkey = of.custkey AND lf.custkey = of.custkey
       |  AND ls.custkey = of.custkey
       |  AND ls.year_total / lf.year_total > os.year_total / of.year_total
       |  AND c_custkey = of.custkey
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  /** q17/q39 shape (`queries/tpcds/q17.sql:7-16`, `q39_1.sql:18`):
    * stddev_samp + coefficient of variation per group. Computed in
    * the algebraically expanded form sqrt((Σx² − (Σx)²/n)/(n−1)) over
    * *exact* decimal sums, because distributed Welford merge order
    * differs between Spark partials and DuckDB's sequential scan —
    * the expanded form is one deterministic IEEE expression on both
    * engines. (StddevSpec asserts it agrees with stddev_samp.)
    */
  def stddevCov(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sx"),
        dsum(col("l_quantity") * col("l_quantity")).as("sxx"))
      .filter(col("n") > 1)
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("stdev",
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
      .withColumn("cov", col("stdev") / col("mean"))
      .filter(col("cov") > 0.4)
      .select(col("p_brand"), col("n"), col("mean"), col("stdev"), col("cov"))
      .orderBy(col("p_brand"))

  val stddevCovOracle: String =
    s"""WITH g AS (
       |  SELECT p_brand, COUNT(*) AS n,
       |    ${dsumSql("l_quantity")} AS sx,
       |    ${dsumSql("l_quantity * l_quantity")} AS sxx
       |  FROM lineitem, part WHERE l_partkey = p_partkey
       |  GROUP BY p_brand HAVING COUNT(*) > 1)
       |SELECT p_brand, n, mean, stdev, stdev / mean AS cov
       |FROM (SELECT p_brand, n, sx / n AS mean,
       |        sqrt((sxx - sx * sx / n) / (n - 1)) AS stdev
       |      FROM g) stats
       |WHERE stdev / mean > 0.4
       |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------
  /** q28 shape (`queries/tpcds/q28.sql`): count(DISTINCT) mixed with
    * plain aggregates in one GROUP BY (Expand-based distinct-agg
    * rewrite), over CASE-derived quantity buckets.
    */
  def countDistinctMixed(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("bucket",
        when(col("l_quantity") <= 10, "b1")
          .when(col("l_quantity") <= 20, "b2")
          .when(col("l_quantity") <= 30, "b3")
          .when(col("l_quantity") <= 40, "b4")
          .otherwise("b5"))
      .groupBy(col("bucket"))
      .agg(
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("cnt"),
        countDistinct(col("l_partkey")).as("cd_part"),
        countDistinct(col("l_suppkey")).as("cd_supp"))
      .orderBy(col("bucket"))

  val countDistinctMixedOracle: String =
    s"""SELECT bucket, ${davgSql("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS cnt,
       |  COUNT(DISTINCT l_partkey) AS cd_part,
       |  COUNT(DISTINCT l_suppkey) AS cd_supp
       |FROM (SELECT *, CASE WHEN l_quantity <= 10 THEN 'b1'
       |                     WHEN l_quantity <= 20 THEN 'b2'
       |                     WHEN l_quantity <= 30 THEN 'b3'
       |                     WHEN l_quantity <= 40 THEN 'b4'
       |                     ELSE 'b5' END AS bucket
       |      FROM lineitem) bucketed
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  /** q58 shape (`queries/tpcds/q58.sql:86-91`): theta join — two
    * per-key revenue aggregates joined on the equi key *plus*
    * mutual ±10% BETWEEN bands. The equi conjunct keeps this a hash
    * join (no nested-loop).
    */
  def thetaBandJoin(s: SparkSession, dir: String): DataFrame = {
    def revRange(from: String, to: String, kc: String, vc: String): DataFrame =
      Tables.lineitem(s, dir)
        .filter(asDate(col("l_shipdate")) >= dt(from) &&
          asDate(col("l_shipdate")) < dt(to))
        .groupBy(col("l_partkey").as(kc))
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as(vc))
    val a = revRange("1996-01-01", "1997-01-01", "a_key", "a_rev")
    val b = revRange("1997-01-01", "1998-01-01", "b_key", "b_rev")
    a.join(b, col("a_key") === col("b_key") &&
        col("a_rev").between(lit(0.9) * col("b_rev"), lit(1.1) * col("b_rev")))
      .select(col("a_key").as("l_partkey"), col("a_rev"), col("b_rev"),
        (col("a_rev") / col("b_rev")).as("ratio"))
      .orderBy(col("l_partkey"))
  }

  val thetaBandJoinOracle: String = {
    def cte(from: String, to: String) =
      s"""SELECT l_partkey, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
         |  FROM lineitem
         |  WHERE CAST(l_shipdate AS DATE) >= DATE '$from'
         |    AND CAST(l_shipdate AS DATE) < DATE '$to'
         |  GROUP BY l_partkey""".stripMargin
    s"""WITH a AS (${cte("1996-01-01", "1997-01-01")}),
       |b AS (${cte("1997-01-01", "1998-01-01")})
       |SELECT a.l_partkey, a.rev AS a_rev, b.rev AS b_rev, a.rev / b.rev AS ratio
       |FROM a, b
       |WHERE a.l_partkey = b.l_partkey
       |  AND a.rev BETWEEN 0.9 * b.rev AND 1.1 * b.rev
       |ORDER BY a.l_partkey""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q24/q08 shape (`queries/tpcds/q24_1.sql:27`, `q08.sql:438`):
    * join on *expressions* — upper() + substr prefix equality beside
    * the equi key, then concat in the projection
    * (`q84.sql:3` nested-concat idiom).
    */
  def exprJoin(s: SparkSession, dir: String): DataFrame = {
    // Aggregate-then-join: both join keys (nationkey, 2-char name
    // prefix) are low-cardinality, so joining raw rows enumerates a
    // quasi-cartesian pair set per bucket — O(n^2/buckets) at scale.
    // Instead pre-aggregate each side per key into counts/balance
    // sums and derive pair-level totals algebraically:
    //   pairs = sum(s_cnt * c_cnt)
    //   bal   = sum(s_cnt * c_bal_sum)   (each pair contributes one
    //                                     c_acctbal, s_cnt times)
    // The decimal sum stays exact until the final double cast, so the
    // hash matches the pair-enumerating oracle bit for bit.
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val sup = Tables.supplier(s, dir)
      .groupBy(col("s_nationkey").as("nk"),
        upper(substring(col("s_name"), 17, 2)).as("pfx"))
      .agg(count(lit(1)).as("s_cnt"))
    val cust = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nk"),
        upper(substring(col("c_name"), 17, 2)).as("pfx"))
      .agg(count(lit(1)).as("c_cnt"),
        sum(col("c_acctbal").cast(dec)).as("c_bal"))
    sup.join(cust, Seq("nk", "pfx"))
      .join(broadcast(Tables.nation(s, dir)), col("nk") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("s_cnt") * col("c_cnt")).as("pairs"),
        sum(col("s_cnt") * col("c_bal")).cast("double").as("bal"))
      .withColumn("tag", concat(col("n_name"), lit("#"), col("pairs").cast("string")))
      .orderBy(col("n_name"))
  }

  val exprJoinOracle: String =
    s"""SELECT n_name, COUNT(*) AS pairs, ${dsumSql("c_acctbal")} AS bal,
       |  concat(n_name, '#', CAST(COUNT(*) AS VARCHAR)) AS tag
       |FROM supplier, customer, nation
       |WHERE s_nationkey = c_nationkey
       |  AND upper(substr(s_name, 17, 2)) = upper(substr(c_name, 17, 2))
       |  AND s_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------
  /** q09 shape (`queries/tpcds/q09.sql`): scalar subqueries inside
    * CASE in the projection — a count gate picks which avg to
    * report, per bucket. SQL-form (ScalarSubquery expressions are the
    * engine feature under test); one text runs on both engines.
    */
  val scalarCaseSql: String = {
    def bucket(i: Int, lo: Double, hi: Double): String = {
      val cond = s"l_quantity > $lo AND l_quantity <= $hi"
      s"""CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE $cond) > 4000
         |  THEN (SELECT ${davgSql("l_extendedprice")} FROM lineitem WHERE $cond)
         |  ELSE (SELECT ${davgSql("l_discount")} FROM lineitem WHERE $cond)
         |END AS bucket$i""".stripMargin
    }
    val buckets = (1 to 5).map(i => bucket(i, (i - 1) * 10.0, i * 10.0))
    s"""SELECT ${buckets.mkString(",\n")}
       |FROM region WHERE r_regionkey = 0""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q10/q35 shape (`queries/tpcds/q10.sql:23-45`): EXISTS AND
    * (EXISTS OR EXISTS) — OR-of-EXISTS becomes ExistenceJoin, which
    * only the SQL engine plans (SURVEY.md §7 hard parts). Ends with a
    * positional ORDER BY (`q47.sql:61` idiom).
    */
  val orExistsSql: String =
    """SELECT c_mktsegment, COUNT(*) AS cnt
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND (EXISTS (SELECT 1 FROM orders, lineitem
      |               WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
      |                 AND l_returnflag = 'R')
      |    OR EXISTS (SELECT 1 FROM orders, lineitem
      |               WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
      |                 AND l_returnflag = 'A'))
      |GROUP BY c_mktsegment
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** q93/q78 shape (`queries/tpcds/q78.sql:12-15`, `q93.sql:13`):
    * LEFT JOIN + IS NULL kept literal (not rewritten to left_anti —
    * semantic parity with the corpus idiom).
    */
  def leftIsNullAnti(s: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("ret_okey")).distinct()
    Tables.orders(s, dir)
      .join(returned, col("o_orderkey") === col("ret_okey"), "left_outer")
      .filter(col("ret_okey").isNull)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("clean_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val leftIsNullAntiOracle: String =
    s"""SELECT o_orderpriority, COUNT(*) AS clean_orders,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders LEFT OUTER JOIN
       |  (SELECT DISTINCT l_orderkey AS ret_okey FROM lineitem
       |   WHERE l_returnflag = 'R') returned
       |  ON o_orderkey = ret_okey
       |WHERE ret_okey IS NULL
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  /** q44 shape (`queries/tpcds/q44.sql`): best/worst rank pair —
    * HAVING against a scalar subquery (0.9 × global avg), two
    * unpartitioned rank() windows (ASC and DESC), joined on rank,
    * top-10 each.
    */
  def rankPair(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val avgQ = li.groupBy(col("l_partkey")).agg(davg(col("l_quantity")).as("avg_q"))
    val thresh = li.agg((davg(col("l_quantity")) * lit(0.9)).as("thresh"))
    val eligible = avgQ.join(broadcast(thresh)).filter(col("avg_q") > col("thresh"))
    val best = eligible
      .withColumn("rnk", rank().over(Window.orderBy(col("avg_q").desc)).cast("long"))
      .filter(col("rnk") < 11)
      .select(col("rnk"), col("l_partkey").as("best_key"))
    val worst = eligible
      .withColumn("rnk", rank().over(Window.orderBy(col("avg_q").asc)).cast("long"))
      .filter(col("rnk") < 11)
      .select(col("rnk"), col("l_partkey").as("worst_key"))
    val names = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
    best.join(worst, Seq("rnk"))
      .join(names.select(col("p_partkey").as("bk"), col("p_name").as("best_name")),
        col("best_key") === col("bk"))
      .join(names.select(col("p_partkey").as("wk"), col("p_name").as("worst_name")),
        col("worst_key") === col("wk"))
      .select(col("rnk"), col("best_name"), col("worst_name"))
      .orderBy(col("rnk"), col("best_name"), col("worst_name"))
  }

  val rankPairOracle: String =
    s"""WITH eligible AS (
       |  SELECT l_partkey, ${davgSql("l_quantity")} AS avg_q
       |  FROM lineitem
       |  GROUP BY l_partkey
       |  HAVING ${davgSql("l_quantity")} >
       |    (SELECT 0.9 * (${davgSql("l_quantity")}) FROM lineitem)),
       |best AS (SELECT CAST(RANK() OVER (ORDER BY avg_q DESC) AS BIGINT) AS rnk,
       |           l_partkey AS best_key FROM eligible),
       |worst AS (SELECT CAST(RANK() OVER (ORDER BY avg_q ASC) AS BIGINT) AS rnk,
       |           l_partkey AS worst_key FROM eligible)
       |SELECT best.rnk, pb.p_name AS best_name, pw.p_name AS worst_name
       |FROM best, worst, part pb, part pw
       |WHERE best.rnk < 11 AND worst.rnk < 11 AND best.rnk = worst.rnk
       |  AND pb.p_partkey = best_key AND pw.p_partkey = worst_key
       |ORDER BY best.rnk, best_name, worst_name""".stripMargin

  // ---------------------------------------------------------------
  /** q66 shape (`queries/tpcds/q66.sql:8-20`): 12-column month pivot
    * via conditional sums (`jan_sales` … `dec_sales`) per group, plus
    * a total.
    */
  def monthPivot(s: SparkSession, dir: String): DataFrame = {
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    val m = month(asDate(col("l_shipdate")))
    val monthCols = (1 to 12).map(i => dsum(when(m === i, rev).otherwise(0.0)).as(f"m$i%02d_rev"))
    val aggs = monthCols :+ dsum(rev).as("total_rev")
    Tables.lineitem(s, dir)
      .filter(year(asDate(col("l_shipdate"))) === 1997)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("n_name"))
  }

  val monthPivotOracle: String = {
    val rev = "l_extendedprice * (1.0 - l_discount)"
    val cols = (1 to 12).map { i =>
      val name = f"m$i%02d_rev"
      s"${dsumSql(s"CASE WHEN month(CAST(l_shipdate AS DATE)) = $i THEN $rev ELSE 0.0 END")} AS $name"
    }.mkString(",\n       |  ")
    s"""SELECT n_name,
       |  $cols,
       |  ${dsumSql(rev)} AS total_rev
       |FROM lineitem, supplier, nation
       |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND year(CAST(l_shipdate AS DATE)) = 1997
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q05/q77/q80 family shape: per-channel (sales, returns, profit)
    * subqueries UNION ALL'd, then ROLLUP over (channel, id) with
    * GROUPING()-aware ordering.
    */
  def channelRollup(s: SparkSession, dir: String): DataFrame = {
    def chan(name: String, priorities: Seq[String]): DataFrame =
      Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin(priorities: _*))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("id"))
        .agg(dsum(col("o_totalprice")).as("sales"),
          dsum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0))
            .as("returns"))
        .select(lit(name).as("channel"), col("id"), col("sales"), col("returns"),
          (col("sales") - col("returns")).as("profit"))
    val channels =
      chan("urgent", Seq("1-URGENT", "2-HIGH"))
        .unionAll(chan("medium", Seq("3-MEDIUM")))
        .unionAll(chan("relaxed", Seq("4-NOT SPECIFIED", "5-LOW")))
    channels.rollup(col("channel"), col("id"))
      .agg(dsum(col("sales")).as("sales"), dsum(col("returns")).as("returns"),
        dsum(col("profit")).as("profit"),
        (grouping(col("channel")) + grouping(col("id"))).cast("long").as("lochierarchy"))
      .orderBy(col("lochierarchy").desc, col("channel"), col("id"))
  }

  val channelRollupOracle: String = {
    def chan(name: String, prios: String) =
      s"""SELECT '$name' AS channel, n_name AS id,
         |    ${dsumSql("o_totalprice")} AS sales,
         |    ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END")} AS returns
         |  FROM orders, customer, nation
         |  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
         |    AND o_orderpriority IN ($prios)
         |  GROUP BY n_name""".stripMargin
    s"""WITH channels AS (
       |  SELECT channel, id, sales, returns, sales - returns AS profit FROM (
       |  ${chan("urgent", "'1-URGENT','2-HIGH'")}
       |  UNION ALL
       |  ${chan("medium", "'3-MEDIUM'")}
       |  UNION ALL
       |  ${chan("relaxed", "'4-NOT SPECIFIED','5-LOW'")}) c)
       |SELECT channel, id,
       |  ${dsumSql("sales")} AS sales, ${dsumSql("returns")} AS returns,
       |  ${dsumSql("profit")} AS profit,
       |  CAST(GROUPING(channel) + GROUPING(id) AS BIGINT) AS lochierarchy
       |FROM channels
       |GROUP BY ROLLUP(channel, id)
       |ORDER BY lochierarchy DESC, channel, id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q39_1/q39_2 pair shape: the same cov aggregate computed for two
    * adjacent periods and joined on the key, keeping keys whose
    * variability exceeds the threshold in both.
    */
  def covPair(s: SparkSession, dir: String): DataFrame = {
    def period(from: String, to: String, kc: String, prefix: String): DataFrame =
      Tables.lineitem(s, dir)
        .filter(asDate(col("l_shipdate")) >= dt(from) && asDate(col("l_shipdate")) < dt(to))
        .groupBy(col("l_suppkey").as(kc))
        .agg(count(lit(1)).as(s"${prefix}_n"), dsum(col("l_quantity")).as(s"${prefix}_sx"),
          dsum(col("l_quantity") * col("l_quantity")).as(s"${prefix}_sxx"))
        .filter(col(s"${prefix}_n") > 1)
        .withColumn(s"${prefix}_mean", col(s"${prefix}_sx") / col(s"${prefix}_n"))
        .withColumn(s"${prefix}_cov",
          sqrt((col(s"${prefix}_sxx") - col(s"${prefix}_sx") * col(s"${prefix}_sx") /
            col(s"${prefix}_n")) / (col(s"${prefix}_n") - 1)) / col(s"${prefix}_mean"))
        .filter(col(s"${prefix}_cov") > 0.25)
    period("1997-01-01", "1997-04-01", "k1", "p1")
      .join(period("1997-04-01", "1997-07-01", "k2", "p2"), col("k1") === col("k2"))
      .select(col("k1").as("l_suppkey"), col("p1_mean"), col("p1_cov"),
        col("p2_mean"), col("p2_cov"))
      .orderBy(col("l_suppkey"))
  }

  val covPairOracle: String = {
    def period(from: String, to: String, p: String) =
      s"""SELECT l_suppkey, n, sx / n AS mean,
         |    sqrt((sxx - sx * sx / n) / (n - 1)) / (sx / n) AS cov
         |  FROM (SELECT l_suppkey, COUNT(*) AS n,
         |          ${dsumSql("l_quantity")} AS sx,
         |          ${dsumSql("l_quantity * l_quantity")} AS sxx
         |        FROM lineitem
         |        WHERE CAST(l_shipdate AS DATE) >= DATE '$from'
         |          AND CAST(l_shipdate AS DATE) < DATE '$to'
         |        GROUP BY l_suppkey HAVING COUNT(*) > 1) g
         |  WHERE sqrt((sxx - sx * sx / n) / (n - 1)) / (sx / n) > 0.25""".stripMargin
    s"""WITH p1 AS (${period("1997-01-01", "1997-04-01", "p1")}),
       |p2 AS (${period("1997-04-01", "1997-07-01", "p2")})
       |SELECT p1.l_suppkey, p1.mean AS p1_mean, p1.cov AS p1_cov,
       |  p2.mean AS p2_mean, p2.cov AS p2_cov
       |FROM p1, p2
       |WHERE p1.l_suppkey = p2.l_suppkey
       |ORDER BY p1.l_suppkey""".stripMargin
  }

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("tpcds_month_pivot", monthPivot, Some(monthPivotOracle),
      "12-column month pivot via conditional sums (q66)"),
    Q("tpcds_channel_rollup", channelRollup, Some(channelRollupOracle),
      "per-channel sales/returns/profit UNION ALL -> ROLLUP (q05/q77/q80)"),
    Q("tpcds_cov_pair", covPair, Some(covPairOracle),
      "adjacent-period cov aggregates joined on key (q39 pair)"),
    Q("tpcds_rollup_grouping", rollupGrouping, Some(rollupGroupingOracle),
      "ROLLUP + GROUPING() -> lochierarchy -> window rank-within-parent (q36/q70/q86)"),
    Q("tpcds_running_total", runningTotalFullJoin, Some(runningTotalFullJoinOracle),
      "cumulative ROWS frame + FULL JOIN + running max (q51)"),
    Q("tpcds_ratio_to_class", ratioToClass, Some(ratioToClassOracle),
      "sum*100/sum(sum) OVER class partition (q12/q98)"),
    Q("tpcds_lag_lead_selfjoin", lagLeadSelfJoin, Some(lagLeadSelfJoinOracle),
      "rn±1 self-join lag/lead emulation + avg(sum) window (q47/q57)"),
    Q("tpcds_intersect", intersectCustomers, Some(intersectCustomersOracle),
      "INTERSECT of period customer sets (q38)"),
    Q("tpcds_except", exceptCustomers, Some(exceptCustomersOracle),
      "EXCEPT of period customer sets (q87)"),
    Q("tpcds_union_channels", unionChannels, Some(unionChannelsOracle),
      "UNION ALL heterogeneous channels + literal cols (q76/q05)"),
    Q("tpcds_union_distinct", unionDistinct, Some(unionDistinctOracle),
      "UNION distinct key sets + dim join (q75)"),
    Q("tpcds_day_buckets", dayBuckets, Some(dayBucketsOracle),
      "conditional-agg day-bucket histogram (q62/q50/q99)"),
    Q("tpcds_crossjoin_scalars", crossJoinScalars, Some(crossJoinScalarsOracle),
      "8 scalar aggregates cross-joined to one row (q88)"),
    Q("tpcds_year_over_year", yearOverYear, Some(yearOverYearOracle),
      "year_total CTE referenced 4x, growth-ratio compare (q74/q11)"),
    Q("tpcds_stddev_cov", stddevCov, Some(stddevCovOracle),
      "stddev_samp + coefficient of variation per group (q17/q39)"),
    Q("tpcds_countd_mixed", countDistinctMixed, Some(countDistinctMixedOracle),
      "count(DISTINCT) mixed with plain aggs (q28)"),
    Q("tpcds_theta_band_join", thetaBandJoin, Some(thetaBandJoinOracle),
      "equi + ±10% BETWEEN band theta join (q58)"),
    Q("tpcds_expr_join", exprJoin, Some(exprJoinOracle),
      "join on upper()/substr() expressions + concat (q24/q08/q84)"),
    shared("tpcds_scalar_case", scalarCaseSql,
      "scalar subqueries inside CASE projection (q09)"),
    shared("tpcds_or_exists", orExistsSql,
      "EXISTS AND (EXISTS OR EXISTS) -> ExistenceJoin (q10/q35)"),
    Q("tpcds_left_isnull_anti", leftIsNullAnti, Some(leftIsNullAntiOracle),
      "LEFT JOIN + IS NULL anti idiom kept literal (q93/q78)"),
    Q("tpcds_rank_pair", rankPair, Some(rankPairOracle),
      "best/worst unpartitioned rank pair + HAVING scalar subquery (q44)"))
}
