package graft.queries

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three TPC-DS CTE shapes VERDICT r1 flagged as uncovered
  * ("What's missing" #2), ported onto the fixture star schema:
  *
  *  - q02's 53-week-offset self-join on a week-sequence key
  *    (`queries/tpcds/q02.sql:49-79`),
  *  - q23's chained CTEs ending in an agg-of-agg `max` feeding a
  *    HAVING scalar subquery (`q23_1.sql:2-48`),
  *  - q64's twice-referenced multi-join `cross_sales` CTE joined to
  *    itself across consecutive years (`q64.sql:15-110`).
  */
object TpcdsCtes {

  private def shared(name: String, sql: String, doc: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql), doc)

  // ---------------------------------------------------------------
  /** q02 shape (`queries/tpcds/q02.sql`): UNION ALL of two channels,
    * weekly 7-day pivot (sum CASE per day name), the pivoted CTE
    * referenced twice through year-filtered derived tables, joined on
    * `d_week_seq1 = d_week_seq2 - 53`, emitting per-day
    * `round(ratio, 2)` columns. The fixture has no date_dim, so
    * week_seq/day-of-week derive from a Monday-anchored day count —
    * the join-back through a distinct (year -> weeks) frame keeps
    * q02's "filter the CTE by joining the date dim again" structure.
    */
  def weekOffsetSelfJoin(s: SparkSession, dir: String): DataFrame = {
    val anchor = lit("1970-01-05") // a Monday
    def dt(d: String) = lit(d).cast("date")
    val days = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")
    val wscs = Tables.lineitem(s, dir)
      .select(asDate(col("l_shipdate")).as("d"), col("l_extendedprice").as("price"))
      .unionAll(Tables.orders(s, dir)
        .select(asDate(col("o_orderdate")).as("d"), col("o_totalprice").as("price")))
    // Only weeks with at least one 1996 or 1997 day survive the
    // year-filtered join-backs, and every day of such a week lies
    // within ±6 days of those year bounds — so the date band below is
    // semantics-identical and reaches the parquet scans as a pushed
    // range instead of pivoting the whole fact history (optimization
    // guide §6; the same move as the q64/q74 year pushdowns). Weeks
    // fully inside the 6-day slack margins form extra pivot groups
    // that the in96/in97 flags drop, exactly like the old join.
    val wk = wscs
      .filter(col("d").between(dt("1995-12-26"), dt("1998-01-06")))
      .withColumn("week_seq", floor(datediff(col("d"), anchor) / 7))
      .withColumn("dow", pmod(datediff(col("d"), anchor), lit(7)))
    val pivots = days.zipWithIndex.map { case (nm, i) =>
      dsum(when(col("dow") === i, col("price"))).as(s"${nm}_sales")
    }
    // The year membership of each week rides the SAME aggregate as
    // the pivot (max-of-indicator == DISTINCT-week-of-year join), so
    // the query is ONE scan + one shuffle instead of three scans (the
    // pivot plus two distinct year-week joins) — guide §2.4.
    val flags = Seq(
      max(when(year(col("d")) === 1996, 1).otherwise(0)).as("in96"),
      max(when(year(col("d")) === 1997, 1).otherwise(0)).as("in97"))
    // Referenced twice (1996 and 1997 slices); the aggregated frame is
    // weeks × 9 columns — cache it like the other multi-reference CTEs.
    val wswscs = wk.groupBy(col("week_seq"))
      .agg((pivots ++ flags).head, (pivots ++ flags).tail: _*)
      .cache()
    val y = wswscs.filter(col("in96") === 1)
      .select(col("week_seq").as("week_seq1") +:
        days.map(nm => col(s"${nm}_sales").as(s"${nm}1")): _*)
    val z = wswscs.filter(col("in97") === 1)
      .select(col("week_seq").as("week_seq2") +:
        days.map(nm => col(s"${nm}_sales").as(s"${nm}2")): _*)
    val ratios = days.map(nm =>
      round(col(s"${nm}1") / col(s"${nm}2"), 2).as(s"r_$nm"))
    y.join(z, col("week_seq1") === col("week_seq2") - 53)
      .select(col("week_seq1") +: ratios: _*)
      .orderBy(col("week_seq1"))
  }

  val weekOffsetSelfJoinOracle: String = {
    val days = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")
    val pivots = days.zipWithIndex.map { case (nm, i) =>
      s"${dsumSql(s"CASE WHEN dow = $i THEN price END")} AS ${nm}_sales"
    }.mkString(",\n       |    ")
    def yearRef(y: Int, sfx: String) =
      s"""SELECT w.week_seq AS week_seq$sfx,
         |    ${days.map(nm => s"${nm}_sales AS $nm$sfx").mkString(", ")}
         |  FROM wswscs w
         |  JOIN (SELECT DISTINCT week_seq FROM wk WHERE year(d) = $y) yw
         |    ON w.week_seq = yw.week_seq""".stripMargin
    s"""WITH wscs AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d, l_extendedprice AS price FROM lineitem
       |  UNION ALL
       |  SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice AS price FROM orders),
       |wk AS (
       |  SELECT d, (d - DATE '1970-01-05') // 7 AS week_seq,
       |    (d - DATE '1970-01-05') % 7 AS dow, price
       |  FROM wscs),
       |wswscs AS (
       |  SELECT week_seq,
       |    $pivots
       |  FROM wk GROUP BY week_seq),
       |y AS (${yearRef(1996, "1")}),
       |z AS (${yearRef(1997, "2")})
       |SELECT week_seq1,
       |  ${days.map(nm => s"round(${nm}1 / ${nm}2, 2) AS r_$nm").mkString(",\n       |  ")}
       |FROM y, z
       |WHERE week_seq1 = week_seq2 - 53
       |ORDER BY week_seq1""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q23_1 shape (`queries/tpcds/q23_1.sql:2-48`): chained CTEs —
    * frequent items (substr group key + HAVING count), agg-of-agg
    * `max(csales)` over a per-customer grouped derived table, best
    * customers via HAVING against `(50 / 100.0) * (SELECT * FROM
    * max_cte)`, then a UNION ALL of two channels each semi-filtered
    * by BOTH CTEs through IN subqueries, reduced to one total.
    *
    * DataFrame-form since r16 (the same conversion crossSales2Ref got
    * in r3; the SQL text below stays as the DuckDB oracle): in
    * SQL-form the per-customer aggregate ran twice (max_cust_sales +
    * best_customers), and the two UNION ALL channels — identical but
    * for `o_orderstatus = 'F'` vs `'O'` — each re-joined
    * lineitem⋈orders. Here the per-customer frame is built ONCE and
    * cached, and the union collapses to one pass filtered
    * `o_orderstatus IN ('F','O')`: the exact DECIMAL(38,6) sum is
    * order-independent, so Σ(F rows) + Σ(O rows) ≡ Σ(F∪O rows) bit
    * for bit (optimization guide §2.3/§2.4).
    */
  def cteChainMax(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val sales = col("l_quantity") * col("l_extendedprice")
    val li = Tables.lineitem(s, dir)
    val freqParts = li
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(substring(col("p_name"), 1, 10).as("pdesc"), col("p_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 20)
      .select(col("p_partkey").as("item_sk"))
    val perCust = li
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(sales).as("csales"))
      .cache()
    val cmax = perCust.agg(max(col("csales")).as("cmax"))
    val best = perCust.crossJoin(broadcast(cmax))
      .filter(col("csales") > lit(50) / lit(100.0) * col("cmax"))
      .select(col("o_custkey").as("best_key"))
    li.join(Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderkey"), col("o_custkey")),
      col("l_orderkey") === col("o_orderkey"))
      .join(freqParts, col("l_partkey") === col("item_sk"), "left_semi")
      .join(best, col("o_custkey") === col("best_key"), "left_semi")
      .agg(sum(sales.cast(DecimalType(38, 6))).cast("double").as("total_sales"))
  }

  val cteChainMaxSql: String = {
    val csales = dsumSql("l_quantity * l_extendedprice")
    s"""WITH frequent_parts AS (
       |  SELECT substr(p_name, 1, 10) AS pdesc, p_partkey AS item_sk, count(*) AS cnt
       |  FROM lineitem, part
       |  WHERE l_partkey = p_partkey
       |  GROUP BY substr(p_name, 1, 10), p_partkey
       |  HAVING count(*) > 20),
       |max_cust_sales AS (
       |  SELECT max(csales) AS cmax
       |  FROM (
       |    SELECT o_custkey, $csales AS csales
       |    FROM lineitem, orders
       |    WHERE l_orderkey = o_orderkey
       |    GROUP BY o_custkey) per_cust),
       |best_customers AS (
       |  SELECT o_custkey, $csales AS ssales
       |  FROM lineitem, orders
       |  WHERE l_orderkey = o_orderkey
       |  GROUP BY o_custkey
       |  HAVING $csales > ((50 / 100.0) * (SELECT * FROM max_cust_sales)))
       |SELECT CAST(SUM(CAST(sales AS DECIMAL(38,6))) AS DOUBLE) AS total_sales
       |FROM (
       |  SELECT l_quantity * l_extendedprice AS sales
       |  FROM lineitem, orders
       |  WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
       |    AND l_partkey IN (SELECT item_sk FROM frequent_parts)
       |    AND o_custkey IN (SELECT o_custkey FROM best_customers)
       |  UNION ALL
       |  SELECT l_quantity * l_extendedprice AS sales
       |  FROM lineitem, orders
       |  WHERE l_orderkey = o_orderkey AND o_orderstatus = 'O'
       |    AND l_partkey IN (SELECT item_sk FROM frequent_parts)
       |    AND o_custkey IN (SELECT o_custkey FROM best_customers)
       |) channel_sales""".stripMargin
  }

  // ---------------------------------------------------------------
  /** q64 shape (`queries/tpcds/q64.sql`): a HAVING-filtered returns
    * CTE feeding a many-way join CTE (`cross_sales`) with a dimension
    * aliased twice (n1/n2 here, ad1/ad2 in the reference), grouped by
    * a wide key including the year — then `cross_sales` referenced
    * TWICE and self-joined across consecutive years on the
    * (item, store, nation) key with `cs2.cnt <= cs1.cnt`, ordered
    * with positional ordinals.
    *
    * DataFrame-form (VERDICT r3 "What's wrong" #3): in SQL-form the
    * two CTE references carry different pushed year filters, so the
    * subplans differ, ReuseExchange can't dedup them, and the
    * dominant 8-way join runs TWICE. Here the aggregated
    * `cross_sales` frame — tiny (item × nation² × year groups) vs
    * the joined input — is built once and cached, and the two year
    * slices filter the cache, exactly the [[TpcdsShapes.yearOverYear]]
    * multi-reference-CTE pattern. The SQL text below stays as the
    * DuckDB oracle.
    */
  def crossSales2Ref(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val refund = col("l_extendedprice") * col("l_discount") +
      col("l_extendedprice") * col("l_tax")
    val returnsUi = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice")).as("r_sale"), dsum(refund).as("r_refund"))
      .filter(col("r_sale") > col("r_refund") * 2)
      .select(col("l_partkey").as("r_item_sk"))
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("store_name"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    // `syear` is a group key, so restricting the input to the two years
    // the self-join keeps is semantics-identical — and it lets the year
    // predicate push into the orders parquet scan instead of aggregating
    // every year only to filter the cache afterwards (VERDICT r14 #2).
    val ordersTwoYears = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
    // Join order (guide §3): the two selective reducers — the
    // returned-part semi-filter and the two-year orders slice — come
    // FIRST so the dimension joins probe only surviving fact rows;
    // the r16 before-plan had returns_ui as the LAST of 7 broadcast
    // joins, carrying every 7-year lineitem row through 6 probes
    // before dropping non-returned parts. Inner joins commute, so the
    // result is bit-identical.
    val crossSales = Tables.lineitem(s, dir)
      .join(returnsUi, col("l_partkey") === col("r_item_sk"))
      .join(ordersTwoYears, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .withColumn("syear", year(col("o_orderdate")))
      .groupBy(col("p_name").as("product_name"), col("l_partkey").as("item_sk"),
        col("store_name"), col("cust_nation"), col("syear"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_extendedprice")).as("s1"),
        dsum(col("l_discount")).as("s2"),
        dsum(col("l_tax")).as("s3"))
      .cache()
    val cs1 = crossSales.filter(col("syear") === 1996)
      .select(col("product_name"), col("store_name"), col("cust_nation"),
        col("item_sk").as("item1"), col("syear").as("syear1"),
        col("cnt").as("cnt1"), col("s1").as("s11"), col("s2").as("s21"),
        col("s3").as("s31"))
    val cs2 = crossSales.filter(col("syear") === 1996 + 1)
      .select(col("item_sk").as("item2"), col("store_name").as("store2"),
        col("cust_nation").as("nation2"), col("syear").as("syear2"),
        col("cnt").as("cnt2"), col("s1").as("s12"), col("s2").as("s22"),
        col("s3").as("s32"))
    cs1.join(cs2,
      col("item1") === col("item2") &&
        col("store_name") === col("store2") &&
        col("cust_nation") === col("nation2") &&
        col("cnt2") <= col("cnt1"))
      .select(col("product_name"), col("store_name"), col("cust_nation"),
        col("syear1"), col("cnt1"), col("s11"), col("s21"), col("s31"),
        col("s12"), col("s22"), col("s32"), col("syear2"), col("cnt2"))
      .orderBy(col("product_name"), col("store_name"), col("cnt2"),
        col("s11"), col("s21"), col("s31"))
  }

  val crossSales2RefSql: String = {
    val refund = "l_extendedprice * l_discount + l_extendedprice * l_tax"
    s"""WITH returns_ui AS (
       |  SELECT l_partkey AS item_sk,
       |    ${dsumSql("l_extendedprice")} AS sale,
       |    ${dsumSql(refund)} AS refund
       |  FROM lineitem
       |  WHERE l_returnflag = 'R'
       |  GROUP BY l_partkey
       |  HAVING ${dsumSql("l_extendedprice")} > 2 * ${dsumSql(refund)}),
       |cross_sales AS (
       |  SELECT p_name AS product_name, l_partkey AS item_sk,
       |    n1.n_name AS store_name, n2.n_name AS cust_nation,
       |    year(o_orderdate) AS syear, count(*) AS cnt,
       |    ${dsumSql("l_extendedprice")} AS s1,
       |    ${dsumSql("l_discount")} AS s2,
       |    ${dsumSql("l_tax")} AS s3
       |  FROM lineitem, orders, part, supplier, customer, nation n1, nation n2, returns_ui
       |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
       |    AND l_suppkey = s_suppkey AND o_custkey = c_custkey
       |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
       |    AND l_partkey = returns_ui.item_sk
       |  GROUP BY p_name, l_partkey, n1.n_name, n2.n_name, year(o_orderdate))
       |SELECT cs1.product_name, cs1.store_name, cs1.cust_nation,
       |  cs1.syear AS syear1, cs1.cnt AS cnt1,
       |  cs1.s1 AS s11, cs1.s2 AS s21, cs1.s3 AS s31,
       |  cs2.s1 AS s12, cs2.s2 AS s22, cs2.s3 AS s32,
       |  cs2.syear AS syear2, cs2.cnt AS cnt2
       |FROM cross_sales cs1, cross_sales cs2
       |WHERE cs1.item_sk = cs2.item_sk AND cs1.syear = 1996
       |  AND cs2.syear = 1996 + 1 AND cs2.cnt <= cs1.cnt
       |  AND cs1.store_name = cs2.store_name
       |  AND cs1.cust_nation = cs2.cust_nation
       |ORDER BY cs1.product_name, cs1.store_name, cnt2, 6, 7, 8""".stripMargin
  }

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("tpcds_week_offset_selfjoin", weekOffsetSelfJoin, Some(weekOffsetSelfJoinOracle),
      "53-week-offset self-join over a 7-day pivot CTE (q02)"),
    Q("tpcds_cte_chain_max", cteChainMax, Some(cteChainMaxSql),
      "chained CTEs, agg-of-agg max into HAVING scalar subquery (q23)"),
    Q("tpcds_cross_sales_2ref", crossSales2Ref, Some(crossSales2RefSql),
      "2x-referenced multi-join cross_sales CTE built ONCE, year self-join (q64)"))
}
