package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared by every query.
  *
  * Oracle-determinism contract: the driver hash-compares our results
  * against DuckDB running the same logical SQL. Double summation is
  * order-dependent, and Spark's partial/final aggregation order differs
  * from DuckDB's sequential scan, so raw `sum(double)` would diverge in
  * the low bits and fail the hash. Instead every additive aggregate is
  * accumulated EXACTLY:
  *
  *   per-row double expression  (IEEE ops — bitwise identical in both
  *                               engines for the same expression tree)
  *   -> cast to DECIMAL(38,6)   (same nearest-decimal rounding)
  *   -> SUM (exact, order-independent)
  *   -> cast back to DOUBLE     (same nearest-double conversion)
  *
  * The matching oracle text is `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS
  * DOUBLE)`. Averages divide the exact sum by the row count in double
  * space, which is again a single deterministic IEEE op.
  */
object Cols {
  private val Dec = DecimalType(38, 6)

  /** Order-independent exact sum of a double expression, as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Deterministic average: exact sum / count, both in double space. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Window form of [[dsum]]: exact decimal sum over a window spec,
    * returned as double. Oracle text: `CAST(SUM(CAST(x AS
    * DECIMAL(38,6))) OVER (...) AS DOUBLE)`.
    */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast(DoubleType)

  /** Window form of [[davg]]. */
  def davgOver(c: Column, w: WindowSpec): Column =
    dsumOver(c, w) / count(lit(1)).over(w)

  /** Oracle-side SQL for dsum. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side SQL for davg. */
  def davgSql(expr: String): String = s"${dsumSql(expr)} / COUNT(*)"

  /** Fixture dates are stored as timestamps (FIXTURES.md §2); the
    * corpus compares to DATE literals. Normalize once, here.
    * Oracle side: `CAST(col AS DATE)`.
    */
  def asDate(c: Column): Column = to_date(c)

  /** TPC-H revenue expression. */
  def revenue(price: Column, discount: Column): Column =
    price * (lit(1.0) - discount)
}
