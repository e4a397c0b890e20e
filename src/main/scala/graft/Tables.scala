package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture layer (SURVEY.md §7 step 1).
  *
  * Loads the driver-generated Parquet star schema
  * (`/root/testdata/sf*`, FIXTURES.md §1) and registers temp views so
  * queries can be written either with the DataFrame API or
  * `spark.sql` against the same names the DuckDB oracle sees.
  *
  * The reference reads pre-existing Iceberg tables via a catalog
  * (`IcebergBenchmark.java:153`); locally the equivalent is a plain
  * Parquet scan per table — Catalyst still gets predicate pushdown,
  * column pruning and partition-sized splits for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` varies by fixture generation: older fixtures write
    * Parquet TIMESTAMP(NANOS) (readable only as raw longs via the
    * legacy conf), newer ones annotated microseconds without a
    * timezone (read as TIMESTAMP_NTZ). Normalize either to
    * session-zone TimestampType so downstream queries and the DuckDB
    * oracle (`CAST(ts AS TIMESTAMP)` — no-op on micros, ns-truncation
    * on nanos) see identical values. Integer `div` (not `/`) on the
    * nanos path — nanos ~1.7e18 exceed double's 2^53 exact range.
    *
    * Shared by the batch ([[events]]) and streaming
    * ([[graft.streaming.EventWindows.streamingEvents]]) readers so
    * the two faces cannot drift.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ->TimestampType cast reads the wall-clock instant in the
    // SESSION zone: only UTC matches the epoch-nanos path and the
    // DuckDB oracle. Every entry point pins UTC already (Verify /
    // Bench / Runner / SparkSpec); enforce the invariant here so a
    // future entry point cannot silently shift instants.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view (idempotent). Used by
    * the `spark.sql`-form queries (null-aware NOT IN, OR-of-EXISTS —
    * SURVEY.md §7 "hard parts").
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
