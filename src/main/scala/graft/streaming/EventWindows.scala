package graft.streaming

import graft.{Q, Tables}
import graft.Cols._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Running per-user state carried across micro-batches. */
final case class UserRunningState(count: Long, total: Double)

/** Per-user snapshot emitted each micro-batch. */
final case class UserSnapshot(user_id: Long, events: Long, total: Double)

/** Open-session state for the flatMapGroupsWithState face (epoch
  * millis — state should be small and codec-friendly). */
final case class OpenSession(start: Long, last: Long, count: Long, total: Double)

/** A closed session emitted either when a new event exceeds the gap
  * or when the event-time timeout fires after the watermark passes. */
final case class ClosedSession(
    user_id: Long, sess_start: java.sql.Timestamp,
    sess_end: java.sql.Timestamp, cnt: Long, total: Double)

/** Event-time windowing over the `events` fixture (builder brief;
  * SURVEY.md §7 step 8 — the reference itself is batch-only, §2.10).
  *
  * Each operator has two faces sharing one logical definition:
  * - a batch face registered in `queries` (DuckDB-verifiable: the
  *   final state a stream reaches after all events arrive);
  * - a Structured Streaming face ([[streamingEvents]] +
  *   [[tumblingStream]] etc.) with watermarks, exercised by
  *   StreamingSpec via Trigger.AvailableNow — proving the same
  *   aggregation runs incrementally with state + late-data handling.
  *
  * Scale design: tumbling/sliding aggs shuffle once on (window, key);
  * session windows shuffle on user_id and merge locally; the
  * stateful dedup keys state by (user_id, event_type) — all
  * partition-parallel with no driver state.
  */
object EventWindows {

  // ---------------------------------------------------------------
  /** Tumbling 1-hour windows per event type. */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("total"))
      .orderBy(col("wstart"), col("event_type"))

  val tumblingOracle: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, event_type,
       |  COUNT(*) AS cnt, ${dsumSql("value")} AS total
       |FROM events
       |GROUP BY wstart, event_type
       |ORDER BY wstart, event_type""".stripMargin

  // ---------------------------------------------------------------
  /** Sliding windows: 1 hour long, every 30 minutes — each event
    * lands in two windows. The oracle expands the window assignment
    * explicitly (bucket and bucket − 30 min).
    */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("total"))
      .orderBy(col("wstart"), col("event_type"))

  val slidingOracle: String =
    s"""SELECT wstart, event_type, COUNT(*) AS cnt, ${dsumSql("value")} AS total
       |FROM (
       |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS wstart,
       |    event_type, value
       |  FROM events
       |  UNION ALL
       |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
       |      - INTERVAL '30 minutes' AS wstart,
       |    event_type, value
       |  FROM events) assigned
       |GROUP BY wstart, event_type
       |ORDER BY wstart, event_type""".stripMargin

  // ---------------------------------------------------------------
  /** Session windows per user with a 30-minute gap. The oracle is
    * the classic gaps-and-islands rewrite (lag → new-session flag →
    * running sum → island id).
    */
  def session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"))
      .select(col("w.start").as("sess_start"), col("w.end").as("sess_end"),
        col("user_id"), col("cnt"), col("total"))
      .orderBy(col("user_id"), col("sess_start"))

  val sessionOracle: String =
    s"""WITH ordered AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       |    CASE WHEN CAST(ts AS TIMESTAMP) >=
       |        lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
       |        + INTERVAL '30 minutes'
       |      OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |      THEN 1 ELSE 0 END AS new_sess
       |  FROM events),
       |islands AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM ordered)
       |SELECT MIN(ts) AS sess_start, MAX(ts) + INTERVAL '30 minutes' AS sess_end,
       |  user_id, COUNT(*) AS cnt, ${dsumSql("value")} AS total
       |FROM islands
       |GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_start""".stripMargin

  // ---------------------------------------------------------------
  /** Stateful dedup semantics (batch face): keep the earliest event
    * per (user_id, event_type) — what a streaming
    * dropDuplicates-with-watermark converges to, with a total-order
    * tiebreak on event_id.
    */
  def dedupEarliest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val dedupEarliestOracle: String =
    """SELECT user_id, event_type, ts, event_id, value
      |FROM (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events) numbered
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------
  /** As-of join by composition (the builder brief's preference order
    * (a): compose existing ops): each 'purchase' event picks up the
    * timestamp/value of the same user's most recent prior-or-equal
    * 'view' event — `last(..., ignoreNulls)` over an ordered ROWS
    * frame on the tagged union, instead of a custom SparkPlan. One
    * shuffle on user_id; ties broken by event_id for determinism.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .withColumn("last_view_ts",
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
      .withColumn("last_view_value",
        last(when(col("event_type") === "view", col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("last_view_ts"), col("last_view_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val asofJoinOracle: String = {
    val over = "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""SELECT user_id, event_id, ts, value, last_view_ts, last_view_value
       |FROM (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type,
       |    last_value(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END
       |      IGNORE NULLS) $over AS last_view_ts,
       |    last_value(CASE WHEN event_type = 'view' THEN value END
       |      IGNORE NULLS) $over AS last_view_value
       |  FROM events
       |  WHERE event_type IN ('purchase', 'view')) tagged
       |WHERE event_type = 'purchase'
       |ORDER BY user_id, ts, event_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Range join via time-bucketing (the scalable plan for interval
    * joins): each 'error' event aggregates the same user's events
    * from the preceding 5 minutes. Instead of a non-equi join
    * (nested-loop at scale), both sides are bucketed to the window
    * length and the probe explodes to {bucket−1, bucket} — an
    * equi-join on (user, bucket) whose fan-out is bounded by 2×, with
    * the exact range predicate applied after. The oracle is the plain
    * non-equi range join, proving the rewrite.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("b", expr("floor(unix_micros(ts) / 300000000)"))
    val probe = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"), col("b").as("e_b"))
      .withColumn("jb", explode(expr("array(e_b - 1, e_b)")))
    val build = ev.select(col("user_id"), col("b"), col("ts").as("o_ts"),
      col("value").as("o_value"))
    probe.join(build,
        col("e_user") === col("user_id") && col("jb") === col("b") &&
          col("o_ts") >= expr("e_ts - INTERVAL '5' MINUTE") && col("o_ts") <= col("e_ts"))
      .groupBy(col("e_id"), col("e_user"), col("e_ts"))
      .agg(count(lit(1)).as("preceding_events"), dsum(col("o_value")).as("preceding_value"))
      .orderBy(col("e_id"))
  }

  val rangeJoinOracle: String =
    s"""SELECT e.event_id AS e_id, e.user_id AS e_user,
       |  CAST(e.ts AS TIMESTAMP) AS e_ts,
       |  COUNT(*) AS preceding_events,
       |  ${dsumSql("o.value")} AS preceding_value
       |FROM events e, events o
       |WHERE e.event_type = 'error' AND o.user_id = e.user_id
       |  AND CAST(o.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL '5 minutes'
       |  AND CAST(o.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
       |GROUP BY e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP)
       |ORDER BY e_id""".stripMargin

  // ---------------------------------------------------------------
  /** Trending top-k: per tumbling hour, the 3 most frequent event
    * types with their count delta vs the type's previous non-empty
    * window — the standard "what's spiking" stream dashboard. Both
    * windows here run over the AGGREGATED (window, type) frame —
    * events shuffle once into the windowed count; ranks and lags
    * touch only per-hour type counts (bounded by the type domain), so
    * neither window ever sorts raw events.
    */
  def trending(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))
    val lagW = Window.partitionBy(col("event_type")).orderBy(col("wstart"))
    val rankW = Window.partitionBy(col("wstart"))
      .orderBy(col("cnt").desc, col("event_type"))
    counts
      .withColumn("prev_cnt", lag(col("cnt"), 1, 0L).over(lagW))
      .withColumn("rnk", row_number().over(rankW).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("wstart"), col("event_type"), col("cnt"),
        (col("cnt") - col("prev_cnt")).as("delta"), col("rnk"))
      .orderBy(col("wstart"), col("rnk"))
  }

  val trendingOracle: String =
    """WITH counts AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart,
      |    event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT wstart, event_type, cnt,
      |    lag(cnt, 1, 0) OVER (PARTITION BY event_type ORDER BY wstart) AS prev_cnt,
      |    ROW_NUMBER() OVER (PARTITION BY wstart
      |      ORDER BY cnt DESC, event_type) AS rnk
      |  FROM counts)
      |SELECT wstart, event_type, cnt,
      |  CAST(cnt - prev_cnt AS BIGINT) AS delta, CAST(rnk AS BIGINT) AS rnk
      |FROM x WHERE rnk <= 3
      |ORDER BY wstart, rnk""".stripMargin

  // ---------------------------------------------------------------
  // Structured Streaming faces (exercised by StreamingSpec).

  /** File-source streaming read of the events fixture, normalized by
    * the SAME [[Tables.normalizeTs]] the batch reader applies (nanos
    * -as-long on old fixtures, TIMESTAMP_NTZ on newer ones) — one
    * helper, no drift between the two faces.
    */
  def streamingEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The batch reader's footer-derived schema IS the physical schema;
    // reuse it for the stream so both faces normalize identically.
    val physical = s.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeTs(
      s.readStream.schema(physical)
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(dir))
  }

  /** Watermarked tumbling aggregation over a streaming frame —
    * same logical agg as [[tumbling]]. */
  def tumblingStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("total"))

  /** Watermarked streaming dedup by key — state expires with the
    * watermark; same converged semantics as [[dedupEarliest]] when
    * events arrive in order. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")

  /** Stream-stream interval join, watermarked on both sides: each
    * purchase pairs with the same user's views from the preceding 10
    * minutes. The interval condition gives Spark an eviction bound
    * for BOTH state stores (a view can only ever match purchases up
    * to 10 minutes after it, so view state older than
    * `watermark − 10 min` is dropped) — the canonical bounded-state
    * stream-stream join. At scale each side shuffles once on
    * user_id; state volume is interval × arrival rate per key, never
    * the stream's history. Batch semantics of the same join are
    * oracled via [[rangeJoin]]'s bucketed equivalent.
    */
  def intervalJoinStream(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 minute")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 minute")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("p_id"), col("p_user"), col("p_ts"), col("v_id"), col("v_ts"))
  }

  /** Custom keyed state via
    * `KeyValueGroupedDataset.mapGroupsWithState`: a running
    * (count, value-total) per user, updated each micro-batch — the
    * building block for stateful enrichments the built-in windowed
    * aggs can't express. State is partitioned by user_id in the state
    * store; nothing accumulates on the driver.
    */
  def runningPerUserStream(events: DataFrame): Dataset[UserSnapshot] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunningState, UserSnapshot](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var c = prev.count
          var t = prev.total
          rows.foreach { r => c += 1; t += r._2 }
          state.update(UserRunningState(c, t))
          UserSnapshot(user, c, t)
      }
  }

  /** Sessionization with custom state via
    * `flatMapGroupsWithState` + `EventTimeTimeout`: sessions CLOSE
    * (emit) either when a same-batch event exceeds the 30-minute gap
    * or when the watermark passes the open session's gap deadline and
    * the timeout fires — the semantics `session_window` provides
    * built-in ([[session]]), re-expressed as explicit state for the
    * cases built-ins can't cover (e.g. emitting enriched session
    * records, capping session length). State is keyed by user in the
    * state store; emission is append-mode (each session exactly
    * once).
    */
  def sessionStream(events: DataFrame): Dataset[ClosedSession] = {
    val s = events.sparkSession
    import s.implicits._
    val gapMs = 30L * 60 * 1000
    def close(user: Long, st: OpenSession): ClosedSession =
      ClosedSession(user, new java.sql.Timestamp(st.start),
        new java.sql.Timestamp(st.last + gapMs), st.count, st.total)
    events
      .withWatermark("ts", "1 minute")
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (user, rows, state) =>
        if (state.hasTimedOut) {
          val out = state.getOption.map(close(user, _)).iterator
          state.remove()
          out
        } else {
          val closed = Seq.newBuilder[ClosedSession]
          var st = state.getOption.orNull
          rows.toSeq.sortBy(r => (r._2.getTime, r._1)).foreach { case (_, ts, v) =>
            val t = ts.getTime
            st = st match {
              case null => OpenSession(t, t, 1L, v)
              case o if t >= o.last + gapMs =>
                closed += close(user, o); OpenSession(t, t, 1L, v)
              case o =>
                OpenSession(o.start, math.max(o.last, t), o.count + 1, o.total + v)
            }
          }
          state.update(st)
          state.setTimeoutTimestamp(st.last + gapMs)
          closed.result().iterator
        }
      }
  }

  // ---------------------------------------------------------------
  def all: Seq[Q] = Seq(
    Q("stream_tumbling", tumbling, Some(tumblingOracle),
      "tumbling 1h event-time windows (batch face of streaming agg)"),
    Q("stream_sliding", sliding, Some(slidingOracle),
      "sliding 1h/30min windows, 2 windows per event"),
    Q("stream_session", session, Some(sessionOracle),
      "session windows, 30min gap (oracle: gaps-and-islands)"),
    Q("stream_dedup_earliest", dedupEarliest, Some(dedupEarliestOracle),
      "earliest-event-per-key dedup (batch face of stateful dedup)"),
    Q("stream_asof_join", asofJoin, Some(asofJoinOracle),
      "as-of join by composition: last prior 'view' per 'purchase'"),
    Q("stream_range_join", rangeJoin, Some(rangeJoinOracle),
      "range join via time-bucket equi-join == plain non-equi join"),
    Q("stream_trending", trending, Some(trendingOracle),
      "per-window top-3 event types with delta vs previous window"))
}
