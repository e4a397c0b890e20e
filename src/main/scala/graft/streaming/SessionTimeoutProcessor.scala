package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The TIMER face of the arbitrary-state API, completing the quartet
  * ([[RunningTotalsProcessor]] ValueState, [[TopKPerUserProcessor]]
  * ListState, [[PerTypeCountsProcessor]] MapState): per-user session
  * aggregation closed by INACTIVITY, the pattern `registerTimer` /
  * `handleExpiredTimer` exists for. Each input batch extends the
  * key's open session (count/total in a [[ValueState]]) and re-arms
  * a single EVENT-TIME timer at `lastEventTs + gapMs`; when the
  * watermark passes the deadline the timer fires — in a batch with
  * NO input for the key — emitting the session summary exactly once
  * and clearing the state, so the key's next event opens a fresh
  * session.
  *
  * Event-time (watermark-driven) timers rather than processing-time:
  * deterministic under replay and backfill — a recovered or
  * catch-up run closes exactly the same sessions at the same
  * boundaries, where wall-clock timers would close them wherever the
  * outage happened to fall. (Processing-time mode also keeps the
  * microbatch engine re-triggering to poll the clock; watermark
  * timers advance only when data does.)
  *
  * Scale shape: timers live in the state store beside the session
  * cell (one per key, re-armed by `deleteTimer`+`registerTimer`),
  * expiry scans are the store's own range scan — nothing is polled
  * per-key on the driver.
  */
class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp, Long), (Long, Long, Long)] {

  // (events, total, armedTimerTs)
  @transient private var session: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    session = getHandle.getValueState[(Long, Long, Long)](
      "session", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var (events, total, armed) =
      if (session.exists()) session.get() else (0L, 0L, 0L)
    var lastTs = 0L
    rows.foreach { case (_, ts, v) =>
      events += 1; total += v
      lastTs = math.max(lastTs, ts.getTime)
    }
    // Re-arm: one live timer per key — activity pushes the deadline.
    if (armed > 0) getHandle.deleteTimer(armed)
    val deadline = math.max(lastTs, armed - gapMs) + gapMs
    getHandle.registerTimer(deadline)
    session.update((events, total, deadline))
    Iterator.empty // sessions emit only when they close
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    val out =
      if (session.exists()) {
        val (events, total, _) = session.get()
        Iterator.single((key, events, total))
      } else Iterator.empty
    session.clear()
    out
  }
}
