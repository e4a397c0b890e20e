package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The TIMER face of the arbitrary-state API, completing the quartet
  * ([[RunningTotalsProcessor]] ValueState, [[TopKPerUserProcessor]]
  * ListState, [[PerTypeCountsProcessor]] MapState): per-user session
  * aggregation closed by INACTIVITY, the pattern `registerTimer` /
  * `handleExpiredTimer` exists for. Input events fold into the key's
  * open session (count/total in a [[ValueState]]) in event-time
  * order, CLOSING it inline whenever an event lands beyond the gap
  * (so sessions split identically however the batches slice), and
  * re-arm a single EVENT-TIME timer at `lastEventTs + gapMs`; when
  * the watermark passes the deadline the timer fires — in a batch
  * with NO input for the key — emitting the session summary exactly
  * once and clearing the state, so the key's next event opens a
  * fresh session.
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
    val (events0, total0, armed0) =
      if (session.exists()) session.get() else (0L, 0L, 0L)
    // Events are folded in EVENT-TIME order, and an event arriving
    // after the open session's deadline CLOSES that session first
    // (emitting it here) before opening the next — without this, a
    // key whose next session's events reach the processor before the
    // watermark fires the inactivity timer would fuse two sessions
    // into one, and replay with different batch slicing would emit a
    // different answer. The timer only handles the no-further-events
    // case; gap closure between observed events belongs to input
    // handling.
    var events = events0; var total = total0; var armed = armed0
    var closed = List.empty[(Long, Long, Long)]
    rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
      val t = ts.getTime
      if (events > 0 && t > armed) {
        closed ::= ((key, events, total))
        events = 0; total = 0
      }
      events += 1; total += v
      armed = math.max(armed, t + gapMs)
    }
    // Re-arm: one live timer per key — activity pushes the deadline.
    if (armed0 > 0) getHandle.deleteTimer(armed0)
    getHandle.registerTimer(armed)
    session.update((events, total, armed))
    closed.reverse.iterator
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
