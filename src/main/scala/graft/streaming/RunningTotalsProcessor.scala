package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4's arbitrary-state API (`transformWithState`), the
  * successor to `mapGroupsWithState`: a per-key running (event count,
  * value total) kept in a typed [[ValueState]] cell backed by the
  * RocksDB state store. Input rows are `(key, value)`; each batch
  * emits the key's updated running totals. The API separates state
  * declaration (handle + named state cells, per-cell TTL) from the
  * row loop — at scale that means state schema evolution and
  * independent eviction per cell, which the old one-blob
  * `GroupState` could not express.
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var (events, total) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { case (_, v) => events += 1; total += v }
    totals.update((events, total))
    Iterator.single((key, events, total))
  }
}
