package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** The MAP-state face of the arbitrary-state API (completing the
  * trio: [[RunningTotalsProcessor]] ValueState,
  * [[TopKPerUserProcessor]] ListState): per user, a running
  * `event_type -> count` map kept in a typed [[MapState]]. The store
  * tracks map ENTRIES — updating one type's count touches one key,
  * not the whole map — which is what keeps high-cardinality per-key
  * maps maintainable at scale. Each batch emits the updated
  * `(user, event_type, count)` rows for the types it saw.
  */
class PerTypeCountsProcessor
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "perType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long)] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { case (_, tpe) =>
      val cur = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
      counts.updateValue(tpe, cur + 1L)
      touched += tpe
    }
    touched.iterator.map(tpe => (key, tpe, counts.getValue(tpe)))
  }
}
