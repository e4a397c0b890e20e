package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** The LIST-state face of Spark 4's arbitrary-state API
  * ([[RunningTotalsProcessor]] covers the ValueState face): a per-key
  * running top-k of observed scores, kept in a typed [[ListState]]
  * backed by the RocksDB store. Each batch merges new `(key, score)`
  * rows into the key's bounded list (k = 3, sorted descending, ties
  * by insertion kept deterministic via the score pair) and emits the
  * key's current top-k as one row per rank.
  *
  * Why ListState and not a ValueState of Seq: the store tracks list
  * ELEMENTS (appendList/put per element), so a k-sized update does
  * not rewrite an opaque blob — the contract that keeps per-key
  * state maintenance O(k) at scale.
  */
class TopKPerUserProcessor(k: Int = 3)
    extends StatefulProcessor[Long, (Long, Long), (Long, Int, Long)] {

  @transient private var top: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getListState[Long](
      "topk", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Int, Long)] = {
    val incoming = rows.map(_._2).toSeq
    val merged = (top.get().toSeq ++ incoming)
      .sorted(Ordering[Long].reverse).take(k)
    top.put(merged.toArray)
    merged.iterator.zipWithIndex.map { case (score, i) => (key, i + 1, score) }
  }
}
