package org.apache.spark

import org.apache.spark.util.collection.ExternalAppendOnlyMap

/** Public facade over Spark's `private[spark]`
  * [[org.apache.spark.util.collection.ExternalAppendOnlyMap]] — the
  * spillable combine-by-key map behind `combineByKey`/`cogroup`.
  *
  * graft's TopKPerKeyExec aggregates a bounded per-key buffer (the
  * top-k rows) exactly like a map-side combiner; backing it with this
  * map gives it the same memory contract as Spark's own aggregation:
  * size-tracked, TaskMemoryManager-accounted, spilling sorted runs to
  * disk past the memory threshold and hash-merge-reading them back.
  * Keys and combiners must be serializable with the session's
  * serializer (UnsafeRow keys/rows + ArrayBuffer combiners are).
  */
class GraftSpillMap[K, V, C](
    createCombiner: V => C,
    mergeValue: (C, V) => C,
    mergeCombiners: (C, C) => C) {

  private val m = new ExternalAppendOnlyMap[K, V, C](
    createCombiner, mergeValue, mergeCombiners)

  def insertAll(entries: Iterator[Product2[K, V]]): Unit = m.insertAll(entries)

  /** Destructive merged iterator over in-memory + spilled entries. */
  def iterator: Iterator[(K, C)] = m.iterator

  def diskBytesSpilled: Long = m.diskBytesSpilled
}
