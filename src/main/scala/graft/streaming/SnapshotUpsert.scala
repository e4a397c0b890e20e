package graft.streaming

import java.nio.file.Path

import org.apache.spark.sql.DataFrame

import graft.sources.SnapStore

/** Streaming CDC upsert into a [[graft.sources.SnapStore]] snapshot
  * table — the `writeStream.foreachBatch(MERGE)` pattern Iceberg
  * documents for continuous upsert ingestion, built on the same two
  * commit guarantees a real lakehouse sink relies on:
  *
  *  - **Atomic per-epoch commits.** Each microbatch becomes exactly
  *    one snapshot (SnapStore manifests are ATOMIC_MOVE-published),
  *    so readers never observe a half-applied batch.
  *  - **Idempotent replay.** Structured Streaming re-runs the last
  *    unacknowledged batch after a crash; the writer tags each
  *    commit's `operation` with the epoch id (`merge-b<N>`) and
  *    SKIPS a batch whose tag is already in the snapshot history —
  *    end-to-end exactly-once without any engine support, exactly
  *    how Iceberg's Spark sink dedupes replayed epochs.
  *
  * At scale each epoch costs one copy-on-write job over only the
  * files whose partition bounds intersect the batch's keys (the
  * [[SnapStore.merge]] pruning), so a steady CDC trickle touching k
  * partitions per epoch never rewrites the whole table.
  */
object SnapshotUpsert {

  private def epochTag(batchId: Long) = s"merge-b$batchId"

  /** Has `batchId` already committed to `table`? The check scans the
    * LIVE history for the exact epoch tag: stopping at the newest
    * `merge-b*` commit would mis-read a RECREATED checkpoint (batch
    * ids restart at 0, and a stale newer tag would pass the check
    * and silently skip a real batch — double-apply's dual). The scan
    * is bounded by snapshot expiry (`keepLast`), the same retention
    * that already bounds every history walk; run [[SnapStore.expire]]
    * on the upsert cadence. Invariant (document to operators): one
    * upsert stream per table — two streams sharing a table would
    * collide on the epoch-tag namespace.
    */
  def committed(table: Path, batchId: Long): Boolean = {
    val tag = epochTag(batchId)
    // operationOf reads just the tag line — no schema JSON parse per
    // manifest on this per-trigger path.
    SnapStore.liveVersions(table).reverseIterator
      .exists(v => SnapStore.operationOf(table, v) == tag)
  }

  /** The `foreachBatch` body: merge one microbatch of changes
    * (keyed upserts) into the snapshot table, exactly once. Returns
    * true when the batch committed, false when it was a replay
    * no-op.
    */
  def upsertBatch(table: Path, keyCol: String, partCol: String)(
      batch: DataFrame, batchId: Long): Boolean =
    if (committed(table, batchId)) false
    else {
      SnapStore.merge(batch.sparkSession, table, batch, keyCol, partCol,
        operation = epochTag(batchId))
      true
    }
}
