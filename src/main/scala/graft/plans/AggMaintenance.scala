package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent incremental aggregate maintenance — the streaming-warehouse
  * pattern for keeping an additive rollup (e.g. revenue by day) current
  * without re-aggregating the base table per micro-batch.
  *
  * Additive merges are NOT naturally idempotent: replaying a micro-batch
  * after a checkpoint restart would double-add its delta. The classic fix
  * (applied here): store per-(key, batch) PARTIAL aggregates, merged on
  * the composite key — a replayed batch overwrites its own slice instead
  * of adding to it — and read the rollup as a tiny sum over slices. Slice
  * count stays bounded via [[compact]], which folds history into one
  * slice under a reserved batch id (idempotent: folding twice is a
  * no-op), so reads sum O(keys + recent batches) rows, not O(history).
  *
  * Cost per batch: the delta is already one aggregated row per touched
  * key, and the store's bucketed mergeFact prunes to touched buckets —
  * O(delta) writes at any table size.
  *
  * SCOPE: `delta` must be a PURE FUNCTION OF THE BATCH CONTENT (the
  * insert-only/event-stream case) — that is what makes a replayed batch
  * write the identical slice. Retraction-based maintenance over an
  * UPSERT stream (e.g. the star's last-write-wins fact) would need the
  * delta computed against the pre-batch table state, and a crash between
  * the fact commit and the slice commit would lose or double the
  * retraction — exact-once there requires an atomic cross-table commit
  * the file store deliberately does not promise. Derive such rollups as
  * queries over the merged fact instead (always consistent, e.g. q10).
  */
object AggMaintenance {

  private val batchCol = "_slice"
  private val compactedSliceId = -1L

  /** Upsert one micro-batch's partial aggregate (one row per key in
    * `delta`) under the batch's slice id. Replays of the same batch id
    * are absorbed (same composite key → overwrite). */
  def upsertSlice(store: TableStore, name: String, delta: DataFrame,
                  keys: Seq[String], batchId: Long): DataFrame = {
    require(batchId >= 0, s"batch ids are non-negative (got $batchId); " +
      s"$compactedSliceId is reserved for the compacted slice")
    store.mergeFact(name, delta.withColumn(batchCol, lit(batchId)),
      keys :+ batchCol)
  }

  /** The current rollup: sum the named additive columns across slices. */
  def read(store: TableStore, name: String, keys: Seq[String],
           addCols: Seq[String]): DataFrame =
    store.read(name)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(addCols.head)).as(addCols.head),
        addCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** Fold every slice into the reserved compacted slice, so reads sum
    * O(keys) rows instead of O(history). Uses the store's atomic
    * `replaceTable` (merge semantics cannot DELETE superseded slices —
    * delete-by-omission needs a table swap): the fold is fully
    * materialized before any write, and the swap is the store's usual
    * pointer commit, so a crash leaves the previous state. Running it
    * twice in a row is a no-op (the fold of one slice is itself). */
  def compact(store: TableStore, name: String, keys: Seq[String],
              addCols: Seq[String]): Unit = {
    val folded = read(store, name, keys, addCols)
      .withColumn(batchCol, lit(compactedSliceId))
      .localCheckpoint(true) // read state fully before rewriting it
    store.replaceTable(name, folded, keys :+ batchCol)
  }
}
