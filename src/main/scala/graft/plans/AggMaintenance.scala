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
  * count stays bounded via [[compact]], which folds history up to a
  * caller-chosen watermark into one reserved slice whose id ENCODES that
  * watermark, so a batch replayed AFTER its slice was folded is absorbed
  * too (skipped — its contribution already lives in the fold) instead of
  * double-added. Reads sum O(keys + unfolded batches) rows, not
  * O(history).
  *
  * Cost per batch: the delta is already one aggregated row per touched
  * key, and the store's bucketed mergeFact prunes to touched buckets —
  * O(delta) writes at any table size.
  *
  * WRITER MODEL: one maintenance thread per rollup table — upsertSlice
  * and compact from the same serial loop (exactly what foreachBatch
  * gives). compact's read-fold-replace is not atomic against a concurrent
  * upsertSlice on the SAME table: a slice committed between the fold's
  * read and the table swap would be erased. (The store's CAS protects
  * manifest integrity and other tables' writers, not this read-to-replace
  * window.)
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

  /** Compacted-slice id for fold watermark `upTo`: always negative, so it
    * never collides with a (non-negative) batch id, and decodable so
    * upsertSlice can recognize an already-folded batch. */
  private def foldedSliceId(upTo: Long): Long = -upTo - 2
  private def foldWatermark(minSliceId: Long): Long =
    if (minSliceId <= -2) -minSliceId - 2 else -1L

  /** Upsert one micro-batch's partial aggregate (one row per key in
    * `delta`) under the batch's slice id. Replays are absorbed BOTH ways:
    * a live slice is overwritten (same composite key), and a batch whose
    * slice was already folded by [[compact]] is skipped entirely — its
    * contribution lives in the compacted slice, and re-adding it would
    * double-count. */
  def upsertSlice(store: TableStore, name: String, delta: DataFrame,
                  keys: Seq[String], batchId: Long): DataFrame = {
    require(batchId >= 0, s"batch ids are non-negative (got $batchId); " +
      "negative ids are reserved for compacted slices")
    if (store.exists(name)) {
      val minSlice = Option(store.read(name).agg(min(col(batchCol))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      if (batchId <= foldWatermark(minSlice)) return store.read(name)
    }
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

  /** Fold the compacted slice plus every batch slice with id ≤ `upTo`
    * into a new compacted slice (id encodes `upTo`); newer slices stay as
    * they are. `upTo` must be a REPLAY-SAFE watermark — a batch id the
    * streaming checkpoint has durably passed — because a batch folded
    * here can no longer be re-delivered distinguishably. Uses the store's
    * atomic `replaceTable` (merge semantics cannot DELETE superseded
    * slices); a crash mid-compaction leaves the previous state. Folding
    * twice at the same watermark is a no-op. */
  def compact(store: TableStore, name: String, keys: Seq[String],
              addCols: Seq[String], upTo: Long): Unit = {
    require(upTo >= 0, s"fold watermark must be a batch id (got $upTo)")
    val all = store.read(name)
    // the watermark never moves backwards: folding at a lower upTo than a
    // previous fold would re-open already-folded batch ids to double-adds
    val minSlice = Option(all.agg(min(col(batchCol))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val eff = math.max(upTo, foldWatermark(minSlice))
    val foldable = all.filter(col(batchCol) <= eff) // includes compacted ids (< 0)
    val rest = all.filter(col(batchCol) > eff)
    val folded = foldable
      .groupBy(keys.map(col): _*)
      .agg(sum(col(addCols.head)).as(addCols.head),
        addCols.tail.map(c => sum(col(c)).as(c)): _*)
      .withColumn(batchCol, lit(foldedSliceId(eff)))
    store.replaceTable(name,
      folded.select((keys :+ batchCol).map(col) ++ addCols.map(col): _*)
        .unionByName(rest.select((keys :+ batchCol).map(col) ++ addCols.map(col): _*)),
      keys :+ batchCol)
  }
}
