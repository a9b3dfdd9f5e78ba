package graft.plans

import org.apache.spark.sql.DataFrame

/** Storage contract for the star tables: idempotent MERGE semantics with
  * stable surrogate keys. Two implementations:
  *
  *   - [[MergeWriter]]: versioned whole-table parquet + atomic pointer
  *     flip. Simple, atomic, time-travelable — but write amplification is
  *     O(table) per batch.
  *   - [[BucketedMergeWriter]]: natural-key hash buckets as parquet
  *     partitions; a merge rewrites ONLY touched buckets (dynamic
  *     partition overwrite + partition pruning on read), so per-batch
  *     write cost is O(touched buckets) ≈ O(batch × table/buckets) — the
  *     100 TB-viable shape. On a production cluster the same interface
  *     maps directly onto Delta/Iceberg `MERGE INTO`.
  */
trait TableStore {
  def exists(name: String): Boolean
  def read(name: String): DataFrame
  def mergeDim(name: String, batch: DataFrame, natKey: Seq[String], skCol: String): DataFrame
  def mergeFact(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame
  def appendTable(name: String, batch: DataFrame): DataFrame

  /** Atomically replace the table's ENTIRE contents with `batch` (same
    * pointer-commit atomicity as a merge). Merges cannot delete rows by
    * omission, so whole-table rewrites (aggregate-slice compaction,
    * dimension rebuilds) need this. `natKey` drives storage layout
    * (bucketing) where the implementation has one.
    *
    * Contract (both stores): `batch` must be NON-EMPTY — an empty replace
    * is rejected, not treated as truncation (drop the table directory to
    * truncate). The swap is atomic, but the replacement contents are the
    * CALLER's snapshot: serialize replaceTable against concurrent writers
    * of the same table whose commits must not be superseded. */
  def replaceTable(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame

  /** Reclaim storage for versions no longer referenced by the table's
    * manifest and older than `retainMillis` — the maintenance half of the
    * MERGE story (merges supersede versions; something must delete them
    * or history grows without bound). Default 0 is the quiesced mode:
    * reclaim everything dead now. Safe concurrently with ingestion as
    * long as no reader holds a resolved frame longer than the retention. */
  def vacuum(name: String, retainMillis: Long = 0L): Unit
}
