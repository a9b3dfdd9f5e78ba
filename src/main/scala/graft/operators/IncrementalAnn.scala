package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.TableStore
import graft.Materialize.MaterializeOps

/** Persisted IVF similarity index over a GROWING embedding corpus — the
  * operational shape of vector search at 100 TB, parallel to
  * [[IncrementalDedupIndex]]: a pipeline embeds documents continuously
  * and must serve top-k queries against everything ingested WITHOUT
  * re-reading or re-assigning the corpus. Two tables persist in a
  * [[TableStore]] (atomic manifest commits, idempotent MERGE, vacuum —
  * the same guarantees every other graft table gets):
  *
  *   - `{table}_ivf_centroids` — (cell, cvec): the partition geometry,
  *     trained ONCE (Lloyd via [[Similarity.trainIvfCentroids]], or the
  *     deterministic first-`nCells` seed) and then FROZEN — assignments
  *     made under different centroid sets are incomparable, so growing
  *     corpora keep the geometry and retrain = rebuild (the production
  *     IVF contract; FAISS's add-vs-train split);
  *   - `{table}_ivf_assign` — (vec_id, cell, embedding): each vector's
  *     nearest-cell assignment, accreted batch by batch.
  *
  * [[ingest]] assigns ONLY the batch (one broadcast of the ≤nCells
  * centroid table, map-only scoring, no shuffle of the stored corpus)
  * and MERGEs on vec_id — replays update-in-place, so at-least-once
  * delivery upstream leaves the index correct. [[search]] probes
  * `nProbe` cells per query and scans only the matching assignment
  * partitions — identical results to [[Similarity.annIvfWith]] over the
  * accumulated corpus with the same centroids (equivalence-tested).
  *
  * Scale notes: the assignment table is exactly the frame a deployment
  * would bucket on `cell` (plans/Bucketing) to make the probe a
  * co-located, shuffle-free read; search cost is queries × nProbe cells
  * × (corpus/nCells expected occupancy), never the corpus.
  */
class IncrementalAnnIndex(val store: TableStore, table: String, nCells: Int,
                          idCol: String = "vec_id", vecCol: String = "embedding") {
  require(nCells >= 1, "nCells must be positive")
  val centroidTable = s"${table}_ivf_centroids"
  val assignTable = s"${table}_ivf_assign"

  /** Train-or-load the frozen centroid set: the first call trains on the
    * given corpus sample (`lloydIters` Lloyd rounds; 0 = the
    * deterministic seed variant) and persists; every later call returns
    * the STORED table untouched, whatever is passed — geometry is
    * immutable once built. */
  def ensureCentroids(corpusSample: DataFrame, lloydIters: Int = 2): DataFrame = {
    if (!store.exists(centroidTable)) {
      val cents =
        if (lloydIters > 0)
          Similarity.trainIvfCentroids(corpusSample, nCells, lloydIters, idCol, vecCol)
        else
          corpusSample.orderBy(col(idCol)).limit(nCells)
            .select(col(idCol).cast("int").as("cell"),
              col(vecCol).cast("array<double>").as("cvec"))
      store.replaceTable(centroidTable, cents, Seq("cell"))
    }
    store.read(centroidTable)
  }

  /** Assign the batch to its nearest stored centroid and MERGE into the
    * assignment table (idempotent on vec_id). Returns the batch's
    * (vec_id, cell) assignments. */
  def ingest(batch: DataFrame): DataFrame = {
    require(store.exists(centroidTable),
      s"no centroid table '$centroidTable' — call ensureCentroids first")
    val cents = store.read(centroidTable)
    val assigned = Similarity.nearestCellsWith(cents,
        batch.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        "vec_id", "embedding", "cell", 1)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .materialized // pre-date the commit, like the dedup index
    store.mergeFact(assignTable, assigned, Seq("vec_id"))
    assigned.select(col("vec_id"), col("cell"))
  }

  /** Top-k cosine neighbors for each query against EVERYTHING ingested:
    * probe the `nProbe` nearest cells per query, score only co-located
    * assignments, rank on round(cos, 6) with the id tie-break — the
    * [[Similarity.annIvfWith]] contract over the stored corpus. */
  def search(queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    require(store.exists(centroidTable) && store.exists(assignTable),
      "index is empty — ensureCentroids + ingest first")
    val cents = store.read(centroidTable)
    val corpus = store.read(assignTable)
      .select(col("vec_id").as("neighbor_id"), col("cell").as("cell_id"),
        col("embedding").as("cv"))
    val qProbed = Similarity.nearestCellsWith(cents,
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", "cell_id", nProbe)
    val scored = qProbed.join(corpus, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.score(col("qv"), col("cv")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Reclaim superseded versions of both tables (see
    * [[IncrementalDedupIndex.maintain]]). */
  def maintain(retainMillis: Long = 0L): Unit = {
    if (store.exists(centroidTable)) store.vacuum(centroidTable, retainMillis)
    if (store.exists(assignTable)) store.vacuum(assignTable, retainMillis)
  }
}
