package graft

import java.nio.file.Files
import graft.operators.{IncrementalAnnIndex, Similarity}
import graft.plans.BucketedMergeWriter
import org.apache.spark.sql.functions._

/** Persisted IVF index: batch-by-batch ingestion must serve exactly the
  * results a one-shot annIvfWith over the accumulated corpus serves
  * (same frozen centroids), replays must not corrupt the index, and the
  * centroid geometry must be immutable after the first build. */
class IncrementalAnnSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
    .localCheckpoint(true)
  private lazy val queries = emb.filter(col("vec_id") < 12)

  private def mkIndex() = new IncrementalAnnIndex(
    new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-inc-ann").toString, nBuckets = 4),
    "vecs", nCells = 16)

  private def resultSet(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("cos"), r.getAs[Long]("rank"))).toSet

  test("3-batch ingest serves exactly what one-shot annIvfWith serves; replay is idempotent") {
    val idx = mkIndex()
    val cents = idx.ensureCentroids(emb, lloydIters = 2).localCheckpoint(true)

    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val (b1, b2, b3) = (ids.take(ids.length / 3).toSet,
      ids.slice(ids.length / 3, 2 * ids.length / 3).toSet,
      ids.drop(2 * ids.length / 3).toSet)
    def slice(s: Set[Long]) = emb.filter(col("vec_id").isin(s.toSeq: _*))
    idx.ingest(slice(b1)); idx.ingest(slice(b2)); idx.ingest(slice(b3))

    val got = resultSet(idx.search(queries, k = 5, nProbe = 4))
    val want = resultSet(Similarity.annIvfWith(cents, queries, emb, k = 5, nProbe = 4))
    assert(got === want, "stored-index search must equal one-shot IVF over the union")
    assert(got.nonEmpty, "fixture sanity")

    // replay a middle batch: MERGE on vec_id leaves the index unchanged
    idx.ingest(slice(b2))
    assert(resultSet(idx.search(queries, k = 5, nProbe = 4)) === want,
      "re-ingesting a batch must not change search results")

    // maintenance bounds on-disk versions without changing contents
    idx.maintain()
    assert(resultSet(idx.search(queries, k = 5, nProbe = 4)) === want,
      "vacuum must not change search results")
  }

  test("centroid geometry is frozen after the first build") {
    val idx = mkIndex()
    val first = idx.ensureCentroids(emb, lloydIters = 0)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // second call with a DIFFERENT corpus sample must return the stored set
    val second = idx.ensureCentroids(emb.filter(col("vec_id") >= 100), lloydIters = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(second === first, "ensureCentroids must never retrain an existing geometry")
  }

  test("search and ingest fail loudly on an unbuilt index") {
    val idx = mkIndex()
    intercept[IllegalArgumentException] { idx.ingest(emb) }
    intercept[IllegalArgumentException] { idx.search(queries, 5, 4) }
  }
}
