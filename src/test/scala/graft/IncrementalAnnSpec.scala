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
  import spark.implicits._

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

  test("StreamingAnn: a vector stream indexes continuously; replays leave the index exact") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val idx = mkIndex()
    val cents = idx.ensureCentroids(emb, lloydIters = 0).localCheckpoint(true)
    val ckpt = Files.createTempDirectory("graft-stream-ann-ckpt").toString

    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val in = MemoryStream[(Long, Array[Float])]
    val vectors = in.toDF().toDF("vec_id", "embedding")
    def drain(): Unit = {
      val q = graft.streaming.StreamingAnn.start(vectors, idx, ckpt)
      q.awaitTermination() // AvailableNow: stops once the backlog drains
    }
    val half = rows.length / 2
    in.addData(rows.take(half): _*)
    in.addData(rows.drop(half): _*)
    drain()
    val want = resultSet(Similarity.annIvfWith(cents, queries, emb, k = 5, nProbe = 4))
    assert(resultSet(idx.search(queries, k = 5, nProbe = 4)) === want,
      "streamed index must serve exactly the one-shot results")

    // replay the second half from a FRESH checkpoint: MERGE absorbs it
    val nAssigned = idx.store.read(idx.assignTable).count()
    val ckpt2 = Files.createTempDirectory("graft-stream-ann-ckpt2").toString
    val in2 = MemoryStream[(Long, Array[Float])]
    in2.addData(rows.drop(half): _*)
    val q2 = graft.streaming.StreamingAnn.start(
      in2.toDF().toDF("vec_id", "embedding"), idx, ckpt2)
    q2.awaitTermination()
    assert(idx.store.read(idx.assignTable).count() === nAssigned,
      "replayed micro-batch must leave the assignment table unchanged")
    assert(resultSet(idx.search(queries, k = 5, nProbe = 4)) === want)
  }

  test("StreamingAnn refuses to start without a centroid geometry") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val idx = mkIndex()
    val in = MemoryStream[(Long, Array[Float])]
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingAnn.start(in.toDF().toDF("vec_id", "embedding"),
        idx, Files.createTempDirectory("graft-stream-ann-ckpt3").toString)
    }
  }
}
