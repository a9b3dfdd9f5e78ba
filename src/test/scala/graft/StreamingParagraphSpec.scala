package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup
import graft.plans.BucketedMergeWriter
import graft.streaming.StreamingParagraphDedup

/** StreamingParagraphDedup: batch equivalence under id-ordered arrival,
  * cross-batch ownership, and replay stability from a fresh checkpoint
  * (the ownership clause, not a batch-id watermark). */
class StreamingParagraphSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val docsAll = Seq(
    (1L, "alpha one\n\nSHARED FOOTER\n\nbody a"),
    (2L, "beta two\n\nshared footer\n\nbody b"),
    (3L, "gamma\n\ngamma"),
    (4L, "delta\n\nshared footer\n\nbody d"),
    (5L, "SHARED footer")
  )

  private def drain(in: MemoryStream[(Long, String)], store: BucketedMergeWriter,
                    ckpt: String): Unit = {
    val q = StreamingParagraphDedup.start(
      in.toDF().toDF("doc_id", "text"), store, "para_registry",
      "para_verdicts", ckpt)
    q.awaitTermination()
  }

  private def verdictMap(store: BucketedMergeWriter) =
    store.read("para_verdicts").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          Option(r.getAs[String]("kept_md5")))).toMap

  test("id-ordered batches reproduce the batch operator exactly; replay is a no-op") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-para").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-para-ckpt").toString
    val in = MemoryStream[(Long, String)]
    in.addData(docsAll.take(2): _*)
    drain(in, store, ckpt)
    in.addData(docsAll.drop(2): _*)
    drain(in, store, ckpt)

    val streamed = verdictMap(store)
    val batch = Dedup.paragraphDedup(docsAll.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          Option(r.getAs[String]("kept_md5")))).toMap
    assert(streamed === batch,
      "id-ordered streaming must equal the batch operator verdict-for-verdict")
    assert(streamed(5L)._2 === 0L && streamed(5L)._3.isEmpty,
      "the all-duplicate doc rebuilds to NULL across batches too")
    assert(store.read("para_registry").count() ===
      batch.values.map(_._2).sum, "registry = one row per kept paragraph")

    // fresh-checkpoint replay of the SECOND batch: ownership absorbs it
    val in2 = MemoryStream[(Long, String)]
    in2.addData(docsAll.drop(2): _*)
    drain(in2, store, Files.createTempDirectory("graft-para-ckpt2").toString)
    assert(verdictMap(store) === streamed, "replayed docs re-derive identical verdicts")
    assert(store.read("para_registry").count() ===
      batch.values.map(_._2).sum, "replay mints no new registry rows")
  }
}
