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

    // COALESCED replay: all docs in ONE batch — the registered owner of a
    // shared fingerprint may now rank BEHIND an earlier-id doc inside the
    // batch (doc 2's footer row ranks before doc 5's 'SHARED footer'),
    // and ownership, not batch rank, must decide
    val in3 = MemoryStream[(Long, String)]
    in3.addData(docsAll: _*)
    drain(in3, store, Files.createTempDirectory("graft-para-ckpt3").toString)
    assert(verdictMap(store) === streamed,
      "a coalesced full replay must not flip any verdict")
    assert(store.read("para_registry").count() ===
      batch.values.map(_._2).sum, "coalesced replay mints no new registry rows")
  }

  test("ownership beats batch rank: an owner arriving late in a coalesced replay keeps its paragraph") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-para-oo").toString, nBuckets = 4)
    // doc 9 arrives FIRST and owns the shared paragraph
    val in = MemoryStream[(Long, String)]
    in.addData((9L, "unique nine\n\ncommon block"))
    drain(in, store, Files.createTempDirectory("graft-para-oo-c1").toString)
    val in2 = MemoryStream[(Long, String)]
    in2.addData((2L, "unique two\n\ncommon block"))
    drain(in2, store, Files.createTempDirectory("graft-para-oo-c2").toString)
    val before = verdictMap(store)
    assert(before(9L)._2 === 2L && before(2L)._2 === 1L,
      "first arrival owns; the later lower-id doc loses the shared block")
    // coalesced replay of BOTH docs: doc 2's row ranks FIRST (lower id)
    // inside the batch, but doc 9 is the registered owner and must win
    val in3 = MemoryStream[(Long, String)]
    in3.addData((9L, "unique nine\n\ncommon block"), (2L, "unique two\n\ncommon block"))
    drain(in3, store, Files.createTempDirectory("graft-para-oo-c3").toString)
    assert(verdictMap(store) === before,
      "replay must preserve the first-ARRIVAL owner, not re-race by doc id")
  }
}
