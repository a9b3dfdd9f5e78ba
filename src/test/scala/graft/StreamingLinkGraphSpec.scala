package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Html
import graft.plans.BucketedMergeWriter
import graft.streaming.StreamingLinkGraph

/** StreamingLinkGraph: batch equivalence across arbitrary batch slicing,
  * and replay stability from a FRESH checkpoint with different slicing —
  * the content-keyed registry (src, dst, doc) needs no batch-id
  * watermark, so re-delivery in any batching must be absorbed. */
class StreamingLinkGraphSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // covers: cross-domain, self-edge (root-relative), protocol-relative,
  // dropped mailto, a second doc reinforcing an existing edge
  private val pagesAll = Seq(
    (1L, "news.a.co.uk",
      "<a href=\"http://www.b.org/1\">x</a><a href=\"/nav\">n</a>"),
    (2L, "www.a.co.uk",
      "<a href=\"http://www.b.org/2\">y</a><a href=\"mailto:z@b.org\">m</a>"),
    (3L, "www.b.org", "<a href=\"//cdn.a.co.uk/l.js\">c</a>"),
    (4L, "blog.b.org", "<a href=\"https://www.a.co.uk/p\">w</a>"))

  private def drain(in: MemoryStream[(Long, String, String)],
                    store: BucketedMergeWriter, ckpt: String): Unit = {
    val q = StreamingLinkGraph.start(
      in.toDF().toDF("doc_id", "src_host", "html"), store, "edges", ckpt)
    q.awaitTermination()
  }

  private def edgeMap(store: BucketedMergeWriter) =
    StreamingLinkGraph.readEdges(store, "edges").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_docs"))).toMap

  test("streamed slices fold to the batch operator; fresh-checkpoint replay is a no-op") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-lg").toString, nBuckets = 4)
    val ckpt1 = Files.createTempDirectory("graft-lg-ckpt1").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData(pagesAll.take(1): _*) // 1|3 split
    drain(in, store, ckpt1)
    in.addData(pagesAll.drop(1): _*)
    drain(in, store, ckpt1)

    val streamed = edgeMap(store)
    val batch = Html.linkEdges(
      pagesAll.toDF("doc_id", "src_host", "html")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_docs"))).toMap
    assert(streamed === batch,
      "the registry fold must equal the batch operator edge-for-edge")
    assert(streamed(("a.co.uk", "b.org")) === ((2L, 2L)),
      "two docs reinforce one directed edge")

    // FRESH checkpoint, DIFFERENT slicing (all four in one batch): every
    // (src, dst, doc) row overwrites itself — counts must not move
    val ckpt2 = Files.createTempDirectory("graft-lg-ckpt2").toString
    val in2 = MemoryStream[(Long, String, String)]
    in2.addData(pagesAll: _*)
    drain(in2, store, ckpt2)
    assert(edgeMap(store) === streamed,
      "content-keyed merge must absorb re-delivery under new batching")
  }
}
