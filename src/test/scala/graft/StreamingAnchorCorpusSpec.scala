package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Html
import graft.plans.BucketedMergeWriter
import graft.streaming.{ContentRegistry, StreamingAnchorCorpus}

/** StreamingAnchorCorpus on the ContentRegistry primitive: batch
  * equivalence across slicing, re-crawl retirement of stale anchor
  * texts, the crash-window old-state invariant, and compaction. */
class StreamingAnchorCorpusSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val pagesAll = Seq(
    (1L, "www.s0.com",
      "<a href=\"https://www.t.org/p\">Great Docs</a>" +
        "<a href=\"/x\">Home</a>"),
    (2L, "www.s1.com", "<a href=\"https://www.t.org/q\">Great Docs</a>"),
    (3L, "www.s0.com", "<a href=\"//cdn.t.org/l\">CDN &amp; Mirror</a>"))

  private def drain(in: MemoryStream[(Long, String, String)],
                    store: BucketedMergeWriter, ckpt: String): Unit = {
    val q = StreamingAnchorCorpus.start(
      in.toDF().toDF("doc_id", "src_host", "html"), store,
      "anchors", "anchor_docs", ckpt)
    q.awaitTermination()
  }

  private def corpus(store: BucketedMergeWriter) =
    StreamingAnchorCorpus.readAnchors(store, "anchors", "anchor_docs")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_anchors"), r.getAs[Long]("n_src_domains"))).toMap

  private def batchMap(pages: Seq[(Long, String, String)]) =
    Html.anchorTexts(pages.toDF("doc_id", "src_host", "html")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_anchors"), r.getAs[Long]("n_src_domains"))).toMap

  test("streamed slices fold to the batch operator; re-crawl retires stale texts") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-ac").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-ac-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData(pagesAll.take(2): _*)
    drain(in, store, ckpt)
    in.addData(pagesAll.drop(2): _*)
    drain(in, store, ckpt)
    val streamed = corpus(store)
    assert(streamed === batchMap(pagesAll))
    assert(streamed(("t.org", "Great Docs")) === ((2L, 2L)),
      "two independent source domains reinforce one description")
    assert(streamed(("t.org", "CDN & Mirror"))._1 === 1L, "entity decoded")

    // doc 2's re-crawl REWORDS its anchor: the old text must vanish
    val recrawl = (2L, "www.s1.com",
      "<a href=\"https://www.t.org/q\">Updated Docs</a>")
    in.addData(recrawl)
    drain(in, store, ckpt)
    val settled = pagesAll.filterNot(_._1 == 2L) :+ recrawl
    assert(corpus(store) === batchMap(settled))
    assert(corpus(store)(("t.org", "Great Docs")) === ((1L, 1L)),
      "doc 2's old wording no longer counts")
    assert(corpus(store).contains(("t.org", "Updated Docs")))

    // compaction reclaims doc 2's dark generation without moving the fold
    val before = store.read("anchors").count()
    StreamingAnchorCorpus.compact(store, "anchors", "anchor_docs")
    assert(store.read("anchors").count() < before)
    assert(corpus(store) === batchMap(settled))
  }

  test("crash between the anchor merge and the doc flip shows the complete OLD state") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-ac2").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-ac2-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData(pagesAll: _*)
    drain(in, store, ckpt)
    val oldState = corpus(store)

    // re-crawl KEEPS one text and adds another — the common row is the
    // regression surface (r15 ADVICE class, now guarded in the shared
    // primitive)
    val recrawl = Seq((1L, "www.s0.com",
      "<a href=\"https://www.t.org/p\">Great Docs</a>" +
        "<a href=\"https://www.t.org/n\">New Section</a>"))
    val w = ContentRegistry.fingerprinted(
      recrawl.toDF("doc_id", "src_host", "html"), Seq("src_host", "html"))
    val slice = Html.anchorTextsByDoc(w)
      .join(w.select($"doc_id", $"content_fp"), Seq("doc_id"))
    store.mergeFact("anchors", slice,
      Seq("src_domain", "dst_domain", "anchor_text", "doc_id", "content_fp"))
    assert(corpus(store) === oldState,
      "half-applied batch must read as the complete OLD generation")
    store.mergeFact("anchor_docs",
      w.select($"doc_id", $"content_fp"), Seq("doc_id"))
    val settled = pagesAll.filterNot(_._1 == 1L) ++ recrawl
    assert(corpus(store) === batchMap(settled))
    assert(corpus(store)(("t.org", "Great Docs")) === ((2L, 2L)),
      "the kept text survives the generation flip")
  }
}
