package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Dedup, Html}
import graft.plans.BucketedMergeWriter
import graft.streaming.StreamingLinkGraph

/** StreamingLinkGraph: batch equivalence across arbitrary batch slicing,
  * replay stability from a FRESH checkpoint with different slicing, and —
  * the r14 ADVICE fix — a CHANGED re-crawl whose content dropped a link:
  * the fingerprint-ownership registry must make the doc's stale edge rows
  * go dark, so the fold equals the batch operator over LATEST content. */
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
      in.toDF().toDF("doc_id", "src_host", "html"), store,
      "edges", "edge_docs", ckpt)
    q.awaitTermination()
  }

  private def edgeMap(store: BucketedMergeWriter) =
    StreamingLinkGraph.readEdges(store, "edges", "edge_docs").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_docs"))).toMap

  private def batchMap(pages: Seq[(Long, String, String)]) =
    Html.linkEdges(pages.toDF("doc_id", "src_host", "html")).collect()
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
    assert(streamed === batchMap(pagesAll),
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

  test("a changed re-crawl retires the doc's stale edges (fingerprint ownership)") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-lg-rc").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-lg-rc-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData(pagesAll: _*)
    drain(in, store, ckpt)

    // doc 2 re-crawled: the b.org link is GONE, a c.net link appeared,
    // and the page moved hosts (src_host changed) — every prior
    // contribution of doc 2 must vanish from the fold
    val recrawl = (2L, "shop.a.co.uk",
      "<a href=\"https://www.c.net/x\">z</a>")
    in.addData(recrawl)
    drain(in, store, ckpt)

    val settled = pagesAll.filterNot(_._1 == 2L) :+ recrawl
    assert(edgeMap(store) === batchMap(settled),
      "fold must equal the batch operator over each doc's LATEST content")
    assert(edgeMap(store)(("a.co.uk", "b.org")) === ((1L, 1L)),
      "doc 2's dropped b.org link must no longer reinforce the edge")
    assert(edgeMap(store).contains(("a.co.uk", "c.net")))

    // byte-identical re-delivery of the re-crawl: a no-op
    val ckpt2 = Files.createTempDirectory("graft-lg-rc-ckpt2").toString
    val in2 = MemoryStream[(Long, String, String)]
    in2.addData(recrawl)
    drain(in2, store, ckpt2)
    val after = edgeMap(store)
    assert(after === batchMap(settled))

    // compaction rewrites the registry to live rows only — fold unchanged
    val rawBefore = store.read("edges").count()
    StreamingLinkGraph.compact(store, "edges", "edge_docs")
    assert(store.read("edges").count() < rawBefore,
      "doc 2's dark rows must be physically reclaimed")
    assert(edgeMap(store) === after, "compaction never changes the fold")
  }

  test("crash between the edge merge and the doc merge leaves the OLD state fully visible") {
    // The r15 ADVICE finding: under a (src, dst, doc)-keyed edge merge, an
    // edge present in BOTH the old and new content had its content_fp
    // overwritten by the edge merge while the doc registry still held the
    // old fingerprint — a reader mid-window saw the doc MISSING edges it
    // had in both generations (neither old nor new state). With content_fp
    // in the merge key the edge rows are insert-only per generation, so
    // the half-applied window shows exactly the old state.
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-lg-crash").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-lg-crash-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData(pagesAll: _*)
    drain(in, store, ckpt)
    val oldState = edgeMap(store)

    // re-crawl of doc 2 KEEPS the b.org link (common to both generations)
    // and adds a c.net one — the common edge is the regression surface
    val recrawl = Seq((2L, "www.a.co.uk",
      "<a href=\"http://www.b.org/2\">y</a><a href=\"https://www.c.net/x\">z</a>"))
    val w = recrawl.toDF("doc_id", "src_host", "html")
      .withColumn("content_fp",
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.coalesce($"html",
            org.apache.spark.sql.functions.lit(""))))
    val slice = Html.linkEdgesByDoc(w)
      .join(w.select($"doc_id", $"content_fp"), Seq("doc_id"))
    // the batch body's FIRST merge only — simulating a crash before the
    // doc merge (same key set as StreamingLinkGraph.start)
    store.mergeFact("edges", slice,
      Seq("src_domain", "dst_domain", "doc_id", "content_fp"))
    assert(edgeMap(store) === oldState,
      "half-applied batch must read as the complete OLD generation")

    // the doc merge lands (replay completes the flip): new state visible
    store.mergeFact("edge_docs",
      w.select($"doc_id", $"content_fp"), Seq("doc_id"))
    val settled = pagesAll.filterNot(_._1 == 2L) ++ recrawl
    assert(edgeMap(store) === batchMap(settled),
      "after the doc flip the fold equals the batch operator over LATEST content")
    assert(edgeMap(store)(("a.co.uk", "b.org")) === ((2L, 2L)),
      "the common edge survives the generation flip")
  }

  test("PageRank over the settled registry equals the batch walk (the q264 readout)") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-lg-pr").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-lg-pr-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData(pagesAll.take(2): _*)
    drain(in, store, ckpt)
    in.addData(pagesAll.drop(2): _*)
    drain(in, store, ckpt)
    // recompute-on-epoch policy: the PR prior is a deterministic function
    // of the settled edge fold, so the streaming readout replays the
    // batch q264 walk bit-for-bit — replay-stable because readEdges is
    val prStream = Dedup.pageRankDirected(
      StreamingLinkGraph.readEdges(store, "edges", "edge_docs"),
      "src_domain", "dst_domain", iterations = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val prBatch = Dedup.pageRankDirected(
      Html.linkEdges(pagesAll.toDF("doc_id", "src_host", "html")),
      "src_domain", "dst_domain", iterations = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prStream === prBatch,
      "decimal-exact contributions: bit-identical, not approximately equal")
  }
}
