package graft

import java.nio.file.Files
import graft.operators.IncrementalDedupIndex
import graft.plans.BucketedMergeWriter

/** Incremental near-dup index: batch-by-batch ingestion must find exactly
  * the pairs a one-shot build finds, including pairs that SPAN batches,
  * and replays must not corrupt the index. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // three exact-dup groups spread across batches + singletons
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely different text about spark engines and data processing"),
    (3L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1
    (4L, "watermarked windows bound the state of streaming aggregation jobs"),
    (5L, "watermarked windows bound the state of streaming aggregation jobs"), // dup of 4
    (6L, "the quick brown fox jumps over the lazy dog tonight")  // dup of 1 & 3
  )
  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def mkIndex() = new IncrementalDedupIndex(
    new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-inc-dedup").toString, nBuckets = 4),
    "docs", n = 3, k = 12, bands = 4, threshold = 0.5)

  private def pairSet(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batch-by-batch union equals the one-shot build; cross-batch pairs found") {
    val oneShot = pairSet(mkIndex().ingest(df(corpus)))
    assert(oneShot === Set((1L, 3L), (1L, 6L), (3L, 6L), (4L, 5L)),
      s"one-shot fixture pairs: $oneShot")

    val inc = mkIndex()
    val p1 = pairSet(inc.ingest(df(corpus.slice(0, 2)))) // docs 1, 2
    val p2 = pairSet(inc.ingest(df(corpus.slice(2, 4)))) // docs 3, 4
    val p3 = pairSet(inc.ingest(df(corpus.slice(4, 6)))) // docs 5, 6
    assert(p1 === Set.empty, "no pairs within the first batch")
    assert(p2 === Set((1L, 3L)), "cross-batch pair surfaces when doc 3 arrives")
    assert(p3 === Set((4L, 5L), (1L, 6L), (3L, 6L)),
      s"doc 5 pairs with indexed 4; doc 6 with indexed 1 and 3: $p3")
    assert((p1 ++ p2 ++ p3) === oneShot, "incremental union ≡ one-shot")
  }

  test("replaying a batch re-emits its pairs but leaves the index unchanged") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-inc-dedup2").toString, nBuckets = 4)
    val idx = new IncrementalDedupIndex(store, "docs", 3, 12, 4, 0.5)
    idx.ingest(df(corpus.slice(0, 4)))
    val sigCount = store.read(idx.sigTable).count()
    val bandCount = store.read(idx.bandTable).count()
    val replayed = idx.ingest(df(corpus.slice(2, 4))) // replay batch 2
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(store.read(idx.sigTable).count() === sigCount, "sig rows unchanged")
    assert(store.read(idx.bandTable).count() === bandCount, "band rows unchanged")
    assert(replayed.toSet === Set((1L, 3L)), "replay re-emits, never corrupts")
    // a replayed doc sits in both the store and the batch — it must not
    // double the signature join or the bucket occupancy count
    assert(replayed.length === 1, s"replay must not emit duplicate rows: ${replayed.toSeq}")
  }

  test("maintain() bounds on-disk versions without changing the index") {
    val root = Files.createTempDirectory("graft-inc-dedup3").toString
    val store = new BucketedMergeWriter(spark, root, nBuckets = 4)
    val idx = new IncrementalDedupIndex(store, "docs", 3, 12, 4, 0.5)
    def versionDirs(table: String): Int = store.onDiskVersionDirs(table).size
    // full-corpus ingest + 2 replays: every live bucket is rewritten each
    // time, so exactly one version per ingest accretes and only the
    // newest is live afterwards
    (1 to 3).foreach(_ => idx.ingest(df(corpus)))
    assert(versionDirs(idx.bandTable) === 3,
      s"expected 3 pre-vacuum versions, got ${versionDirs(idx.bandTable)}")
    def bandRowCount() =
      store.read(idx.bandTable).select("doc_id", "band").distinct().count()
    val sigRows = store.read(idx.sigTable).count()
    val bandRows = bandRowCount()
    idx.maintain()
    assert(versionDirs(idx.bandTable) === 1 && versionDirs(idx.sigTable) === 1,
      "vacuum must reclaim every superseded version, keeping only the live one")
    assert(store.read(idx.sigTable).count() === sigRows && bandRowCount() === bandRows,
      "maintenance must not change the index contents")
    // the index keeps working after maintenance: replay is still clean
    val replayed = pairSet(idx.ingest(df(corpus)))
    assert(replayed === Set((1L, 3L), (1L, 6L), (3L, 6L), (4L, 5L)),
      s"post-vacuum replay must re-emit the same pairs: $replayed")
  }

  test("a brand-new blank doc does NOT trigger the O(table) retraction rewrite") {
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-inc-dedup5").toString, nBuckets = 4)
    val idx = new IncrementalDedupIndex(store, "docs", 3, 12, 4, 0.5)
    idx.ingest(df(corpus.slice(0, 4)))
    val before = store.onDiskVersionDirs(idx.sigTable).size
    // doc 99 has no signature AND was never indexed: nothing to retract —
    // the rewrite must not fire (it is O(table), reserved for real retractions)
    idx.ingest(df(Seq((99L, ""))))
    assert(store.onDiskVersionDirs(idx.sigTable).size === before,
      "never-indexed blank docs must not rewrite the index")
    // index still intact: a later dup of docs 1 and 3 is found against both
    val p = pairSet(idx.ingest(df(Seq((7L, corpus.head._2)))))
    assert(p === Set((1L, 7L), (3L, 7L)), s"index must survive the no-op batch: $p")
  }

  test("re-ingest with blank/short text RETRACTS the stale index entry") {
    import org.apache.spark.sql.functions.col
    val idx = mkIndex()
    idx.ingest(df(corpus.take(3)))
    // doc 3 (dup of 1) is re-ingested with text too short to shingle:
    // its old signature must not keep matching future dups of the old text
    idx.ingest(Seq((3L, "tiny")).toDF("doc_id", "text"))
    val pairs = idx.ingest(df(Seq((6L, corpus.head._2)))) // new dup of doc 1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 6L)),
      s"retracted doc 3 must not resurface as a near-dup: $pairs")
    // the index tables no longer carry doc 3
    assert(idx.store.read(idx.sigTable)
      .filter(col("doc_id") === 3L).count() === 0L)
    assert(idx.store.read(idx.bandTable)
      .filter(col("doc_id") === 3L).count() === 0L)
    // empty batches are a fast-path no-op (no version churn, no pairs)
    val before = idx.store.read(idx.sigTable).count()
    assert(idx.ingest(df(Nil)).isEmpty)
    assert(idx.store.read(idx.sigTable).count() === before)
  }

  test("StreamingDedup: a document stream dedups continuously, exactly-once pairs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-stream-dedup").toString, nBuckets = 4)
    val idx = new IncrementalDedupIndex(store, "docs", 3, 12, 4, 0.5)
    val ckpt = Files.createTempDirectory("graft-stream-dedup-ckpt").toString

    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    def drain(): Unit = {
      val q = graft.streaming.StreamingDedup.start(docs, idx, "dup_pairs", ckpt)
      q.awaitTermination() // AvailableNow: stops once the backlog drains
    }
    in.addData(corpus.slice(0, 2): _*) // docs 1, 2 — no pairs yet
    in.addData(corpus.slice(2, 4): _*) // docs 3, 4 — (1,3) spans batches
    drain()
    def pairs() = store.read("dup_pairs").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs() === Set((1L, 3L)), s"cross-micro-batch pair: ${pairs()}")

    in.addData(corpus.slice(4, 6): _*) // docs 5, 6 — pair with indexed 1/3/4
    drain()
    assert(pairs() === Set((1L, 3L), (4L, 5L), (1L, 6L), (3L, 6L)))

    // replay the LAST micro-batch from a FRESH checkpoint (the crash-
    // between-sink-and-checkpoint shape): the keyed pair MERGE and the
    // idempotent index MERGE must both absorb it
    val sigRows = store.read(idx.sigTable).count()
    val ckpt2 = Files.createTempDirectory("graft-stream-dedup-ckpt2").toString
    val in2 = MemoryStream[(Long, String)]
    val docs2 = in2.toDF().toDF("doc_id", "text")
    in2.addData(corpus.slice(4, 6): _*)
    val q2 = graft.streaming.StreamingDedup.start(docs2, idx, "dup_pairs", ckpt2)
    q2.awaitTermination()
    assert(pairs() === Set((1L, 3L), (4L, 5L), (1L, 6L), (3L, 6L)),
      "replayed micro-batch must not duplicate pair rows")
    assert(store.read(idx.sigTable).count() === sigRows,
      "replayed micro-batch must leave the index unchanged")
  }
}
