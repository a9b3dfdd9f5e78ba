package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalDedupIndex
import graft.plans.BucketedMergeWriter
import graft.Materialize.MaterializeOps

/** Growing-corpus ingest measurement for [[IncrementalDedupIndex]]
  * (VERDICT r6 #5): split a documents directory into `nBatches` equal
  * slices, ingest them sequentially, and time each ingest as the index
  * grows — the claim under test is per-batch cost ∝ BATCH size (the
  * batch×(indexed∪batch) band probe), not index size; a naive
  * re-pair-everything design would show linearly climbing batch times.
  * `maintain()` (vacuum) runs after each ingest, and the main reports the
  * on-disk version-directory count with and without it — without
  * maintenance the band table accretes one version per ingest forever.
  *
  * Usage: runMain graft.IncrementalBench <docsDir> [nBatches] [vacuumEvery]
  * Prints one JSON line:
  *   {"batches":[sec,...],"pairs":[n,...],"sig_versions":V,"band_versions":V,
  *    "vacuumed":true,...}
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val vacuumEvery = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local("graft-incremental-bench")
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .materialized
    val n = docs.count()

    val root = java.nio.file.Files.createTempDirectory("graft-inc-bench").toString
    val store = new BucketedMergeWriter(spark, root, nBuckets = 16)
    val idx = new IncrementalDedupIndex(store, "docs",
      n = 5, k = 12, bands = 4, threshold = 0.5, maxBucket = 100)

    def versionDirs(table: String): Int = store.onDiskVersionDirs(table).size

    val times = new scala.collection.mutable.ArrayBuffer[Double]
    val pairs = new scala.collection.mutable.ArrayBuffer[Long]
    val rawVersions = new scala.collection.mutable.ArrayBuffer[Int]
    (0 until nBatches).foreach { i =>
      // hash-mod batching: equal-sized batches for ANY id distribution
      // (sparse, offset, negative) — a doc_id VALUE range would put the
      // whole corpus in one batch the moment ids don't start near 0
      val batch = docs.filter(pmod(hash(col("doc_id")), lit(nBatches)) === i)
      val t0 = System.nanoTime()
      val p = idx.ingest(batch).count()
      times += (System.nanoTime() - t0) / 1e9
      pairs += p
      rawVersions += versionDirs(idx.bandTable) // before any vacuum this step
      if (vacuumEvery > 0 && (i + 1) % vacuumEvery == 0) idx.maintain()
    }
    val sigV = versionDirs(idx.sigTable)
    val bandV = versionDirs(idx.bandTable)
    def arr[T](xs: Iterable[T]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"incremental_dedup","batches":${arr(times.map(t => f"$t%.2f"))},""" +
      s""""pairs":${arr(pairs)},"band_versions_before_vacuum":${arr(rawVersions)},""" +
      s""""sig_versions":$sigV,"band_versions":$bandV,"vacuum_every":$vacuumEvery,""" +
      s""""n_docs":$n,"n_batches":$nBatches,"dir":"$dir"}""")
    spark.stop()
  }
}
