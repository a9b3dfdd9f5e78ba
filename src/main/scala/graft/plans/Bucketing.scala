package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing for CO-LOCATED joins (SURVEY.md §4; the 100 TB
  * join lever the brief names alongside broadcasting): two tables written
  * with the same `bucketBy` key and bucket count are join-compatible
  * without ANY exchange — each task reads matching bucket files from both
  * sides, so a fact⋈fact or fact⋈big-dim join that would otherwise
  * shuffle terabytes runs shuffle-free, forever, for every downstream
  * query that joins on the bucketing key.
  *
  * This is Spark's own Hive-style bucketing (`DataFrameWriter.bucketBy` +
  * `saveAsTable`; plain `save` does not support buckets). It complements —
  * not replaces — [[BucketedMergeWriter]]: that one buckets for
  * O(touched-buckets) MERGE write amplification with its own manifest;
  * this one buckets through the catalog so the READ side (Catalyst's
  * `HashClusteredDistribution` matching) can elide join exchanges.
  * BucketingSpec asserts the no-Exchange plan property.
  */
object Bucketing {

  /** Write `df` as a catalog-managed parquet table bucketed (and
    * bucket-sorted) by `key`. Both sides of a co-located join must use the
    * SAME key and nBuckets. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * reading the files directly would lose the distribution and reintroduce
    * the shuffle). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
