package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 at scale — bucketed idempotent MERGE (SURVEY.md §7.3; VERDICT r1
  * "wrong #3"): tables are hash-partitioned on the natural key into
  * `_bucket=N/` parquet partitions, and a merge rewrites ONLY the buckets
  * the batch touches:
  *
  *   1. tag batch rows with `_bucket = pmod(xxhash64(natKey), nBuckets)`;
  *   2. read the CURRENT table pruned to touched buckets (partition
  *      pruning — untouched buckets are never scanned, let alone written);
  *   3. keep existing surrogate keys (LEFT join on the natural key inside
  *      touched buckets), assign `max+i` to genuinely-new keys — the
  *      running max lives in a `_MAXSK` metadata file, so no full-table
  *      scan is needed to continue the sequence;
  *   4. dynamic-partition-overwrite the union back: Spark replaces only
  *      the partition directories present in the output.
  *
  * Per-batch write amplification is O(touched buckets) — with `nBuckets`
  * sized so a bucket ≈ a few GB, that is O(batch), not O(table). The
  * trade-off vs [[MergeWriter]] is commit atomicity: partition overwrite
  * is per-directory, not table-atomic (the production answer is the same
  * algorithm through Delta/Iceberg `MERGE INTO`, which adds the
  * transaction log; the bucketing/pruning shape here is exactly what
  * those MERGEs do internally).
  */
class BucketedMergeWriter(spark: SparkSession, root: String, nBuckets: Int = 16)
    extends TableStore {

  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  private def dir(name: String) = s"$root/$name"
  private def maxSkPath(name: String) = Paths.get(dir(name), "_MAXSK")

  override def exists(name: String): Boolean = Files.exists(maxSkPath(name))

  private def readMaxSk(name: String): Long =
    new String(Files.readAllBytes(maxSkPath(name))).trim.toLong

  private def writeMaxSk(name: String, v: Long): Unit =
    Files.write(maxSkPath(name), v.toString.getBytes)

  /** Raw read including the `_bucket` partition column. */
  private def readRaw(name: String): DataFrame =
    spark.read.parquet(dir(name))

  override def read(name: String): DataFrame = readRaw(name).drop("_bucket")

  private def bucketCol(natKey: Seq[String]): Column =
    pmod(xxhash64(natKey.map(col): _*), lit(nBuckets)).cast("int")

  private def write(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").partitionBy("_bucket").parquet(dir(name))

  /** Distributed dense key assignment (same shape as MergeWriter's —
    * zipWithIndex, no global window); returns (keyed frame, count). */
  private def assignKeys(df: DataFrame, skCol: String, offset: Long): (DataFrame, Long) = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        skCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (offset + 1 + i))
    }
    val keyed = df.sparkSession.createDataFrame(rdd, schema)
    (keyed, rdd.count())
  }

  override def mergeDim(name: String, batch: DataFrame, natKey: Seq[String],
                        skCol: String): DataFrame = {
    val attrs = batch.columns.filterNot(natKey.contains)
    val cols = (natKey :+ skCol) ++ attrs :+ "_bucket"
    // a partitioned parquet table cannot be created empty (no partition
    // dirs -> unreadable); defer creation to the first non-empty batch
    if (!exists(name) && batch.isEmpty) return batch.withColumn(skCol, lit(0L))
    if (!exists(name)) {
      Files.createDirectories(Paths.get(dir(name)))
      val (keyed, n) = assignKeys(batch, skCol, 0L)
      write(name, keyed.withColumn("_bucket", bucketCol(natKey)).select(cols.map(col): _*))
      writeMaxSk(name, n)
    } else {
      val batchB = batch.withColumn("_bucket", bucketCol(natKey))
        .localCheckpoint(true) // stabilize before the multi-use merge below
      val touched = batchB.select(col("_bucket")).distinct()
        .collect().map(_.getInt(0)).sorted
      // partition pruning: only touched bucket dirs are scanned
      val curTouched = readRaw(name).filter(col("_bucket").isin(touched: _*))
      val joined = batchB.join(
        curTouched.select((natKey :+ skCol).map(col): _*), natKey, "left")
      val known = joined.filter(col(skCol).isNotNull)
      val fresh = joined.filter(col(skCol).isNull).drop(skCol)
      val maxSk = readMaxSk(name)
      val (freshKeyed, nNew) = assignKeys(fresh, skCol, maxSk)
      val untouchedRows = curTouched.join(batchB.select(natKey.map(col): _*), natKey, "left_anti")
      val out = untouchedRows.select(cols.map(col): _*)
        .unionByName(known.select(cols.map(col): _*))
        .unionByName(freshKeyed.select(cols.map(col): _*))
      // dynamic overwrite: only the _bucket=N dirs present in `out` are
      // replaced; every untouched bucket's files stay untouched on disk
      write(name, out.localCheckpoint(true))
      writeMaxSk(name, maxSk + nNew)
    }
    read(name)
  }

  override def mergeFact(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame = {
    val cols = batch.columns :+ "_bucket"
    if (!exists(name) && batch.isEmpty) return batch
    if (!exists(name)) {
      Files.createDirectories(Paths.get(dir(name)))
      write(name, batch.withColumn("_bucket", bucketCol(natKey)).select(cols.map(col): _*))
      writeMaxSk(name, 0L)
    } else {
      val batchB = batch.withColumn("_bucket", bucketCol(natKey)).localCheckpoint(true)
      val touched = batchB.select(col("_bucket")).distinct()
        .collect().map(_.getInt(0)).sorted
      val curTouched = readRaw(name).filter(col("_bucket").isin(touched: _*))
      val untouchedRows = curTouched.join(batchB.select(natKey.map(col): _*), natKey, "left_anti")
      write(name, untouchedRows.select(cols.map(col): _*)
        .unionByName(batchB.select(cols.map(col): _*)).localCheckpoint(true))
    }
    read(name)
  }

  override def appendTable(name: String, batch: DataFrame): DataFrame = {
    batch.withColumn("_bucket", lit(0))
      .write.mode("append").partitionBy("_bucket").parquet(dir(name))
    if (!exists(name)) writeMaxSk(name, 0L)
    read(name)
  }
}
