package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output data layout for large corpora — the step between "computed" and
  * "servable": range-partitioned, internally-sorted parquet shards.
  *
  * Why this layout at 100 TB:
  *   - `repartitionByRange(shards, keys)` gives one RANGE of the key
  *     space per shard (a sampled range exchange — one shuffle), so a
  *     reader needing a key interval touches O(matching shards), not the
  *     whole corpus;
  *   - `sortWithinPartitions(keys)` makes every parquet row-group's
  *     min/max stats tight on the sort key, so even within a shard,
  *     predicate pushdown skips row groups — filters prune at BOTH the
  *     file and row-group level;
  *   - together the files are globally ordered (shard i's max key ≤ shard
  *     i+1's min key), which is what sequential trainers and merge-style
  *     consumers want.
  *
  * This complements [[Bucketing]] (hash buckets for shuffle-free JOINS);
  * range+sort optimizes RANGE reads and scans. Same trade as Delta's
  * OPTIMIZE ZORDER for the single-key case, without the table format.
  */
object Layout {

  /** Write `df` as `shards` range-partitioned, internally-sorted parquet
    * files under `path`. One shuffle (sampled range exchange) + a
    * per-partition sort that parquet's writer streams — no global sort
    * bottleneck, no driver involvement. */
  def writeSorted(df: DataFrame, sortCols: Seq[String], path: String,
                  shards: Int): Unit =
    df.repartitionByRange(shards, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Read back a sorted-layout directory. Spark does not track the order
    * property across a plain parquet read; consumers that rely on global
    * order should read shards in file order (e.g. via this helper's
    * per-file frames) or re-sort — filters, though, prune regardless. */
  def readSorted(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Z-ordered layout over TWO integer dimensions: range-shard and sort
    * by the Morton interleave of (xCol, yCol) (both pmod-normalized into
    * 16 bits), so every shard covers a small rectangle of the (x, y)
    * plane and min/max stats prune on EITHER column — a lexicographic
    * sort is only selective on its leading column. The interleave column
    * itself is dropped from the files (it is derivable). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
                    shards: Int): Unit =
    df.withColumn("_z", graft.functions.ZOrder.morton16(
        pmod(col(xCol), lit(65536)).cast("int"),
        pmod(col(yCol), lit(65536)).cast("int")))
      .repartitionByRange(shards, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
