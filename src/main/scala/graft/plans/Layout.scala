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
    * by the Morton interleave of (xCol, yCol), so every shard covers a
    * small rectangle of the (x, y) plane and min/max stats prune on
    * EITHER column — a lexicographic sort is only selective on its
    * leading column. The interleave column itself is dropped from the
    * files (it is derivable).
    *
    * Each dimension is RANGE-QUANTIZED into 16 bits from its actual
    * min/max (one tiny driver-side agg) — an order-preserving
    * `(v - min) div bucketWidth`. A modulo wrap instead (the naive
    * normalization) would alias distant values into the same z bits the
    * moment a domain exceeds 16 bits, silently DESTROYING pruning rather
    * than degrading it. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
                    shards: Int): Unit =
    writeCurveOrdered(df, xCol, yCol, path, shards,
      graft.functions.ZOrder.morton16)

  /** [[writeZOrdered]] with the HILBERT key instead of Morton
    * ([[graft.functions.HilbertIndex]]): same quantization and shard
    * mechanics, strictly better range locality — the curve never
    * teleports, so each shard's (x, y) footprint is one compact blob
    * instead of Z's split tiles (measured 1.7× fewer contiguous index
    * runs per query box, LayoutSpec). Prefer it for new layouts; Z stays
    * for parity with Delta/Hudi-style OPTIMIZE ZORDER expectations. */
  def writeHilbertOrdered(df: DataFrame, xCol: String, yCol: String,
                          path: String, shards: Int): Unit =
    writeCurveOrdered(df, xCol, yCol, path, shards,
      graft.functions.HilbertIndex.hilbert16)

  /** Materialize one training EPOCH: rows written in the seeded Feistel
    * order ([[graft.functions.FeistelPermute]] — a bijection of the id,
    * so the order is a full collision-free shuffle, reproducible from
    * the seed alone) as `shards` range-partitioned files. Different
    * seeds give completely different orders over the same data — the
    * multi-epoch reshuffle without `rand()` (non-replayable), without a
    * persisted permutation table (a second dataset to keep consistent),
    * and without hash-clumped shards (positions are a permutation, so
    * range-cutting them deals near-equal shard sizes for dense ids).
    *
    * One codegen'd projection + one range exchange + streamed
    * per-partition sorts — the [[writeSorted]] cost shape at any scale.
    * The position key is dropped from the files (derivable from the
    * seed). */
  def writeEpochShuffled(df: DataFrame, idCol: String, seed: Long,
                         path: String, shards: Int): Unit = {
    require(!df.columns.contains("_pos"),
      "column name '_pos' collides with the epoch writer's working column")
    // the feistel domain is [0, 2^32): an id with higher bits (snowflake
    // ids, monotonically_increasing_id with partition bits) would ALIAS
    // another id's position and the 'collision-free shuffle' contract
    // silently breaks — fail per-row instead
    // isNull FIRST: a NULL id makes both range tests NULL (not true), so
    // without it NULL ids would skip the raise_error, collapse onto one
    // NULL position, and silently break the collision-free contract
    val guarded = when(col(idCol).isNull ||
        col(idCol) < 0 || col(idCol) >= lit(1L << 32),
        raise_error(concat(lit(s"writeEpochShuffled: $idCol out of the " +
          "feistel32 domain [0, 2^32): "),
          coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(graft.functions.FeistelPermute.feistel(col(idCol), lit(seed)))
    df.withColumn("_pos", guarded)
      .repartitionByRange(shards, col("_pos"))
      .sortWithinPartitions(col("_pos"))
      .drop("_pos")
      .write.mode("overwrite").parquet(path)
  }

  private def writeCurveOrdered(df: DataFrame, xCol: String, yCol: String,
                                path: String, shards: Int,
                                key: (org.apache.spark.sql.Column,
                                  org.apache.spark.sql.Column) =>
                                  org.apache.spark.sql.Column): Unit = {
    require(!df.columns.contains("_z"),
      "column name '_z' collides with the curve writer's working column")
    val b = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    // empty (or all-NULL-key) input: no bounds to quantize — write the
    // empty frame instead of NPEing on the null aggregate row
    if (b.isNullAt(0) || b.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    def quantized(c: String, lo: Long, hi: Long) = {
      // BigInt span: a domain spanning more than Long.MaxValue (a 64-bit
      // hash column) would wrap the raw subtraction negative and force
      // width = 1 — morton16 then reads only the low 16 bits and shard
      // locality silently dies. The row-level subtraction runs in
      // DECIMAL for the same reason (ANSI long arithmetic throws
      // mid-write); `div` is integral division, exact at any magnitude.
      val width = ((BigInt(hi) - BigInt(lo)) / 65536 + 1).max(1).toLong
      // lo as a string-cast decimal: a bare Long.MinValue literal cannot
      // be parsed (the parser sees unary minus over an overflowing digit
      // run)
      expr(s"(CAST(`$c` AS DECIMAL(21,0)) - CAST('${lo}' AS DECIMAL(21,0)))" +
        s" div ${width}L")
    }
    df.withColumn("_z", key(
        quantized(xCol, b.getLong(0), b.getLong(1)),
        quantized(yCol, b.getLong(2), b.getLong(3))))
      .repartitionByRange(shards, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
