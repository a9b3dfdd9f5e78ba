package graft.plans

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 at scale — bucketed idempotent MERGE with TABLE-ATOMIC commits
  * (SURVEY.md §7.3; VERDICT r1 "wrong #3", r2 "missing #3"): tables are
  * hash-partitioned on the natural key into `_bucket=N/` parquet
  * partitions, and a merge rewrites ONLY the buckets the batch touches:
  *
  *   1. tag batch rows with `_bucket = pmod(xxhash64(natKey), nBuckets)`;
  *   2. read the CURRENT table pruned to touched buckets (partition
  *      pruning — untouched buckets are never scanned, let alone written);
  *   3. keep existing surrogate keys (LEFT join on the natural key inside
  *      touched buckets), assign `max+i` to genuinely-new keys — the
  *      running max lives in the manifest, so no full-table scan is needed
  *      to continue the sequence;
  *   4. write the touched buckets' new contents into a FRESH version
  *      directory `v{N}/_bucket=B/…`, then atomically swap the `_MANIFEST`
  *      file, which maps every live bucket to the version directory holding
  *      its current data (and carries maxSk, so key-sequence state commits
  *      in the same rename).
  *
  * Atomicity: readers resolve data exclusively through `_MANIFEST`
  * (tmp-file + ATOMIC_MOVE, same contract as MergeWriter's `_CURRENT`). A
  * crash mid-merge leaves at most an orphan version directory that no
  * manifest references — the table stays consistent at its pre-merge
  * state, and the next merge simply picks an unused version number. This
  * is the same pointer-commit design Delta/Iceberg use (a log entry
  * instead of a file rename); per-directory dynamic partition overwrite —
  * the previous design — had a window where some buckets were new and
  * others old.
  *
  * Per-batch write amplification is O(touched buckets) — with `nBuckets`
  * sized so a bucket ≈ a few GB, that is O(batch), not O(table). Reads
  * union the (few) live version directories, each pruned to the buckets
  * the manifest assigns it; after `compactAfter` distinct versions
  * accumulate, the next commit folds everything into one version
  * (amortized O(table / compactAfter) per merge — the Delta checkpoint
  * analog). Superseded version dirs are kept for concurrent readers;
  * `vacuum()` deletes the unreferenced ones once quiesced.
  */
class BucketedMergeWriter(spark: SparkSession, root: String, nBuckets: Int = 16,
                          compactAfter: Int = 8)
    extends TableStore {

  private def dir(name: String) = s"$root/$name"
  private def versionDir(name: String, v: Long) = s"${dir(name)}/v$v"
  private def manifestPath(name: String) = Paths.get(dir(name), "_MANIFEST")

  override def exists(name: String): Boolean = Files.exists(manifestPath(name))

  /** Manifest = (maxSk, live (bucket → version) pairs). A bucket may map to
    * several versions only for append-only tables (appendTable); merges
    * replace all of a touched bucket's entries. */
  private def readManifest(name: String): (Long, Seq[(Int, Long)]) = {
    val lines = Files.readAllLines(manifestPath(name)).asScala.toSeq
    val maxSk = lines.head.stripPrefix("maxsk=").trim.toLong
    val pairs = lines.tail.filter(_.trim.nonEmpty).map { l =>
      val Array(b, v) = l.trim.split("\\s+"); (b.toInt, v.toLong)
    }
    (maxSk, pairs)
  }

  private def writeManifest(name: String, maxSk: Long, pairs: Seq[(Int, Long)]): Unit = {
    val body = (s"maxsk=$maxSk" +: pairs.sorted.map { case (b, v) => s"$b $v" })
      .mkString("", "\n", "\n")
    val tmp = Paths.get(dir(name), "_MANIFEST.tmp")
    Files.write(tmp, body.getBytes)
    Files.move(tmp, manifestPath(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Next unused version number — scanned from the directory, not the
    * manifest, so orphan dirs from a crashed commit are never reused. */
  private def nextVersion(name: String): Long = {
    val d = Paths.get(dir(name))
    if (!Files.exists(d)) 0L
    else {
      val ls = Files.list(d) // closed explicitly: one leaked fd per commit adds up
      try ls.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d+") => s.drop(1).toLong }
        .foldLeft(-1L)(math.max) + 1
      finally ls.close()
    }
  }

  private def bucketCol(natKey: Seq[String]): Column =
    pmod(xxhash64(natKey.map(col): _*), lit(nBuckets)).cast("int")

  /** Read the given buckets (default: all live), pruned per version dir. */
  private def readRaw(name: String, only: Option[Seq[Int]] = None): DataFrame = {
    val (_, pairs) = readManifest(name)
    val relevant = only.fold(pairs)(bs => pairs.filter(p => bs.contains(p._1)))
    if (relevant.isEmpty)
      // none of the requested buckets exist yet — empty frame, table schema
      spark.read.parquet(versionDir(name, pairs.head._2)).filter(lit(false))
    else
      relevant.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, ps) =>
        val df = spark.read.parquet(versionDir(name, v))
        val bs = ps.map(_._1)
        if (bs.size >= nBuckets) df else df.filter(col("_bucket").isin(bs: _*))
      }.reduce(_ unionByName _)
  }

  override def read(name: String): DataFrame = readRaw(name).drop("_bucket")

  /** Write `out` (touched buckets only, `_bucket` column present) as a new
    * version, then commit by atomic manifest swap. `replace` entries
    * supersede all previous mappings of their buckets; with
    * `replace=false` (append tables) previous mappings stay live. */
  private def commit(name: String, out: DataFrame, touched: Seq[Int],
                     newMaxSk: Long, prevPairs: Seq[(Int, Long)],
                     replace: Boolean = true): Unit = {
    Files.createDirectories(Paths.get(dir(name)))
    val v = nextVersion(name)
    out.write.mode("overwrite").partitionBy("_bucket").parquet(versionDir(name, v))
    val kept = if (replace) prevPairs.filterNot(p => touched.contains(p._1)) else prevPairs
    writeManifest(name, newMaxSk, kept ++ touched.map(b => (b, v)))
    maybeCompact(name)
  }

  /** Fold all live versions into one when too many accumulate; same atomic
    * manifest swap, so readers never see a partial compaction. */
  private def maybeCompact(name: String): Unit = {
    val (maxSk, pairs) = readManifest(name)
    if (pairs.map(_._2).distinct.size <= compactAfter) return
    val v = nextVersion(name)
    val all = readRaw(name).localCheckpoint(true)
    all.write.mode("overwrite").partitionBy("_bucket").parquet(versionDir(name, v))
    val buckets = all.select(col("_bucket")).distinct().collect().map(_.getInt(0))
    writeManifest(name, maxSk, buckets.toSeq.map(b => (b, v)))
  }

  /** Delete version directories no manifest entry references (crashed
    * commits, superseded versions). Call only when no reader still holds
    * DataFrames over old versions — the usual retention caveat. */
  def vacuum(name: String): Unit = {
    val live = readManifest(name)._2.map(_._2).toSet
    val ls = Files.list(Paths.get(dir(name)))
    val dead = try ls.iterator().asScala
      .filter(p => p.getFileName.toString.matches("v\\d+"))
      .filterNot(p => live.contains(p.getFileName.toString.drop(1).toLong))
      .toList
    finally ls.close()
    dead.foreach { p =>
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
  }

  override def mergeDim(name: String, batch: DataFrame, natKey: Seq[String],
                        skCol: String): DataFrame = {
    val attrs = batch.columns.filterNot(natKey.contains)
    val cols = (natKey :+ skCol) ++ attrs :+ "_bucket"
    if (!exists(name) && batch.isEmpty) return batch.withColumn(skCol, lit(0L))
    if (!exists(name)) {
      val (keyed, n) = KeyAssign.dense(batch, skCol, 0L)
      val out = keyed.withColumn("_bucket", bucketCol(natKey))
        .select(cols.map(col): _*).localCheckpoint(true)
      val touched = out.select(col("_bucket")).distinct().collect().map(_.getInt(0)).toSeq
      commit(name, out, touched, n, Nil)
    } else {
      val (maxSk, pairs) = readManifest(name)
      val batchB = batch.withColumn("_bucket", bucketCol(natKey))
        .localCheckpoint(true) // stabilize before the multi-use merge below
      val touched = batchB.select(col("_bucket")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      // partition pruning: only touched bucket dirs are scanned
      val curTouched = readRaw(name, Some(touched))
      val joined = batchB.join(
        curTouched.select((natKey :+ skCol).map(col): _*), natKey, "left")
      val known = joined.filter(col(skCol).isNotNull)
      val fresh = joined.filter(col(skCol).isNull).drop(skCol)
      val (freshKeyed, nNew) = KeyAssign.dense(fresh, skCol, maxSk)
      val untouchedRows = curTouched.join(batchB.select(natKey.map(col): _*), natKey, "left_anti")
      val out = untouchedRows.select(cols.map(col): _*)
        .unionByName(known.select(cols.map(col): _*))
        .unionByName(freshKeyed.select(cols.map(col): _*))
        .localCheckpoint(true)
      commit(name, out, touched, maxSk + nNew, pairs)
    }
    read(name)
  }

  override def mergeFact(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame = {
    val cols = batch.columns.toIndexedSeq :+ "_bucket"
    if (!exists(name) && batch.isEmpty) return batch
    if (!exists(name)) {
      val out = batch.withColumn("_bucket", bucketCol(natKey))
        .select(cols.map(col): _*).localCheckpoint(true)
      val touched = out.select(col("_bucket")).distinct().collect().map(_.getInt(0)).toSeq
      commit(name, out, touched, 0L, Nil)
    } else {
      val (maxSk, pairs) = readManifest(name)
      val batchB = batch.withColumn("_bucket", bucketCol(natKey)).localCheckpoint(true)
      val touched = batchB.select(col("_bucket")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      val curTouched = readRaw(name, Some(touched))
      val untouchedRows = curTouched.join(batchB.select(natKey.map(col): _*), natKey, "left_anti")
      val out = untouchedRows.select(cols.map(col): _*)
        .unionByName(batchB.select(cols.map(col): _*)).localCheckpoint(true)
      commit(name, out, touched, maxSk, pairs)
    }
    read(name)
  }

  override def appendTable(name: String, batch: DataFrame): DataFrame = {
    if (batch.isEmpty) return if (exists(name)) read(name) else batch
    val out = batch.withColumn("_bucket", lit(0)).localCheckpoint(true)
    val (maxSk, pairs) = if (exists(name)) readManifest(name) else (0L, Nil)
    commit(name, out, Seq(0), maxSk, pairs, replace = false)
    read(name)
  }
}
