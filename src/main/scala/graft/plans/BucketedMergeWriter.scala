package graft.plans

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
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
  * Concurrency (VERDICT r3 "next #2"): commits are OPTIMISTIC. A merge
  * computes against a manifest snapshot, writes its version directory
  * unlocked, then swaps the manifest only if it is still byte-identical to
  * the snapshot — otherwise a concurrent writer (another merge, or
  * compaction) won the race, so the loser discards its version dir and
  * recomputes against the new state. This is Delta/Iceberg optimistic
  * concurrency, and matches the serialization Postgres gives the reference
  * for free (reference: flink/stream_to_star.py:99-282, ON CONFLICT).
  * The check-and-swap critical section is a JVM-wide per-table lock
  * (commit = one file rename, no Spark job inside the lock); writers in
  * DIFFERENT processes additionally need a shared lock service for the
  * swap itself — the documented deployment model is all writers of a
  * table in one driver (ingestion + compaction + vacuum), which is what
  * Structured Streaming gives.
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
  import BucketedMergeWriter.{commitLocks, inFlight, versionCounters}

  private def dir(name: String) = s"$root/$name"
  private def versionDir(name: String, v: Long) = s"${dir(name)}/v$v"
  private def manifestPath(name: String) = Paths.get(dir(name), "_MANIFEST")
  private def tableKey(name: String) =
    Paths.get(dir(name)).toAbsolutePath.normalize.toString
  private def lockFor(name: String): Object =
    commitLocks.computeIfAbsent(tableKey(name), _ => new Object)

  override def exists(name: String): Boolean = Files.exists(manifestPath(name))

  /** Raw manifest content (None = table absent) — the CAS token: a commit
    * applies only while the manifest is byte-identical to the snapshot the
    * merge was computed against. */
  private def snapshot(name: String): Option[String] =
    if (exists(name)) Some(new String(Files.readAllBytes(manifestPath(name))))
    else None

  /** Manifest = (maxSk, live (bucket → version) pairs). A bucket may map to
    * several versions only for append-only tables (appendTable); merges
    * replace all of a touched bucket's entries. */
  private def parseManifest(body: String): (Long, Seq[(Int, Long)]) = {
    val lines = body.linesIterator.toSeq
    val maxSk = lines.head.stripPrefix("maxsk=").trim.toLong
    val pairs = lines.tail.filter(_.trim.nonEmpty).map { l =>
      val Array(b, v) = l.trim.split("\\s+"); (b.toInt, v.toLong)
    }
    (maxSk, pairs)
  }

  private def readManifest(name: String): (Long, Seq[(Int, Long)]) =
    parseManifest(snapshot(name).getOrElse(
      throw new java.nio.file.NoSuchFileException(manifestPath(name).toString)))

  private def writeManifest(name: String, maxSk: Long, pairs: Seq[(Int, Long)]): Unit = {
    // versions leaving the live set get a tombstone timestamp, so vacuum
    // can retain them for in-flight readers (Delta-style retention)
    val oldLive =
      if (exists(name)) readManifest(name)._2.map(_._2).toSet else Set.empty[Long]
    val dropped = oldLive -- pairs.map(_._2).toSet
    if (dropped.nonEmpty) {
      val now = System.currentTimeMillis()
      Files.write(tombstonesPath(name),
        dropped.toSeq.sorted.map(v => s"$v $now").mkString("", "\n", "\n").getBytes,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    val body = (s"maxsk=$maxSk" +: pairs.sorted.map { case (b, v) => s"$b $v" })
      .mkString("", "\n", "\n")
    val tmp = Paths.get(dir(name), "_MANIFEST.tmp")
    Files.write(tmp, body.getBytes)
    Files.move(tmp, manifestPath(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def tombstonesPath(name: String) = Paths.get(dir(name), "_TOMBSTONES")

  /** version → millis at which it left the live set (latest wins). */
  private def readTombstones(name: String): Map[Long, Long] =
    if (!Files.exists(tombstonesPath(name))) Map.empty
    else Files.readAllLines(tombstonesPath(name)).asScala
      .filter(_.trim.nonEmpty).map { l =>
        val Array(v, t) = l.trim.split("\\s+"); (v.toLong, t.toLong)
      }.toMap

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

  /** Reserve the next version directory under the table lock: creating the
    * (empty) dir makes concurrent writers' `nextVersion` scans skip it, so
    * two in-flight commits never write into the same path. A JVM-wide
    * monotonic counter additionally guarantees numbers are NEVER reused —
    * a conflict loser deletes its dir outside the lock, and a scan-only
    * scheme would hand its number to the next writer while that delete is
    * still walking the tree (deleting the new writer's files mid-write).
    * Registered in-flight so a concurrent vacuum won't reap it either. */
  private def reserveVersion(name: String): Long = lockFor(name).synchronized {
    Files.createDirectories(Paths.get(dir(name)))
    val ctr = versionCounters.computeIfAbsent(
      tableKey(name), _ => new java.util.concurrent.atomic.AtomicLong(-1L))
    val v = math.max(nextVersion(name), ctr.get + 1)
    ctr.set(v)
    Files.createDirectories(Paths.get(versionDir(name, v)))
    inFlight.add(s"${tableKey(name)}/v$v")
    v
  }

  private def deleteDir(path: java.nio.file.Path): Unit =
    if (Files.exists(path)) {
      val walk = Files.walk(path)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }

  private def bucketCol(natKey: Seq[String]): Column =
    pmod(xxhash64(natKey.map(col): _*), lit(nBuckets)).cast("int")

  /** Eagerly materialize `df` (localCheckpoint: plan leaves become
    * in-memory RDD blocks, cleaned by the ContextCleaner once unreferenced)
    * and learn its distinct `_bucket` set in the SAME job via an
    * Observation — previously a separate distinct().collect() job per
    * table per micro-batch (VERDICT r3 "next #1"). Falls back to the
    * explicit job if the (listener-bus-delivered) metric hasn't arrived. */
  private def materialize(df: DataFrame): (DataFrame, Seq[Int]) = {
    val obs = Observation()
    val ckpt = df.observe(obs, collect_set(col("_bucket")).as("touched"))
      .localCheckpoint(true)
    val touched = Observed.poll(obs).flatMap(_.get("touched")) match {
      case Some(s) => s.asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Int]).toSeq
      case None =>
        ckpt.select(col("_bucket")).distinct().collect().map(_.getInt(0)).toSeq
    }
    (ckpt, touched.sorted)
  }

  /** Read the given live (bucket → version) mappings, pruned per version
    * dir; `only` restricts to a bucket subset (partition pruning). */
  private def readPairs(name: String, all: Seq[(Int, Long)],
                        only: Option[Seq[Int]] = None): DataFrame = {
    val relevant = only.fold(all)(bs => all.filter(p => bs.contains(p._1)))
    if (relevant.isEmpty)
      // none of the requested buckets exist yet — empty frame, table schema
      spark.read.parquet(versionDir(name, all.head._2)).filter(lit(false))
    else
      relevant.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, ps) =>
        val df = spark.read.parquet(versionDir(name, v))
        val bs = ps.map(_._1)
        if (bs.size >= nBuckets) df else df.filter(col("_bucket").isin(bs: _*))
      }.reduce(_ unionByName _)
  }

  override def read(name: String): DataFrame =
    readPairs(name, readManifest(name)._2).drop("_bucket")

  /** Full post-merge table view returned to callers: the just-committed
    * in-memory frame (touched buckets) ∪ a pruned scan of the untouched
    * live mappings. No manifest re-read and no re-scan of data this merge
    * just computed — `read(name)` here cost a fresh manifest read plus a
    * parquet re-scan of the whole table per table per micro-batch
    * (VERDICT r3 "next #1"); the star pipeline consumes these views
    * immediately in FK resolution, so they come straight from memory. */
  private def view(name: String, out: DataFrame, kept: Seq[(Int, Long)]): DataFrame = {
    val o = out.drop("_bucket")
    if (kept.isEmpty) o else o.unionByName(readPairs(name, kept).drop("_bucket"))
  }

  /** Optimistic-concurrency commit loop. `compute` builds the merged
    * output for the touched buckets against the given manifest state
    * (None = table absent), returning (out, touched, newMaxSk); `out` must
    * carry `_bucket`. On a CAS conflict (another writer swapped the
    * manifest first) the reserved version dir is discarded and `compute`
    * re-runs against the new state — its per-key results (existing sks,
    * kept rows) are state-dependent, so a blind manifest retry would lose
    * the winner's updates. Returns (out, kept untouched mappings). */
  private def commitLoop(name: String, replace: Boolean,
                         dropUntouched: Boolean = false)
      (compute: Option[(Long, Seq[(Int, Long)])] => (DataFrame, Seq[Int], Long))
      : (DataFrame, Seq[(Int, Long)]) = {
    val maxRetries = 20
    var attempt = 0
    while (true) {
      val snap = snapshot(name)
      val prev = snap.map(parseManifest)
      val (out, touched, newMaxSk) = compute(prev)
      val prevPairs = prev.map(_._2).getOrElse(Nil)
      def keptPairs: Seq[(Int, Long)] =
        if (dropUntouched) Nil
        else if (replace) prevPairs.filterNot(p => touched.contains(p._1))
        else prevPairs
      val v = reserveVersion(name)
      val vd = versionDir(name, v)
      // in-flight registration is released in finally: a failed write (or
      // cancellation) must not leak the entry, or vacuum could never
      // reclaim the half-written dir for the life of the JVM
      val committed = try {
        out.write.mode("overwrite").partitionBy("_bucket").parquet(vd)
        lockFor(name).synchronized {
          if (snapshot(name) == snap) {
            writeManifest(name, newMaxSk, keptPairs ++ touched.map(b => (b, v)))
            true
          } else false
        }
      } finally {
        // losers/failures: delete before deregistering so vacuum never
        // races the walk; winners deregister their (now live) dir only
        val live = lockFor(name).synchronized(
          exists(name) && readManifest(name)._2.exists(_._2 == v))
        if (!live) deleteDir(Paths.get(vd))
        inFlight.remove(s"${tableKey(name)}/v$v")
      }
      if (committed) {
        maybeCompact(name)
        return (out, keptPairs)
      }
      attempt += 1
      if (attempt >= maxRetries) throw new IllegalStateException(
        s"table $name: $maxRetries consecutive commit conflicts")
    }
    sys.error("unreachable")
  }

  /** Fold all live versions into one when too many accumulate; same CAS
    * swap, so readers never see a partial compaction and a racing merge is
    * never clobbered — on conflict compaction simply abandons (the next
    * commit re-triggers it). */
  private def maybeCompact(name: String): Unit = {
    val snap = snapshot(name).getOrElse(return)
    val (maxSk, pairs) = parseManifest(snap)
    if (pairs.map(_._2).distinct.size <= compactAfter) return
    // BEST-EFFORT by design: the caller's merge is already durably
    // committed, so a compaction failure (transient task loss, query stop
    // mid-write) must not surface as a merge failure — the next commit
    // over the threshold simply re-triggers it
    val attempt = scala.util.Try {
      val (all, buckets) = materialize(readPairs(name, pairs))
      val v = reserveVersion(name)
      val vd = versionDir(name, v)
      try {
        all.write.mode("overwrite").partitionBy("_bucket").parquet(vd)
        lockFor(name).synchronized {
          if (snapshot(name).contains(snap)) {
            writeManifest(name, maxSk, buckets.map(b => (b, v)))
            true
          } else false
        }
      } finally {
        val live = lockFor(name).synchronized(
          exists(name) && readManifest(name)._2.exists(_._2 == v))
        if (!live) deleteDir(Paths.get(vd))
        inFlight.remove(s"${tableKey(name)}/v$v")
      }
    }
    attempt.failed.foreach(e =>
      System.err.println(s"[graft] compaction of $name abandoned: ${e.getMessage}"))
  }

  /** Delete version directories no manifest entry references (crashed
    * commits, superseded versions) — except in-flight ones a concurrent
    * writer has reserved but not yet committed. Runs under the table lock
    * so it never interleaves with a commit's check-and-swap.
    *
    * `retainMillis` is the reader grace period (Delta's retention model):
    * a superseded version is reclaimed only once its tombstone — stamped
    * when it left the manifest — is at least that old, so vacuum can run
    * CONCURRENTLY with ingestion as long as no reader holds a frame longer
    * than the retention. The default 0 is the quiesced mode: reclaim
    * everything dead immediately (the caller guarantees no outstanding
    * readers). Crash orphans (never referenced by any manifest) age by
    * directory mtime — no reader can ever have resolved them. */
  def vacuum(name: String, retainMillis: Long = 0L): Unit = lockFor(name).synchronized {
    val live = readManifest(name)._2.map(_._2).toSet
    val tomb = readTombstones(name)
    val now = System.currentTimeMillis()
    val ls = Files.list(Paths.get(dir(name)))
    val dead = try ls.iterator().asScala
      .filter(p => p.getFileName.toString.matches("v\\d+"))
      .filterNot(p => live.contains(p.getFileName.toString.drop(1).toLong))
      .filterNot(p => inFlight.contains(
        s"${tableKey(name)}/${p.getFileName.toString}"))
      .filter { p =>
        val age = now - tomb.getOrElse(p.getFileName.toString.drop(1).toLong,
          Files.getLastModifiedTime(p).toMillis)
        age >= retainMillis
      }
      .toList
    finally ls.close()
    dead.foreach(p => deleteDir(p))
    // prune tombstones of reclaimed versions — append-only growth would
    // otherwise make every vacuum re-parse the table's full commit history
    if (dead.nonEmpty && tomb.nonEmpty) {
      val reclaimed = dead.map(_.getFileName.toString.drop(1).toLong).toSet
      val keptTomb = tomb.filterNot { case (v, _) => reclaimed.contains(v) }
      Files.write(tombstonesPath(name),
        keptTomb.toSeq.sorted.map { case (v, t) => s"$v $t" }
          .mkString("", "\n", "\n").getBytes)
    }
  }

  override def mergeDim(name: String, batch: DataFrame, natKey: Seq[String],
                        skCol: String): DataFrame = {
    val attrs = batch.columns.filterNot(natKey.contains)
    val cols = (natKey :+ skCol) ++ attrs :+ "_bucket"
    if (!exists(name) && batch.isEmpty) return batch.withColumn(skCol, lit(0L))
    val (batchB, touched) = materialize(batch.withColumn("_bucket", bucketCol(natKey)))
    if (touched.isEmpty) return read(name) // empty batch over existing table
    val (out, kept) = commitLoop(name, replace = true) {
      case None =>
        // KeyAssign over the in-memory batch; the write executes the cheap
        // id-stamping map, so no further checkpoint is needed
        val (keyed, n) = KeyAssign.dense(batchB, skCol, 0L)
        (keyed.select(cols.map(col): _*), touched, n)
      case Some((maxSk, pairs)) =>
        // partition pruning: only touched bucket dirs are scanned — and
        // only ONCE: a single full-outer join captures all three row
        // classes (known / fresh / untouched), where the previous
        // left-join + anti-join pair scanned the touched buckets twice and
        // executed the join in every consuming branch. `_bucket` joins
        // alongside the natural key (it is a function of it), so both
        // sides' partition columns coalesce.
        val curTouched = readPairs(name, pairs, Some(touched))
        val cur = curTouched.select((natKey :+ "_bucket").map(col) ++
          (col(skCol).as("_cur_sk") +: attrs.map(c => col(c).as(s"_cur_$c"))): _*)
        val freshObs = org.apache.spark.sql.Observation()
        val j = batchB.withColumn("_in_batch", lit(1))
          .join(cur, natKey :+ "_bucket", "full_outer")
          .observe(freshObs, count(when(
            col("_in_batch").isNotNull && col("_cur_sk").isNull, 1)).as("fresh"))
          .localCheckpoint(true) // consumed 3× below + by the write + view
        val freshCount = Observed.poll(freshObs).flatMap(_.get("fresh"))
          .map(_.asInstanceOf[Long])
        val known = j.filter(col("_in_batch").isNotNull && col("_cur_sk").isNotNull)
          .withColumn(skCol, col("_cur_sk"))
        val knownPart = known.select(cols.map(col): _*)
          .unionByName(j.filter(col("_in_batch").isNull) // untouched rows
            .withColumn(skCol, col("_cur_sk"))
            .select(((natKey :+ skCol).map(col) :+ col("_bucket")) ++
              attrs.map(c => col(s"_cur_$c").as(c)): _*)
            .select(cols.map(col): _*))
        // steady state has NO new keys in most batches — the observed count
        // (free: same job as the checkpoint) lets us skip KeyAssign's
        // partition-sizes job entirely, one fewer job per table per batch
        if (freshCount.contains(0L)) (knownPart, touched, maxSk)
        else {
          val fresh = j.filter(col("_in_batch").isNotNull && col("_cur_sk").isNull)
          val (freshKeyed, nNew) = KeyAssign.dense(fresh.drop("_cur_sk"), skCol, maxSk)
          (knownPart.unionByName(freshKeyed.select(cols.map(col): _*)),
            touched, maxSk + nNew)
        }
    }
    view(name, out, kept)
  }

  override def mergeFact(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame = {
    val cols = batch.columns.toIndexedSeq :+ "_bucket"
    if (!exists(name) && batch.isEmpty) return batch
    val (batchB, touched) = materialize(batch.withColumn("_bucket", bucketCol(natKey)))
    if (touched.isEmpty) return read(name)
    val others = batch.columns.filterNot(natKey.contains).toIndexedSeq
    val (out, kept) = commitLoop(name, replace = true) {
      case None =>
        (batchB.select(cols.map(col): _*), touched, 0L)
      case Some((maxSk, pairs)) =>
        // last-write-wins as ONE full-outer join + projection (batch row
        // wins where present, else the current row) — no anti-join, no
        // checkpoint: the commit's write executes the join exactly once,
        // and fact views are rarely re-consumed (the star pipeline ignores
        // the fact merge's return value)
        val curTouched = readPairs(name, pairs, Some(touched))
        val cur = curTouched.select((natKey :+ "_bucket").map(col) ++
          others.map(c => col(c).as(s"_cur_$c")): _*)
        val j = batchB.withColumn("_in_batch", lit(1))
          .join(cur, natKey :+ "_bucket", "full_outer")
        val merged = j.select((natKey :+ "_bucket").map(col) ++ others.map(c =>
          when(col("_in_batch").isNotNull, col(c)).otherwise(col(s"_cur_$c")).as(c)): _*)
        (merged, touched, maxSk)
    }
    view(name, out, kept)
  }

  /** Atomic whole-table replace: the new contents land as one version and
    * the manifest drops EVERY previous mapping — buckets absent from
    * `batch` cease to exist (merge semantics cannot delete by omission).
    * The CAS swap keeps the manifest consistent under races, but the
    * REPLACEMENT CONTENTS are the caller's snapshot — a merge committed
    * between the caller's read and this swap is superseded, so callers
    * serialize replaceTable against same-table writers (trait contract). */
  override def replaceTable(name: String, batch: DataFrame,
                            natKey: Seq[String]): DataFrame = {
    val (batchB, touched) = materialize(batch.withColumn("_bucket", bucketCol(natKey)))
    require(touched.nonEmpty, s"replaceTable($name) with an empty batch")
    val cols = batch.columns.toIndexedSeq :+ "_bucket"
    val (out, _) = commitLoop(name, replace = true, dropUntouched = true) { prev =>
      (batchB.select(cols.map(col): _*), touched, prev.map(_._1).getOrElse(0L))
    }
    out.drop("_bucket")
  }

  /** Append-only tables (e.g. audit trails): rows are spread across
    * buckets by a content hash — funneling every append into `_bucket=0`
    * (the previous design; VERDICT r3 "next #7") silently forfeited bucket
    * parallelism and pruning for large append tables. `replace=false`
    * keeps prior versions' mappings live alongside the new one. */
  override def appendTable(name: String, batch: DataFrame): DataFrame = {
    if (batch.isEmpty) return if (exists(name)) read(name) else batch
    val (out, touched) = materialize(batch.withColumn("_bucket",
      pmod(xxhash64(batch.columns.toIndexedSeq.map(col): _*), lit(nBuckets)).cast("int")))
    val (o, kept) = commitLoop(name, replace = false) { prev =>
      (out, touched, prev.map(_._1).getOrElse(0L))
    }
    view(name, o, kept)
  }
}

object BucketedMergeWriter {
  /** JVM-wide per-table commit locks (keyed by absolute table path): two
    * writer instances over the same root must serialize their manifest
    * check-and-swap even though each is independently constructed. */
  private val commitLocks = new ConcurrentHashMap[String, Object]()

  /** Absolute paths of reserved-but-uncommitted version dirs, so vacuum
    * never reaps a directory a concurrent commit is still writing. */
  private val inFlight = ConcurrentHashMap.newKeySet[String]()

  /** Monotonic per-table version allocator — see [[reserveVersion]]. */
  private val versionCounters =
    new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
}
