package graft.plans

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** The ONE commit path both table stores share (VERDICT r3 "next #8"):
  * versioned directories + an atomically-swapped pointer file, with
  * optimistic concurrency.
  *
  * A table is a directory holding immutable version subdirectories
  * `v0/ v1/ …` plus a single pointer file (`_CURRENT` for the simple
  * store, `_MANIFEST` for the bucketed one) whose CONTENT names the live
  * version(s). All durability and isolation properties live here:
  *
  *   - **Atomic visibility** — the pointer is replaced via tmp-file +
  *     `ATOMIC_MOVE`; readers either see the whole old state or the whole
  *     new state. A crash mid-commit leaves an orphan version directory no
  *     pointer references, which [[reserveVersion]] never reuses and a
  *     vacuum can reap.
  *   - **Optimistic concurrency** — [[commitLoop]] snapshots the pointer
  *     content, lets the caller compute and write a fresh version
  *     directory UNLOCKED, then swaps only if the pointer is still
  *     byte-identical to the snapshot. A loser deletes its version dir and
  *     recomputes against the winner's state (its per-key decisions are
  *     state-dependent, so a blind pointer retry would lose the winner's
  *     updates). This is the Delta/Iceberg commit model, and stands in for
  *     the serialization Postgres gives the reference for free
  *     (reference: flink/stream_to_star.py:99-282, ON CONFLICT).
  *   - **Version allocation** — a JVM-wide monotonic counter per table,
  *     floored by a directory scan, so version numbers are never reused
  *     even while a conflict loser is still deleting its directory (a
  *     scan-only scheme would hand the loser's number to the next writer
  *     mid-delete). Reserved dirs are registered in-flight so vacuum never
  *     reaps a directory a concurrent commit is still writing.
  *
  * The check-and-swap critical section is a JVM-wide per-table lock
  * (commit = one file rename; no Spark job runs inside the lock). Writers
  * in DIFFERENT processes additionally need a shared lock service for the
  * swap itself — the documented deployment model is all writers of a table
  * in one driver (ingestion + compaction + vacuum), which is what
  * Structured Streaming gives.
  */
object CommitProtocol {

  /** One commit attempt, produced by the caller's `compute` against a
    * pointer snapshot.
    *
    * @param writeVersion writes the new data into version dir `v`
    *                     (unlocked — the expensive Spark job)
    * @param swap         executed under the table lock after the CAS check
    *                     passes; must atomically replace the pointer (via
    *                     [[atomicWrite]]) with content referencing `v`
    * @param result       the caller-visible result once `v` is committed
    */
  final case class Attempt[T](
      writeVersion: Long => Unit,
      swap: Long => Unit,
      result: Long => T)

  private val commitLocks = new ConcurrentHashMap[String, Object]()
  private val versionCounters = new ConcurrentHashMap[String, AtomicLong]()
  /** `"$tableKey/v$n"` entries reserved but not yet committed/discarded. */
  private val inFlight = ConcurrentHashMap.newKeySet[String]()

  /** Canonical identity of a table directory (absolute, normalized) —
    * two store instances over the same path share locks and counters. */
  def tableKey(tableDir: String): String =
    Paths.get(tableDir).toAbsolutePath.normalize.toString

  def lockFor(tableDir: String): Object =
    commitLocks.computeIfAbsent(tableKey(tableDir), _ => new Object)

  /** Pointer content, None if the table does not exist yet. */
  def readPointer(tableDir: String, pointerFile: String): Option[String] = {
    val p = Paths.get(tableDir, pointerFile)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p))) else None
  }

  /** tmp-file + ATOMIC_MOVE replace — the only way pointers are written. */
  def atomicWrite(tableDir: String, pointerFile: String, body: String): Unit = {
    val tmp = Paths.get(tableDir, s"$pointerFile.tmp")
    Files.write(tmp, body.getBytes)
    Files.move(tmp, Paths.get(tableDir, pointerFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Next unused version number — scanned from the directory (orphans from
    * crashed commits are skipped, never reused), floored by the JVM-wide
    * monotonic counter (numbers never reused while a loser's delete is in
    * progress). Creates the directory and registers it in-flight, all
    * under the table lock. */
  def reserveVersion(tableDir: String): Long = lockFor(tableDir).synchronized {
    Files.createDirectories(Paths.get(tableDir))
    val scanned = {
      val ls = Files.list(Paths.get(tableDir)) // close: one leaked fd per commit adds up
      try ls.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d+") => s.drop(1).toLong }
        .foldLeft(-1L)(math.max) + 1
      finally ls.close()
    }
    val ctr = versionCounters.computeIfAbsent(tableKey(tableDir), _ => new AtomicLong(-1L))
    val v = math.max(scanned, ctr.get + 1)
    ctr.set(v)
    Files.createDirectories(Paths.get(s"$tableDir/v$v"))
    inFlight.add(s"${tableKey(tableDir)}/v$v")
    v
  }

  /** Is `vN/` reserved by a commit that has neither landed nor aborted? */
  def isInFlight(tableDir: String, versionName: String): Boolean =
    inFlight.contains(s"${tableKey(tableDir)}/$versionName")

  def deleteDir(path: Path): Unit =
    if (Files.exists(path)) {
      val walk = Files.walk(path)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }

  /** One optimistic attempt: compute against the current pointer snapshot,
    * write, CAS-swap. Returns None on a lost race (the reserved version
    * dir is deleted); the caller decides whether to retry ([[commitLoop]])
    * or abandon (compaction — the next commit re-triggers it). */
  def commitOnce[T](tableDir: String, pointerFile: String)
      (compute: Option[String] => Attempt[T]): Option[T] = {
    val snap = readPointer(tableDir, pointerFile)
    val attempt = compute(snap)
    val v = reserveVersion(tableDir)
    // `committed` flips the moment swap() lands: from then on v is the
    // LIVE version and must never be deleted — even if the result thunk
    // below throws, the pointer already references v
    var committed = false
    // in-flight registration is released in finally: a failed write (or
    // cancellation) must not leak the entry, or vacuum could never reclaim
    // the half-written dir for the life of the JVM
    try {
      attempt.writeVersion(v)
      lockFor(tableDir).synchronized {
        if (readPointer(tableDir, pointerFile) == snap) {
          attempt.swap(v)
          committed = true
        }
      }
    } finally {
      // losers/failures delete before deregistering so vacuum never races
      // the walk; winners deregister their (now live) dir only
      if (!committed) deleteDir(Paths.get(s"$tableDir/v$v"))
      inFlight.remove(s"${tableKey(tableDir)}/v$v")
    }
    if (committed) Some(attempt.result(v)) else None
  }

  /** The standard writer path: retry [[commitOnce]] until the swap lands
    * (each retry recomputes against the new winner's state). */
  def commitLoop[T](tableDir: String, pointerFile: String, maxRetries: Int = 20)
      (compute: Option[String] => Attempt[T]): T = {
    for (_ <- 1 to maxRetries)
      commitOnce(tableDir, pointerFile)(compute).foreach(r => return r)
    throw new IllegalStateException(
      s"table $tableDir: $maxRetries consecutive commit conflicts")
  }

  /** Delete version directories the live set does not reference — except
    * in-flight ones. `liveVersions` comes from the store's pointer parse;
    * `ageMillis` maps a dead version to its age (tombstone- or
    * mtime-based) for retention. Runs under the table lock so it never
    * interleaves with a commit's check-and-swap. Returns reclaimed
    * version numbers. */
  def vacuumVersions(tableDir: String, liveVersions: Set[Long],
                     retainMillis: Long = 0L,
                     ageMillis: Path => Long): Seq[Long] =
    lockFor(tableDir).synchronized {
      if (!Files.exists(Paths.get(tableDir))) return Nil // never-written table: no-op
      val ls = Files.list(Paths.get(tableDir))
      val dead = try ls.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+"))
        .filterNot(p => liveVersions.contains(p.getFileName.toString.drop(1).toLong))
        .filterNot(p => isInFlight(tableDir, p.getFileName.toString))
        .filter(p => ageMillis(p) >= retainMillis)
        .toList
      finally ls.close()
      dead.foreach(deleteDir)
      dead.map(_.getFileName.toString.drop(1).toLong)
    }
}
