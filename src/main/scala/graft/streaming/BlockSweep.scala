package graft.streaming

/** Deterministic per-batch cleanup of localCheckpoint blocks for the
  * streaming monitors — the [[StreamToStar]] sweep, extracted: every
  * frame a micro-batch eagerly checkpoints (directly, or inside a store
  * merge) is dead once the batch's writes land, but the ContextCleaner
  * only reclaims blocks on driver GC — a resident ProcessingTime query
  * would otherwise pin one block set per trigger in executor storage
  * memory between GCs (~7200/hour at a 500 ms trigger).
  *
  * The persistent-RDD diff is CONTEXT-global, so swept regions are
  * serialized JVM-wide through [[lock]]: a concurrent region's
  * just-checkpointed blocks must never land in this region's diff
  * (localCheckpoints truncate lineage — unpersisting one mid-read is
  * unrecoverable). Unrelated user caching racing a monitor on the same
  * session remains the caller's hazard, as documented on StreamToStar.
  *
  * Correct ONLY for batch-local frames: nothing checkpointed inside
  * `body` may be referenced after it returns (every monitor reads
  * cross-batch state from its STORE, never from a retained frame). */
private[graft] object BlockSweep {

  /** Shared with [[StreamToStar]] so star batches and monitors running
    * in one JVM serialize against each other's diff windows. */
  val lock = new Object

  def swept[T](sc: org.apache.spark.SparkContext)(body: => T): T =
    lock.synchronized {
      val before = sc.getPersistentRDDs.keySet
      try body finally {
        val after = sc.getPersistentRDDs
        (after.keySet -- before)
          .foreach(id => after.get(id).foreach(_.unpersist(blocking = false)))
      }
    }
}
