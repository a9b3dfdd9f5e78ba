package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** S4 — idempotent MERGE upsert into versioned parquet tables, with stable
  * surrogate keys (SURVEY.md §7.3).
  *
  * The reference delegates upsert/dedup/key-assignment to PostgreSQL with
  * 7 synchronous statements per record (reference:
  * flink/stream_to_star.py:99-282) — a per-record RPC anti-pattern. Here a
  * whole micro-batch merges in ONE set-oriented pass:
  *
  *   1. collapse the batch to one row per natural key (last write wins),
  *   2. LEFT join against the current table on the natural key,
  *   3. keep the existing surrogate key where found; assign
  *      max(existing)+row_number() to genuinely-new keys,
  *   4. anti-join the current table to carry over untouched rows,
  *   5. write a NEW version directory and atomically flip a pointer file.
  *
  * Key stability (SURVEY.md §7.4.2): an sk, once assigned to a natural key,
  * never changes — replaying a batch is a no-op on keys (idempotent), so a
  * wiped checkpoint converges, same effectively-once guarantee as the
  * reference's ON CONFLICT upsert.
  *
  * Commits go through the SAME [[CommitProtocol]] as the bucketed store
  * (VERDICT r3 "next #8"): the `_CURRENT` pointer swap is compare-and-swap,
  * so two concurrent writers of one table never silently drop each other's
  * rows — the loser recomputes its merge against the winner's committed
  * state and retries. Previously this store bumped the version blindly,
  * which had both a lost-update window and a version-collision window.
  *
  * Scale: steps 1–4 are shuffle-partitioned on the natural key; the only
  * global point is max(sk) (a scalar) and the row_number for NEW keys only
  * (new-keys-per-batch is small in steady state; if a first batch is huge,
  * swap in zipWithIndex-style assignment — semantics identical). On a real
  * cluster the same algorithm runs as a Delta/Iceberg MERGE INTO; versioned
  * parquet + pointer-swap is the dependency-free equivalent with the same
  * atomicity contract.
  */
class MergeWriter(spark: SparkSession, root: String) extends TableStore {
  import CommitProtocol.Attempt

  private def tableDir(name: String) = s"$root/$name"
  private val PointerFile = "_CURRENT"

  def exists(name: String): Boolean =
    Files.exists(Paths.get(tableDir(name), PointerFile))

  private def readVersion(name: String, v: String): DataFrame =
    spark.read.parquet(s"${tableDir(name)}/${v.trim}")

  def read(name: String): DataFrame =
    readVersion(name, CommitProtocol.readPointer(tableDir(name), PointerFile)
      .getOrElse(throw new java.nio.file.NoSuchFileException(
        s"${tableDir(name)}/$PointerFile")))

  /** The store's one Attempt shape: write `out` (already materialized via
    * localCheckpoint — the write is a cheap replay from memory) as version
    * v, flip `_CURRENT` to it. Every commit path below builds exactly
    * this, differing only in how `out` is computed from the snapshot. */
  private def casAttempt(name: String, out: DataFrame): Attempt[DataFrame] =
    Attempt[DataFrame](
      writeVersion = v => out.write.mode("overwrite")
        .parquet(s"${tableDir(name)}/v$v"),
      swap = v => CommitProtocol.atomicWrite(tableDir(name), PointerFile, s"v$v"),
      result = _ => out)

  /** Distributed dense id assignment — see [[KeyAssign.dense]] (shared with
    * BucketedMergeWriter; no global window, no single-task sort). */
  private def assignKeys(df: DataFrame, skCol: String, offset: Long): DataFrame =
    KeyAssign.dense(df, skCol, offset)._1

  /** Upsert `batch` (already one row per natural key, e.g. via
    * StarSchema.lastWriteWins) into table `name`; returns the post-merge
    * table. `skCol` is assigned here and must not be present in `batch`.
    *
    * The whole merge runs inside the commit loop: `cur` is read from the
    * pointer SNAPSHOT the loop hands us, so a conflict retry recomputes
    * the merge (existing sks, untouched rows) against the winner's state
    * rather than blindly re-swapping a stale result. */
  def mergeDim(name: String, batch: DataFrame, natKey: Seq[String], skCol: String): DataFrame = {
    require(!batch.columns.contains(skCol),
      s"batch must not carry the surrogate key column '$skCol' " +
        "(the merge writer assigns it)")
    // same internal-marker guard as mergeFact/the bucketed store: a user
    // _cur_* column would collide with the stored-side aliases below and
    // die with an opaque ambiguous-reference error instead of this one
    batch.columns.foreach { c =>
      require(c != "_in_batch" && !c.startsWith("_cur_"),
        s"column name '$c' collides with the merge writer's internal " +
          "markers (_in_batch, _cur_*) — rename it before merging")
    }
    // empty-batch short-circuit (the bucketed store's behavior): never
    // rewrite the whole table into a new version for a no-op
    if (batch.isEmpty)
      return if (exists(name)) read(name) else batch.withColumn(skCol, lit(0L))
    CommitProtocol.commitLoop(tableDir(name), PointerFile) { snap =>
      val merged = snap match {
        case None => assignKeys(batch, skCol, 0L)
        case Some(curV) =>
          val cur = readVersion(name, curV)
          // same ADDITIVE evolution contract as the bucketed store: new
          // batch columns append (stored rows NULL), batch-omitted stored
          // columns are retained on updates / NULL on inserts, shared
          // columns must type-match loudly
          SchemaEvolution.requireCompatible(name, batch, cur)
          val keyCols = natKey.map(col)
          val storedFields = cur.schema.fields.toSeq
            .filterNot(f => (natKey :+ skCol).contains(f.name))
          val batchFields = batch.schema.fields.toSeq
            .filterNot(f => natKey.contains(f.name))
          val allAttrs = SchemaEvolution.unionAttrs(storedFields, batchFields)
          val batchHas = batchFields.map(_.name).toSet
          val storedHas = storedFields.map(_.name).toSet
          // the join carries sk AND the stored-only attrs (for retention)
          val storedOnly = storedFields.filterNot(f => batchHas(f.name))
          // checkpoint ONCE: the join otherwise re-executes in KeyAssign's
          // per-partition sizes job and again in each union branch (the
          // pattern the bucketed writer documents and fixes the same way)
          // NULL-SAFE key match (the bucketed store's contract): a plain
          // usingColumns join never matches NULL keys, so a NULL-keyed
          // row would take a fresh sk on every replay
          val joined = batch.join(cur.select(
              (natKey.map(k => col(k).as(s"_cur_$k")) :+ col(skCol)) ++
              storedOnly.map(f => col(f.name).as(s"_cur_${f.name}")): _*),
              natKey.map(k => col(k) <=> col(s"_cur_$k")).reduce(_ && _), "left")
            .drop(natKey.map(k => s"_cur_$k"): _*)
            .materialized
          val known = joined.filter(col(skCol).isNotNull)
          val fresh = joined.filter(col(skCol).isNull).drop(skCol)
          // max(sk) is NULL on an empty current table — guard the scalar
          val maxSk = Option(cur.agg(max(col(skCol))).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
          val freshKeyed = assignKeys(fresh, skCol, maxSk)
          // untouched = current rows whose key is not in the batch
          val untouched = cur.join(
            batch.select(natKey.map(k => col(k).as(s"_cur_$k")): _*),
            natKey.map(k => col(k) <=> col(s"_cur_$k")).reduce(_ && _), "left_anti")
          val heads = (natKey :+ skCol).map(col)
          untouched.select(heads ++ allAttrs.map(f =>
              (if (storedHas(f.name)) col(f.name)
               else lit(null).cast(f.dataType)).as(f.name)): _*)
            .unionByName(known.select(heads ++ allAttrs.map(f =>
              (if (batchHas(f.name)) col(f.name)
               else col(s"_cur_${f.name}")).as(f.name)): _*))
            .unionByName(freshKeyed.select(heads ++ allAttrs.map(f =>
              (if (batchHas(f.name)) col(f.name)
               else lit(null).cast(f.dataType)).as(f.name)): _*))
      }
      // cut lineage before overwrite; result is in memory — no re-scan
      casAttempt(name, merged.materialized)
    }
  }

  /** Append-only table (dead-letter channel): new version = current ∪
    * batch. Rewrites the table per batch like the other merges — at real
    * scale back this with an appendable format; the dead-letter stream is
    * tiny relative to the feed by construction. */
  def appendTable(name: String, batch: DataFrame): DataFrame =
    CommitProtocol.commitLoop(tableDir(name), PointerFile) { snap =>
      val merged = snap match {
        case None    => batch
        case Some(v) =>
          val cur = readVersion(name, v)
          SchemaEvolution.requireCompatible(name, batch, cur)
          cur.unionByName(batch, allowMissingColumns = true)
      }
      casAttempt(name, merged.materialized)
    }

  /** Atomic whole-table replace: a fresh version + pointer flip. The
    * replacement contents are the CALLER's snapshot (trait contract:
    * serialize against writers whose commits must not be superseded). */
  def replaceTable(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame = {
    val out = batch.materialized
    require(!out.isEmpty, s"replaceTable($name) with an empty batch (trait contract)")
    CommitProtocol.commitLoop(tableDir(name), PointerFile)(_ => casAttempt(name, out))
  }

  /** Fact upsert: pure last-write-wins on the fact natural key, no sk.
    * Additive evolution matches [[mergeDim]]: batch-only columns append,
    * batch-omitted stored columns are retained on updated rows. */
  def mergeFact(name: String, batch: DataFrame, natKey: Seq[String]): DataFrame = {
    // empty-batch short-circuit: no version churn for a no-op
    if (batch.isEmpty) return if (exists(name)) read(name) else batch
    CommitProtocol.commitLoop(tableDir(name), PointerFile) { snap =>
      val merged = snap match {
        case None => batch
        case Some(v) =>
          val cur = readVersion(name, v)
          SchemaEvolution.requireCompatible(name, batch, cur)
          // internal marker/prefix names must fail LOUDLY, not silently
          // overwrite user data (the BucketedMergeWriter guard)
          batch.columns.foreach { c =>
            require(c != "_in_batch" && !c.startsWith("_cur_"),
              s"column name '$c' collides with the merge writer's internal " +
                "markers (_in_batch, _cur_*) — rename it before merging")
          }
          val storedFields = cur.schema.fields.toSeq
            .filterNot(f => natKey.contains(f.name))
          val batchFields = batch.schema.fields.toSeq
            .filterNot(f => natKey.contains(f.name))
          val allOthers = SchemaEvolution.unionAttrs(storedFields, batchFields)
          val batchHas = batchFields.map(_.name).toSet
          val storedHas = storedFields.map(_.name).toSet
          // null-safe key match — see mergeDim's note
          val cur2 = cur.select(natKey.map(k => col(k).as(s"_cur_$k")) ++
            storedFields.map(f => col(f.name).as(s"_cur_${f.name}")): _*)
          val j0 = batch.withColumn("_in_batch", lit(1))
            .join(cur2, natKey.map(k => col(k) <=> col(s"_cur_$k")).reduce(_ && _),
              "full_outer")
          natKey.foldLeft(j0) { (d, k) =>
              d.withColumn(k, when(col("_in_batch").isNotNull, col(k))
                .otherwise(col(s"_cur_$k"))).drop(s"_cur_$k")
            }
            .select(natKey.map(col) ++ allOthers.map { f =>
              (if (batchHas(f.name) && storedHas(f.name))
                 when(col("_in_batch").isNotNull, col(f.name))
                   .otherwise(col(s"_cur_${f.name}"))
               else if (batchHas(f.name))
                 when(col("_in_batch").isNotNull, col(f.name))
               else col(s"_cur_${f.name}"))
                .as(f.name)
            }: _*)
      }
      casAttempt(name, merged.materialized)
    }
  }

  /** Reclaim superseded version directories (all but the pointer target),
    * skipping in-flight commits. `retainMillis` ages by directory mtime —
    * this store keeps no tombstones, so retention is measured from version
    * creation (conservative: a version is at least that old when reaped). */
  override def vacuum(name: String, retainMillis: Long = 0L): Unit =
    // under the TABLE LOCK (the BucketedMergeWriter discipline): reading
    // the pointer outside it races a commit landing between the read and
    // the sweep — the just-committed version is not in `live`, no longer
    // in-flight, and at retain 0 would be DELETED while _CURRENT
    // references it (dangling pointer, data loss)
    CommitProtocol.lockFor(tableDir(name)).synchronized {
      val live = CommitProtocol.readPointer(tableDir(name), PointerFile)
        .map(_.trim.drop(1).toLong).toSet
      val now = System.currentTimeMillis()
      CommitProtocol.vacuumVersions(tableDir(name), live, retainMillis,
        p => now - Files.getLastModifiedTime(p).toMillis)
      ()
    }
}
