package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-spread guard for CPU-heavy per-row stages (the codec
  * `mapPartitions` legs: image/audio decode, WARC/gzip member walks, Avro
  * block parses, synth fixtures).
  *
  * Why it exists: those stages inherit the INPUT's partition count, and a
  * single-row-group parquet file (exactly what the sf0.1 `documents` /
  * `events` tables are) pins the whole chain to ONE core of 32 — a busy
  * box then measures a 0.9 s query at 15 s because one pinned core cannot
  * absorb contention. AQE's small-shuffle coalescing re-creates the same
  * shape after a groupBy, so even shuffle-fed codec legs need the guard.
  *
  * Why it is scale-safe: the spread fires ONLY when the input has fewer
  * partitions than the session's parallelism. A real 100 TB corpus is
  * many thousands of files/row-groups, so the condition is false and no
  * shuffle of payload bytes is ever added where partitioning is already
  * adequate. Round-robin repartitioning is row-deterministic under
  * retries (Spark sorts within partitions first), and every guarded stage
  * is per-row map-only, so result content is unaffected.
  */
object Spread {

  /** `df` repartitioned to `defaultParallelism` iff it is a batch,
    * SCAN-SHAPED (exchange-free) frame with fewer partitions than that;
    * streaming frames, already-wide inputs, and exchange-bearing plans
    * pass through untouched.
    *
    * Why exchange-bearing plans are skipped: (a) their runtime
    * parallelism is governed by `spark.sql.shuffle.partitions` and AQE's
    * parallelism-first coalescing floor, not by input file splits — the
    * single-row-group pathology cannot arise there; (b) probing `.rdd`
    * under AQE MATERIALIZES every upstream query stage (real shuffle
    * jobs, run once for the probe and again by the actual query — and
    * plan-only contexts like PlanDump would launch jobs). On an
    * exchange-free plan, `.rdd` is pure wiring: partition count comes
    * from driver-side file-split listing, no job runs. */
  def toCores(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.executedPlan.toString.contains("Exchange")) return df
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
