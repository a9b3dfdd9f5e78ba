package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Pareto-skyline (dominance) queries — "no other row is at least as good
  * on both axes and strictly better on one". The classic multi-criteria
  * shortlist operator (cheapest-vs-best trade-off curves, model
  * quality-vs-cost frontiers).
  */
object Skyline {

  /** 2-D skyline minimizing `minCol` and maximizing `maxCol`, exact.
    *
    * Algorithm (O(n log n), never the O(n²) all-pairs the textbook
    * NOT-EXISTS definition implies — the oracle replays THAT definition,
    * so the two independent algorithms cross-check each other):
    *   1. reduce to one row per distinct `minCol` value keeping the best
    *      `maxCol` (key-partitioned aggregate) + the count of rows tied
    *      at that best point;
    *   2. per-bucket sorted scan: bucket by `minCol` range (bucket stats
    *      ride a one-row broadcast), and inside each bucket keep a point
    *      only if its `maxCol` beats the running max of all
    *      strictly-cheaper in-bucket points (bucket-partitioned window);
    *   3. cross-bucket merge via the two-pass range-offset pattern
    *      (`Packing.packSequences`): per-bucket max `maxCol` (one row
    *      per nonempty bucket, ≤ `buckets` rows), an ordered prefix max
    *      over that TINY control-plane frame, broadcast back — a local
    *      survivor is global iff it beats the prefix max of all earlier
    *      buckets. Sound because bucketing is monotone in `minCol`
    *      (earlier buckets = strictly cheaper points) and the local pass
    *      already proved each survivor beats every strictly-cheaper
    *      IN-bucket point.
    *
    * No window ever ranges over a data-sized unpartitioned frame: the
    * only unpartitioned window is the ≤ `buckets`-row prefix max (the
    * documented control-plane exception), so a worst-case anti-chain
    * (strictly increasing `maxCol` — the whole input IS the front)
    * cannot serialize the merge into one task.
    *
    * Output: one row per front point — `v_min`, `v_max` (the per-point
    * best), `n_rows` (input rows sitting exactly on that point).
    */
  def paretoFront2d(df: DataFrame, minCol: String, maxCol: String,
                    buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= 4096, "buckets out of range")
    val pts = df
      .filter(col(minCol).isNotNull && col(maxCol).isNotNull)
      .select(col(minCol).as("v_min"), col(maxCol).as("v_max"))
    // one row per distinct v_min: best v_max + rows tied at that point
    val perMin = pts.groupBy(col("v_min"), col("v_max"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_best",
        max(col("v_max")).over(Window.partitionBy(col("v_min"))))
      .filter(col("v_max") === col("_best"))
      .select(col("v_min"), col("v_max"), col("_n").as("n_rows"))
    val stats = pts.agg(min(col("v_min")).cast("double").as("_lo"),
      max(col("v_min")).cast("double").as("_hi"))
    val bucketed = perMin.crossJoin(broadcast(stats))
      .withColumn("_bkt",
        when(col("_hi") === col("_lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v_min").cast("double") - col("_lo")) * buckets /
              (col("_hi") - col("_lo"))).cast("int"))))
      // checkpoint the ONE-ROW-PER-DISTINCT-v_min frame: both the
      // prefix-max pass and the local pass consume it, and without the
      // cut each re-runs the full input scan + perMin window
      .materialized
    val local = bucketed
      .withColumn("_m", max(col("v_max")).over(
        Window.partitionBy(col("_bkt")).orderBy(col("v_min").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("_m").isNull || col("_m") < col("v_max"))
      .drop("_m")
    // cross-bucket prefix max over the ≤buckets-row bucket frame (the
    // one control-plane unpartitioned window), broadcast back: a local
    // survivor is a global front point iff it beats every earlier
    // (strictly cheaper) bucket's best v_max.
    val prevMax = bucketed.groupBy(col("_bkt").as("_pb"))
      .agg(max(col("v_max")).as("_bmax"))
      .withColumn("_prev", max(col("_bmax")).over(
        Window.orderBy(col("_pb").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .drop("_bmax")
      .materialized
    local.join(broadcast(prevMax), col("_bkt") === col("_pb"))
      .filter(col("_prev").isNull || col("_prev") < col("v_max"))
      .select(col("v_min"), col("v_max"), col("n_rows"))
  }
}
