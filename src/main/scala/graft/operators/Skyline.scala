package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    *   3. global pass over the bucket survivors with the same
    *      running-max filter. Sound because each bucket's overall best
    *      `maxCol` always survives its local pass, so the cross-bucket
    *      running max over survivors equals the running max over ALL
    *      points — the standard divide-and-merge skyline decomposition.
    *
    * The phase-3 window is unpartitioned BY DESIGN over the survivor
    * frame only — bounded by Σ per-bucket front sizes, a vanishing
    * fraction of the input (fronts are the anti-chain of the dominance
    * order); the data-sized windows in phases 1-2 are all partitioned.
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
    val local = bucketed
      .withColumn("_m", max(col("v_max")).over(
        Window.partitionBy(col("_bkt")).orderBy(col("v_min").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("_m").isNull || col("_m") < col("v_max"))
      .drop("_m")
    // survivors-only global merge: tiny frame (the candidate anti-chain)
    local
      .withColumn("_m", max(col("v_max")).over(
        Window.orderBy(col("v_min").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("_m").isNull || col("_m") < col("v_max"))
      .select(col("v_min"), col("v_max"), col("n_rows"))
  }
}
