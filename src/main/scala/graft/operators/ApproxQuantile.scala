package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-sketch quantiles — the 100 TB scale path next to the exact
  * `percentile` aggregate (q59): exact percentiles sort every group's
  * values; this pass keeps `buckets` counters per group instead.
  *
  *   pass 1: per-group min/max/count (tiny, broadcast back);
  *   pass 2: equi-width bucket counts — fixed `buckets`-row state per
  *           group, mergeable map-side like any count aggregate;
  *   read-out: smallest bucket whose cumulative count reaches ⌈q·n⌉,
  *           estimate = the bucket's upper edge (error ≤ range/buckets).
  *
  * Engine parity: counts/cumsums are exact longs, the bucket index and
  * the edge formula are fixed-shape double expressions identical in any
  * engine, and estimates are round(…, 6) like every other float output.
  * Degenerate groups (min = max) are skipped by construction — their
  * quantile is the constant itself and needs no histogram.
  */
object ApproxQuantile {

  /** Per-group quantile estimates for `qs` (name → fraction), e.g.
    * `Seq("p50_est" -> 0.5, "p99_est" -> 0.99)`. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         qs: Seq[(String, Double)],
                         buckets: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      "quantile fractions must be in (0, 1]")
    require(buckets >= 2 && buckets <= (1 << 16), "buckets must be in [2, 65536]")
    val v = col(valueCol)
    // NULL values are excluded from n AND from the bucket stream — the
    // exact-percentile twin (q59/q86) ignores NULLs, and counting them
    // here would both inflate ceil(q·n) and (NULLS FIRST) pad every
    // cumulative count, dragging both bounds toward lower quantiles
    val mm = df.groupBy(col(groupCol))
      .agg(min(v).as("_mn"), max(v).as("_mx"), count(v).as("_n"))
      .withColumnRenamed(groupCol, "_grp")
    val b = df.filter(v.isNotNull)
      .join(broadcast(mm), col(groupCol) <=> col("_grp"))
      .filter(col("_mx") > col("_mn"))
      .select(col(groupCol),
        least(floor((v - col("_mn")) * buckets / (col("_mx") - col("_mn"))).cast("long"),
          lit(buckets - 1L)).as("_bkt"))
    val h = b.groupBy(col(groupCol), col("_bkt")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(col(groupCol), col("_bkt"), sum(col("_c")).over(w).as("_cc"))
      .join(broadcast(mm), col(groupCol) <=> col("_grp"))
    val picks = qs.map { case (name, q) =>
      min(when(col("_cc") >= ceil(lit(q) * col("_n")), col("_bkt"))).as(s"_b_$name")
    }
    cum.groupBy(col(groupCol), col("_mn"), col("_mx"))
      .agg(picks.head, picks.tail: _*)
      .select(col(groupCol) +: qs.map { case (name, _) =>
        round(col("_mn") + (col(s"_b_$name") + 1) * (col("_mx") - col("_mn")) / buckets, 6)
          .as(name)
      }: _*)
  }
}
