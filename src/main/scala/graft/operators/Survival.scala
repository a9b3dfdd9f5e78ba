package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over activity spans — the Kaplan-Meier estimator a
  * retention/churn pipeline computes from raw event logs: each unit's
  * observed lifetime is `last event − first event`, a unit counts as a
  * churn EVENT if it went quiet STRICTLY more than `censorDays` before the
  * dataset's as-of timestamp, otherwise it is right-CENSORED (still
  * alive when observation ended).
  */
object Survival {

  /** Kaplan-Meier life table at day granularity.
    *
    * Engine parity: everything is integer except two readouts — the
    * per-day hazard `d/n` (one double division, rounded once) and the
    * survivor curve, which is carried in LOG domain as a cumulative sum
    * of per-term `round(ln((n−d)/n), 6)` DECIMAL(12,6) values (the
    * catalog's KL/LM discipline: round each transcendental term once,
    * then sum exactly — a float product like `exp(Σln)` would stack
    * engine-specific ulp error, the rounded-decimal sum cannot).
    *
    * Plan shape: one grouped aggregate per unit (key-partitioned), a
    * one-row as-of broadcast, then the life table itself — one row per
    * DISTINCT DAY-granularity duration. The cumulative windows over the
    * life table are unpartitioned BY DESIGN: the frame is bounded by the
    * observation span in days (a ~10³ control-plane frame at any corpus
    * size), not by the unit count.
    *
    * Output per duration day `dur_days`: `n_risk` (units with lifetime
    * ≥ d), `n_event`, `n_censored`, `hazard` = round(d/n, 6),
    * `log_survival` = Σ_{d'≤d} round(ln(1 − d/n), 6) as DOUBLE.
    */
  def kaplanMeier(events: DataFrame, unitCol: String = "user_id",
                  tsCol: String = "ts", censorDays: Int = 7): DataFrame = {
    require(censorDays >= 0, "censorDays must be non-negative")
    val us = events
      .filter(col(unitCol).isNotNull && col(tsCol).isNotNull)
      .select(col(unitCol).as("_u"), Times.epochMicros(col(tsCol)).as("_t"))
    val spans = us.groupBy(col("_u"))
      .agg(min(col("_t")).as("_first"), max(col("_t")).as("_last"))
    val asOf = us.agg(max(col("_t")).as("_asof"))
    val dayUs = 86_400_000_000L
    val perUnit = spans.crossJoin(broadcast(asOf))
      .select(
        // integer `div`, NOT `/`: Spark's `/` on longs is double division,
        // and a quotient a hair under an integer can round UP across the
        // day boundary — the oracle's `//` is integer, so must this be
        expr(s"CAST((_last - _first) DIV $dayUs AS LONG)").as("dur_days"),
        when(col("_last") < col("_asof") - lit(censorDays * dayUs), 1L)
          .otherwise(0L).as("_event"))
    val total = perUnit.agg(count(lit(1)).as("_total"))
    val table = perUnit.groupBy(col("dur_days"))
      .agg(sum(col("_event")).as("n_event"),
        sum(lit(1L) - col("_event")).as("n_censored"),
        count(lit(1)).as("_nd"))
      .crossJoin(broadcast(total))
    // control-plane frame: one row per DISTINCT duration day (≤ study
    // length in days) — the per-unit heavy lifting happened in the
    // partial agg above, so the single-partition window is O(days)
    val ordW = Window.orderBy(col("dur_days").asc)
    val risk = table
      // units leaving strictly before d: cumulative count minus this row
      .withColumn("n_risk",
        col("_total") -
          (sum(col("_nd")).over(ordW.rowsBetween(Window.unboundedPreceding, 0))
            - col("_nd")))
    risk
      // ln(0) guard: if EVERY at-risk unit events at d the survivor curve
      // hits exact zero — carried as the documented floor ln(1e-6) so the
      // decimal sum stays finite (the KL/LM zero-smoothing discipline)
      .withColumn("_term",
        when(col("n_event") > 0L && col("n_risk") === col("n_event"),
          lit(-13.815511).cast("decimal(12,6)"))
          .when(col("n_event") > 0L,
            round(log((col("n_risk") - col("n_event")).cast("double") /
              col("n_risk").cast("double")), 6).cast("decimal(12,6)"))
          .otherwise(lit(0).cast("decimal(12,6)")))
      .withColumn("log_survival",
        sum(col("_term")).over(ordW.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .select(col("dur_days"), col("n_risk"), col("n_event"),
        col("n_censored"),
        round(col("n_event").cast("double") / col("n_risk"), 6).as("hazard"),
        col("log_survival"))
  }
}
