package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-arithmetic statistics verdicts — the [[TimeSeries.rollingAnomalies]]
  * family: decisions a pipeline branches on must be engine-exact, so the
  * comparisons run in integer/decimal arithmetic and only display values
  * pass through floats (rounded).
  */
object Stats {

  /** Group-wise Pearson correlation between two INTEGER-valued metrics,
    * with an exact strength verdict: `strong` ⇔ corr² > threshold², cross-
    * multiplied into DECIMAL(38,0) so the decision never touches a float —
    * `(n·Σxy − ΣxΣy)² · tDen² > tNum² · (n·Σx²−(Σx)²) · (n·Σy²−(Σy)²)`
    * with threshold = tNum/tDen. The displayed `corr` is the same exact
    * integers pushed through one fixed-shape double expression, rounded
    * to 6 (the cosine-rank crutch); the VERDICT does not depend on it.
    *
    * Inputs must already be integral (longs — scale fixed-point metrics
    * up front, e.g. cents instead of dollars). Exactness bound: the
    * decimal cross-products stay under 38 digits while
    * `n·max|x|·max|y| < ~1e17` and the variance products stay under
    * ~1e37 — comfortably true for per-group slices into the billions of
    * rows with bounded metrics; past that, rescale the metrics.
    *
    * Scale: ONE hash-aggregate over the group key (six long sums, map-
    * side partial); everything after runs on one row per group.
    */
  def corrVerdict(df: DataFrame, groupCol: String, x: Column, y: Column,
                  thresholdNum: Int = 1, thresholdDen: Int = 2): DataFrame = {
    val g = df.select(col(groupCol), x.cast("long").as("_x"), y.cast("long").as("_y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val num = d(col("n")) * d(col("_sxy")) - d(col("_sx")) * d(col("_sy"))
    val denx = d(col("n")) * d(col("_sxx")) - d(col("_sx")) * d(col("_sx"))
    val deny = d(col("n")) * d(col("_syy")) - d(col("_sy")) * d(col("_sy"))
    val corr = round(num.cast("double") /
      (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))), 6)
    // Outside the documented bound, non-ANSI decimal multiply returns NULL
    // — without a guard `strong` would silently become NULL and a pipeline
    // branching on it would treat the group as neither strong nor weak.
    // Detect overflow (product NULL while its inputs are not) and fail
    // LOUDLY instead.
    val lhs = num * num * lit(thresholdDen.toLong * thresholdDen)
    val rhs = lit(thresholdNum.toLong * thresholdNum) * denx * deny
    val inputsOk = col("_sx").isNotNull && col("_sy").isNotNull &&
      col("_sxy").isNotNull && col("_sxx").isNotNull && col("_syy").isNotNull
    val overflowed = inputsOk &&
      (num.isNull || denx.isNull || deny.isNull || lhs.isNull || rhs.isNull)
    g.select(col(groupCol), col("n"),
      when(denx > 0 && deny > 0, corr).as("corr"),
      when(overflowed, raise_error(concat(
          lit("corrVerdict: decimal overflow in group "), col(groupCol).cast("string"),
          lit(" — rescale the metrics (bound: n*max|x|*max|y| < ~1e17)"))))
        .otherwise(denx > 0 && deny > 0 && lhs > rhs).as("strong"))
  }
}
