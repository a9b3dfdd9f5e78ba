package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators: a metrics/feature pipeline wants a
  * dense, gap-free daily grid per series (sensor, user cohort, event type)
  * even when the raw stream skips days.
  */
object TimeSeries {

  /** Daily gap-fill with forward fill: build the dense (series × day) spine
    * over the data's own date range, left-join the observed daily values,
    * and carry the last observation forward. Leading days before a series'
    * first observation stay NULL (there is nothing to carry), and every row
    * reports `was_gap` so downstream can weight imputed points.
    *
    * Scale shape: the spine is `distinct(series) × sequence(min,max)` — a
    * broadcast of one two-column row against the (usually small) series
    * dim, exploded map-side; the fill is a window PARTITIONED BY series
    * (never a global sort), so a million series fan out across the
    * cluster and each partition sorts only its own days.
    */
  def gapFillDaily(daily: DataFrame, seriesCol: String, dayCol: String,
                   valueCol: String): DataFrame = {
    // three consumers below (bounds, series dim, join side): materialize so
    // an expensive upstream (typically an aggregate over the raw event
    // stream) runs ONCE, not once per plan branch
    val d = daily.localCheckpoint(true)
    val bounds = d.agg(min(col(dayCol)).as("_mn"), max(col(dayCol)).as("_mx"))
    val spine = d.select(col(seriesCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(seriesCol), explode(sequence(col("_mn"), col("_mx"))).as(dayCol))
    val w = Window.partitionBy(col(seriesCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(d, Seq(seriesCol, dayCol), "left")
      .select(col(seriesCol), col(dayCol),
        col(valueCol).isNull.as("was_gap"),
        last(col(valueCol), ignoreNulls = true).over(w).as(valueCol))
  }
}
