package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM×STREAM interval join — the attribution primitive
  * (impression ⨝ click within a horizon) and the last Structured-Streaming
  * join surface the engine exposes: both inputs are unbounded, so Spark
  * buffers each side in keyed state and the JOIN CONDITION'S time bounds +
  * the watermarks are what let it evict — without them state grows
  * forever and the query is rejected for outer joins.
  *
  * Semantics (Spark's own): a right row r matches a left row l when the
  * keys are equal and `l.ts <= r.ts <= l.ts + horizon`. With watermark
  * delay w, the runtime keeps left state until the RIGHT watermark passes
  * `l.ts + horizon` (no future right row could match) and right state
  * until the LEFT watermark passes `r.ts` — both derived from the interval
  * bounds, which is why the bounds must appear IN the join condition, not
  * as a post-filter. `left_outer` additionally emits (l, NULLs) once l's
  * no-match fate is sealed — i.e. only after the watermark crosses, one
  * trigger later; an attribution pipeline reads those as "impression
  * never converted". `right_outer` is the mirror — (NULLs, r) for a click
  * that never attributed to any impression (the fraud/orphan signal) —
  * and `full_outer` emits both sealed-null shapes.
  *
  * Scale: state is per-key and time-bounded — at 1000 executors the join
  * shuffles both streams by key and each task holds only `horizon + w` of
  * its keys' history; the horizon is the state-size knob (audit with the
  * StateOperatorProgress numbers, not hope).
  *
  * The two inputs must not share column names besides `keyCol` (the
  * attribution schema: impressions carry imp_*, clicks carry click_*).
  */
object StreamStreamJoin {

  def attribute(impressions: DataFrame, clicks: DataFrame, keyCol: String,
                leftTsCol: String, rightTsCol: String,
                horizon: String = "30 minutes",
                watermarkDelay: String = "10 minutes",
                joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer", "right_outer", "full_outer")
      .contains(joinType),
      s"joinType must be inner/left_outer/right_outer/full_outer, got $joinType")
    val overlap = impressions.columns.toSet
      .intersect(clicks.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"sides share non-key columns: ${overlap.mkString(", ")}")
    require(!clicks.columns.contains("_rk") &&
      !impressions.columns.contains("_rk") && keyCol != "_rk",
      "column name '_rk' collides with the join's internal key alias")
    val l = impressions.withWatermark(leftTsCol, watermarkDelay)
    val r = clicks.withWatermark(rightTsCol, watermarkDelay)
      .withColumnRenamed(keyCol, "_rk")
    l.join(r,
        col(keyCol) === col("_rk") &&
          col(rightTsCol) >= col(leftTsCol) &&
          col(rightTsCol) <= col(leftTsCol) + expr(s"interval $horizon"),
        joinType)
      // right_outer/full_outer emit rows whose LEFT side is all-NULL —
      // the key must survive from whichever side is present
      .withColumn(keyCol, coalesce(col(keyCol), col("_rk")))
      .drop("_rk")
  }
}
