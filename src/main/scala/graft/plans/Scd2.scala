package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from a change log.
  *
  * The reference's star schema is type-1 (ON CONFLICT DO UPDATE overwrites
  * the dimension row — history is lost; reference:
  * flink/stream_to_star.py:261-269). This builds the type-2 view a
  * warehouse actually wants from the same event stream: one row per
  * (key, state run), with `effective_from`/`effective_to` validity bounds,
  * a per-key `version` sequence, and `is_current` on the open row.
  *
  *   1. order each key's events by (ts, tie-break id) — the tie-break makes
  *      the history DETERMINISTIC under equal timestamps (replay-stable);
  *   2. keep rows where the tracked attribute CHANGED vs the previous
  *      event (lag) — consecutive duplicates collapse into one validity
  *      interval;
  *   3. close each interval at the next change's start (lead); the last
  *      interval stays open (NULL end, is_current).
  *
  * Scale: two window passes, both partitioned by the dimension key — one
  * shuffle on the key, no global ordering anywhere. Keys are independent,
  * so skew only matters for a single pathological key (salt the run-length
  * collapse first if one key dominates). This is the standard
  * change-data-capture → SCD2 compaction shape.
  */
object Scd2 {

  /** Build the SCD2 history of `attrCol` per `keyCol` from an event log.
    * `ordCol` breaks ts ties (any unique id). Output: key, state,
    * effective_from, effective_to (NULL = open), version, is_current. */
  def history(events: DataFrame, keyCol: String, attrCol: String,
              tsCol: String, ordCol: String): DataFrame = {
    // ONE window spec for both passes: the change-detection lag and the
    // interval-closing lead/row_number must never desynchronize their
    // ordering (and sharing the spec lets the second pass reuse the first
    // pass's exchange + sort — PlanSpec asserts the single shuffle)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val changes = events
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
    changes
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(keyCol), col(attrCol).as("state"),
        col(tsCol).as("effective_from"), col("effective_to"), col("version"),
        col("effective_to").isNull.as("is_current"))
  }
}
