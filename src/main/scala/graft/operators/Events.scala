package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: funnel conversion and cohort
  * retention — the two queries every product-analytics workload runs, both
  * exact-integer so any engine reproduces them bit-for-bit.
  */
object Events {

  /** Ordered funnel conversion: how many users reached stage k by doing
    * the stage-k event STRICTLY AFTER their stage-(k−1) entry time (the
    * ordered-funnel semantics: a purchase before the first view does not
    * count a user through the view→purchase funnel), optionally within
    * `maxGapHours` of it (the conversion-window variant every analytics
    * product ships).
    *
    * Shape: one `min(ts)` aggregate per stage, each keyed by user — k
    * small shuffles all on the same key (and the join back to events
    * co-partitions with the aggregate, so AQE coalesces them). No window
    * over the raw stream, no collect_list of a user's whole history —
    * state per user per stage is ONE timestamp, which is what keeps this
    * linear at 100 TB of events.
    *
    * Returns one row per stage: (stage_ix, stage, n_users), n_users
    * monotonically non-increasing down the funnel.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             maxGapHours: Option[Int] = None,
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    // fold: reached(k) = per-user min ts of stage-k events after reached(k-1)
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(0L).as("stage_ix"), lit(stages.head).as("stage"), col("n_users"))
    for ((s, i) <- stages.zipWithIndex.tail) {
      val inWindow = maxGapHours.map(g =>
        col(tsCol) <= col("_t") + expr(s"INTERVAL $g HOUR")).getOrElse(lit(true))
      reached = events.filter(col(typeCol) === s)
        .join(reached, userCol)
        .filter(col(tsCol) > col("_t") && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      out = out.unionByName(reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_ix"), lit(s).as("stage"), col("n_users")))
    }
    out
  }

  /** Batch sessionization: split each user's event stream into sessions at
    * inactivity gaps > `gapMinutes`, then aggregate one row per session —
    * the batch twin of the streaming session window (q35), and the
    * standard first step of any behavioral feature pipeline.
    *
    * Gap tests and durations are computed on `unix_micros` (exact BIGINT,
    * identical in any engine — never float epoch seconds). Session index =
    * running count of gap-starts per user (lag + cumulative sum), so ids
    * are dense, deterministic and replayable.
    *
    * Shape: ONE shuffle. Both windows and the final groupBy are keyed by
    * user (the session aggregate groups on (user, session_ix), whose
    * clustering the user-hash partitioning already satisfies) — a million
    * users fan out across the cluster, and no per-user state beyond the
    * sort both windows share.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 userCol: String = "user_id", tsCol: String = "ts",
                 tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val us = Times.epochMicros(col(tsCol))
    val newSession = when(
      lag(us, 1).over(w).isNull ||
        us - lag(us, 1).over(w) > lit(gapMinutes * 60L * 1000000L), 1L)
      .otherwise(0L)
    events
      .withColumn("_new", newSession)
      .withColumn("session_ix", sum(col("_new")).over(w))
      .groupBy(col(userCol), col("session_ix"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        ((max(us) - min(us)) / lit(1000000L)).cast("long").as("duration_sec"))
  }

  /** Cohort retention: users grouped by their first-seen day, counted on
    * each later activity day as an offset from the cohort day. The classic
    * retention triangle, all exact integers.
    *
    * Shape: one per-user min-date aggregate (the cohort assignment,
    * broadcast-joined back — cohort cardinality is |users|, the join key
    * is the user), one distinct over (user, day), one count aggregate.
    * Every shuffle is keyed by user or by the small (cohort, offset)
    * result grid. */
  def cohortRetention(events: DataFrame,
                      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val days = events.select(col(userCol), to_date(col(tsCol)).as("_day")).distinct()
    val cohorts = days.groupBy(col(userCol)).agg(min(col("_day")).as("_cohort"))
    days.join(cohorts, userCol)
      .groupBy(col("_cohort").as("cohort_day"),
        datediff(col("_day"), col("_cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
