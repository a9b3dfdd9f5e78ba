package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Behavioral analytics over event streams: funnel conversion and cohort
  * retention — the two queries every product-analytics workload runs, both
  * exact-integer so any engine reproduces them bit-for-bit.
  */
object Events {

  /** Ordered funnel conversion: how many users reached stage k by doing
    * the stage-k event STRICTLY AFTER their stage-(k−1) entry time (the
    * ordered-funnel semantics: a purchase before the first view does not
    * count a user through the view→purchase funnel), optionally within
    * `maxGapHours` of it.
    *
    * The windowed variant is FIRST-TOUCH: stage k is anchored at the
    * user's EARLIEST qualifying stage-(k−1) entry, and a user whose first
    * entry falls outside the window is NOT re-attempted from a later
    * occurrence (A@00:00, A@05:00, B@05:30 with a 1 h window does not
    * convert — the re-attempting "any qualifying sequence" variant some
    * products offer needs a sequential per-user scan, a different
    * operator). Without a window the greedy min IS optimal and the two
    * semantics coincide.
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
    // NULL user/ts rows cannot enter the funnel: a NULL user groups into
    // one phantom stage-0 "user" and a NULL-ts user gets _t = NULL — both
    // can never convert (later joins/comparisons drop them), so they
    // would inflate the funnel top and skew every rate (the
    // dailyGrowth/rfmSegments guard)
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    // fold: reached(k) = per-user min ts of stage-k events after reached(k-1)
    var reached = base.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(0L).as("stage_ix"), lit(stages.head).as("stage"), col("n_users"))
    for ((s, i) <- stages.zipWithIndex.tail) {
      val inWindow = maxGapHours.map(g =>
        col(tsCol) <= col("_t") + expr(s"INTERVAL $g HOUR")).getOrElse(lit(true))
      reached = base.filter(col(typeCol) === s)
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
    // a NULL-ts event would sort first and mint its own junk singleton
    // session, renumbering every real session_ix on replay with one more
    // NULL row; NULL-user events are DIFFERENT unknown visitors that a
    // NULL window partition would interleave into one phantom user's
    // sessions — exclude both, like every other operator in this file
    events.filter(col(tsCol).isNotNull && col(userCol).isNotNull)
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
    val days = events.select(col(userCol), to_date(col(tsCol)).as("_day"))
      .filter(col(userCol).isNotNull && col("_day").isNotNull) // no (NULL, NULL) cells
      .distinct()
    val cohorts = days.groupBy(col(userCol)).agg(min(col("_day")).as("_cohort"))
    days.join(cohorts, userCol)
      .groupBy(col("_cohort").as("cohort_day"),
        datediff(col("_day"), col("_cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Daily growth accounting — DAU split into new vs returning, plus the
    * cumulative user count: the product-growth readout beside
    * [[cohortRetention]]'s triangle. A user is "new" on their first-seen
    * day (exact min over their distinct activity days) and "returning"
    * after; cum_users is the running sum of new users.
    *
    * Scale: one (user, day) distinct, one per-user min-day aggregate,
    * one per-day count — all user- or day-keyed. The running sum is a
    * window over the DAILY frame, which is calendar-bounded (one row
    * per day — thousands of rows for a decade), the documented
    * tiny-frame exception to the no-unpartitioned-window rule. */
  def dailyGrowth(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts"): DataFrame = {
    val days = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("day")).distinct()
    val first = days.groupBy(col("_u")).agg(min(col("day")).as("_first"))
    val daily = days.join(first, Seq("_u"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("_first"), 1L).otherwise(0L)).as("new_users"))
      .withColumn("returning_users", col("dau") - col("new_users"))
    // running sum over the calendar-bounded daily frame (tiny by design)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** RFM segmentation — the classic user-value breakdown (recency /
    * frequency / monetary, each scored 1-5 by corpus quintiles) as
    * deterministic relational algebra: per-user aggregates, quintile
    * bounds from [[ApproxQuantile.exactQuantiles]] (the bounded-state
    * exact path, bit-equal to `quantile_cont`, broadcast back as one
    * tiny row), and scores by strict-greater comparisons against the
    * rounded bounds — ties land in the LOWER score in any engine.
    * Recency is inverted (most recent = 5); the reference instant is
    * the corpus' own max timestamp, so the result is a pure function of
    * the data. NULL users/timestamps are excluded.
    *
    * Scale: one user-keyed aggregate over the events, three
    * exactQuantiles passes over the (already user-collapsed) frame, and
    * a map-only scoring projection under broadcast bounds. */
  def rfmSegments(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user_id"),
        Times.epochMicros(col(tsCol)).as("_tus"),
        col(valueCol).cast("decimal(18,2)").as("_v"))
    val asOf = base.agg(max(col("_tus")).as("_asof"))
    // coalesce: a user whose value column is NULL on every event is a
    // real no-revenue user — monetary 0 scores the m floor (1), where a
    // NULL would propagate through the score into a NULL segment string
    val per = base.groupBy(col("user_id"))
      .agg(max(col("_tus")).as("_last"), count(lit(1)).as("frequency"),
        coalesce(sum(col("_v")), lit(0).cast("decimal(18,2)")).as("_m"))
      .crossJoin(broadcast(asOf))
      .select(col("user_id"),
        // integer `div`, never double division — a quotient that double
        // rounding nudges across an integer boundary would differ from
        // the oracle's floor division
        expr("(_asof - _last) div 86400000000").as("recency_days"),
        col("frequency"), col("_m").cast("double").as("monetary"))
      .materialized // three quantile passes + the scoring read
    val qs = Seq("_b20" -> 0.2, "_b40" -> 0.4, "_b60" -> 0.6, "_b80" -> 0.8)
    // ONE quantile pass for all three metrics: melt to (_metric, value)
    // and let exactQuantiles group by metric — a third of the jobs the
    // per-metric formulation ran, same bit-exact bounds
    val melted = per.select(explode(array(
      struct(lit("recency").as("_metric"),
        col("recency_days").cast("double").as("_mv")),
      struct(lit("frequency").as("_metric"),
        col("frequency").cast("double").as("_mv")),
      struct(lit("monetary").as("_metric"), col("monetary").as("_mv")))).as("_e"))
      .select(col("_e._metric").as("_metric"), col("_e._mv").as("_mv"))
    val allBounds = ApproxQuantile.exactQuantiles(melted, "_metric", "_mv", qs)
    def bounds(metric: String): DataFrame =
      allBounds.filter(col("_metric") === metric).drop("_metric")
    def scoreUp(metric: Column, b: String): Column =
      (lit(1L) + (metric > col(s"$b._b20")).cast("long") +
        (metric > col(s"$b._b40")).cast("long") +
        (metric > col(s"$b._b60")).cast("long") +
        (metric > col(s"$b._b80")).cast("long"))
    per
      .crossJoin(broadcast(bounds("recency").select(struct(col("*")).as("_rb"))))
      .crossJoin(broadcast(bounds("frequency").select(struct(col("*")).as("_fb"))))
      .crossJoin(broadcast(bounds("monetary").select(struct(col("*")).as("_mb"))))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"),
        (lit(6L) - scoreUp(col("recency_days"), "_rb")).as("r_score"),
        scoreUp(col("frequency"), "_fb").as("f_score"),
        scoreUp(col("monetary"), "_mb").as("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
  }

  /** First-order Markov transition counts over per-unit event sequences —
    * the "what happens after X" path-analysis primitive (session flow
    * graphs, curriculum-order audits).
    *
    * Each unit's events are ordered by timestamp with `idCol` as the
    * deterministic tie-break (same-µs events otherwise make `lead`
    * nondeterministic under shuffle); successor pairs come from ONE
    * unit-partitioned `lead` window — each unit sorts only its own rows,
    * no global sort, no self-join. Then two key-partitioned aggregates:
    * (from,to) counts and from-totals (a second small aggregate joined
    * back — the from-state alphabet, not the event count).
    *
    * Output: `from_event`, `to_event`, `cnt`, `from_total`,
    * `prob` = round(cnt/from_total, 6) — one division at readout. */
  def markovTransitions(events: DataFrame, unitCol: String = "user_id",
                        tsCol: String = "ts", typeCol: String = "event_type",
                        idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(unitCol))
      .orderBy(Times.epochMicros(col(tsCol)).asc, col(idCol).asc)
    val steps = events
      .filter(col(unitCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(unitCol), col(tsCol), col(idCol),
        col(typeCol).as("from_event"))
      .withColumn("to_event", lead(col("from_event"), 1).over(w))
      .filter(col("to_event").isNotNull)
    val cnts = steps.groupBy(col("from_event"), col("to_event"))
      .agg(count(lit(1)).as("cnt"))
    val totals = cnts.groupBy(col("from_event"))
      .agg(sum(col("cnt")).as("from_total"))
    cnts.join(totals, "from_event")
      .select(col("from_event"), col("to_event"), col("cnt"),
        col("from_total"),
        round(col("cnt").cast("double") / col("from_total"), 6).as("prob"))
  }

  /** Frequent contiguous event PATHS of length `k` — the order-k
    * generalization of [[markovTransitions]]' successor pairs, and the
    * product-analytics "path analysis" staple (what k-step flows dominate
    * the sessions): per unit, the type sequence ordered (ts, id) is cut
    * into overlapping k-grams by `k−1` lead windows sharing ONE
    * partition sort; paths are counted globally with the distinct-unit
    * reach beside the raw occurrence count, and only paths with
    * `n_occurrences ≥ minSupport` survive.
    *
    * Scale: one shuffle on the unit key (all leads share it), one
    * grouped count on the path string — the path alphabet is
    * |event types|^k but only OBSERVED paths materialize, and the
    * support gate keeps the result ∝ the head of that distribution. */
  def frequentPaths(events: DataFrame, k: Int = 3, minSupport: Long = 2L,
                    unitCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type",
                    idCol: String = "event_id"): DataFrame = {
    require(k >= 2 && k <= 8, "path length k in [2, 8]")
    val w = Window.partitionBy(col(unitCol))
      .orderBy(Times.epochMicros(col(tsCol)).asc, col(idCol).asc)
    val withLeads = (1 until k).foldLeft(
      events.filter(col(unitCol).isNotNull && col(tsCol).isNotNull &&
          col(typeCol).isNotNull)
        .select(col(unitCol), col(tsCol), col(idCol), col(typeCol).as("_t0"))) {
      case (df, i) => df.withColumn(s"_t$i", lead(col("_t0"), i).over(w))
    }
    withLeads
      .filter((1 until k).map(i => col(s"_t$i").isNotNull).reduce(_ && _))
      .select(col(unitCol).as("_unit"),
        // escape '>' inside event types BEFORE joining on '>': without it
        // ('a>b', 'c') and ('a', 'b>c') collide into one counted key
        // 'a>b>c' — distinct paths pooling support neither has. Literal
        // replaces (backslash first, so the escape char escapes itself),
        // byte-identical in any engine.
        concat_ws(">", (0 until k).map(i =>
          call_function("replace",
            call_function("replace", col(s"_t$i"), lit("\\"), lit("\\\\")),
            lit(">"), lit("\\>"))): _*).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("_unit")).as("n_units"))
      .filter(col("n_occurrences") >= minSupport)
  }
}
