package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming-native aggregations over the events stream shape
  * (event_id, ts, user_id, event_type, value) — the T4/T5 extension
  * surface (SURVEY.md §2.6: ABSENT in the reference, provided here as
  * first-class operators).
  *
  * These run on an unbounded `readStream` frame: watermarks bound state,
  * windows aggregate by event time, and the typed `mapGroupsWithState`
  * operator keeps per-key running state with processing-time timeout.
  * The same code paths also execute in batch mode (Spark unifies the
  * APIs), which is how the DuckDB-oracle variants (QueryCatalog q34/q35)
  * verify the window semantics.
  */
object EventAggregates {

  /** Tumbling event-time counts with a watermark: state for a window is
    * dropped once the watermark passes its end — bounded state at any
    * stream length. */
  def windowedCounts(events: DataFrame, window: String = "6 hours",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"), col("total_value"))

  private val functions = org.apache.spark.sql.functions

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserState(n: Long, total: Double, lastTs: java.sql.Timestamp)
  case class UserSummary(user_id: Long, n_events: Long, total_value: Double,
                         last_ts: java.sql.Timestamp)

  /** T5 extension — custom keyed state via mapGroupsWithState: running
    * per-user event count/sum/last-seen, emitted on every trigger. State
    * lives in the state store (checkpointed, bounded by key count). Pass an
    * `idleTimeout` to evict idle users via processing-time timeout (note:
    * timeouts schedule extra empty micro-batches — with a timeout set,
    * drive the query with a real trigger interval, not
    * `processAllAvailable`, which can starve). */
  def userRunningTotals(events: Dataset[UserEvent],
                        idleTimeout: Option[String] = None): Dataset[UserSummary] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserSummary]
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserState, UserSummary](timeoutConf) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          if (idleTimeout.isDefined && state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserSummary(userId, s.n, s.total, s.lastTs)
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0, new java.sql.Timestamp(0)))
            val s = batch.foldLeft(prev) { (acc, e) =>
              UserState(acc.n + 1, acc.total + e.value,
                if (e.ts.after(acc.lastTs)) e.ts else acc.lastTs)
            }
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            UserSummary(userId, s.n, s.total, s.lastTs)
          }
      }
  }

  case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessState(start: java.sql.Timestamp, last: java.sql.Timestamp, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     duration_sec: Long)

  /** Streaming sessionization — the unbounded twin of the batch
    * `Events.sessionize` (q89): per-user sessions close either when a
    * later event arrives past the gap (emitted immediately) or when the
    * WATERMARK passes last-event + gap with no successor
    * (`flatMapGroupsWithState` + `EventTimeTimeout` — the state-store
    * timeout fires exactly when no on-time event can extend the session).
    * State per user is ONE (start, last, n) triple; eviction on close
    * keeps total state ∝ concurrently-active users, not stream length.
    */
  def sessionizeStream(events: Dataset[SessEvent], gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[Session]
    val gapMs = gapMinutes * 60000L
    def closed(uid: Long, s: SessState): Session =
      Session(uid, s.start, s.last, s.n, (s.last.getTime - s.start.getTime) / 1000L)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(closed(uid, s))
          } else {
            // batch order is not event order: sort this trigger's slice
            // (bounded by trigger size, not stream length)
            val evs = batch.toIndexedSeq.sortBy(e => (e.ts.getTime, e.user_id))
            var out = List.empty[Session]
            var cur = state.getOption
            for (e <- evs) cur = cur match {
              case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
                Some(SessState(s.start,
                  if (e.ts.after(s.last)) e.ts else s.last, s.n + 1))
              case Some(s) =>
                out ::= closed(uid, s)
                Some(SessState(e.ts, e.ts, 1L))
              case None => Some(SessState(e.ts, e.ts, 1L))
            }
            cur.foreach { s =>
              state.update(s)
              // fire when no on-time event can extend this session; the
              // max() guard keeps the timestamp ≥ the current watermark
              // (Spark rejects timeouts already in the past)
              state.setTimeoutTimestamp(math.max(s.last.getTime + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.reverseIterator
          }
      }
  }

  /** Streaming-native dedup: keep the FIRST record per key, with state
    * bounded by the watermark (`dropDuplicatesWithinWatermark` evicts a
    * key's dedup state once the watermark passes its event time + delay).
    * Complementary to the star pipeline's last-write-wins MERGE: that
    * collapses to the LATEST record with state in the external table; this
    * suppresses replays/duplicates in-flight with state in the state
    * store — use it upstream of a non-idempotent sink. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join (T-surface extension): attribute each
    * right-stream record to left-stream records of the same key whose
    * event time precedes it by at most `maxLag` — e.g. purchases joined to
    * the clicks that led to them. Both sides carry watermarks and the join
    * condition bounds the time range BOTH ways, so Spark can size the join
    * state buffers and evict rows once the watermark passes — bounded
    * state at any stream length (an unbounded-interval stream-stream join
    * would buffer a side forever; Spark rejects it in Append mode).
    *
    * Column contract: left = (key, lts, left payload…), right =
    * (key, rts, right payload…); output = matched pairs with both
    * timestamps. Inner join: unmatched rows on either side drop.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   maxLag: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxLag"))
      .drop(r(key))
  }

  /** Output-mode helper: windowed aggregations under watermark emit
    * finalized windows in Append mode. */
  val appendMode: OutputMode = OutputMode.Append()
}
