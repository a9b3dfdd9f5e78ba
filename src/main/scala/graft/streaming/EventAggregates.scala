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
    // a NULL event time would NPE inside the executor-side fold and kill
    // the query on every restart (the poison record replays from the
    // checkpoint); watermarks do not filter NULL timestamps
    events
      .filter((e: UserEvent) => e.ts != null)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserState, UserSummary](timeoutConf) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          if (idleTimeout.isDefined && state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserSummary(userId, s.n, s.total, s.lastTs)
          } else {
            // seed with Long.MinValue, not epoch 0: a pre-1970 backfill
            // timestamp is legal and must still win the max fold
            val prev = state.getOption.getOrElse(
              UserState(0L, 0.0, new java.sql.Timestamp(Long.MinValue)))
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
  case class SessBuffer(epochMs: List[Long])
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     duration_sec: Long)

  /** Streaming sessionization — the unbounded twin of the batch
    * `Events.sessionize` (q89), CORRECT UNDER OUT-OF-ORDER ARRIVAL: a
    * session is only emitted once the watermark passes its end + gap, the
    * earliest moment no on-time event can extend it, split it, or lower
    * its start. Until then the user's unfinalized event times stay
    * buffered in state (`flatMapGroupsWithState` + `EventTimeTimeout`
    * fires when the quiet period elapses in EVENT time) — eager emission
    * on an in-stream gap would mis-assign a late-but-on-time event that
    * lands before the gap, and batch/stream results would diverge on
    * identical input.
    *
    * State per user = timestamps not yet past the watermark horizon —
    * bounded by (watermark delay + gap) × the user's event rate, the
    * inherent price of exact out-of-order sessionization (Spark's own
    * session windows hold the same class of state). Emitted sessions
    * match `Events.sessionize` over the same events exactly, except
    * session_ix (a global per-user ordinal, meaningless on an unbounded
    * stream).
    */
  def sessionizeStream(events: Dataset[SessEvent], gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessBuffer]
    implicit val outEnc = Encoders.product[Session]
    val gapMs = gapMinutes * 60000L
    def closed(uid: Long, s: List[Long]): Session =
      Session(uid, new java.sql.Timestamp(s.head), new java.sql.Timestamp(s.last),
        s.size.toLong, (s.last - s.head) / 1000L)
    events
      .filter((e: SessEvent) => e.ts != null) // same NULL-ts poison guard
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessBuffer, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessEvent], state: GroupState[SessBuffer]) =>
          // same code path for new-data and timeout invocations: fold the
          // batch (empty on timeout) into the buffer, split into
          // gap-delimited sessions, finalize what the watermark has sealed
          val buf = state.getOption.map(_.epochMs).getOrElse(Nil) ++
            batch.map(_.ts.getTime)
          val w = state.getCurrentWatermarkMs()
          val sessions = buf.sorted.foldLeft(List.empty[List[Long]]) {
            case (Nil, t) => List(List(t))
            case (cur :: done, t) =>
              if (t - cur.head <= gapMs) (t :: cur) :: done
              else List(t) :: cur :: done
          }.map(_.reverse).reverse // ascending sessions, ascending within
          // STRICT seal: an on-time event may carry ts == watermark (Spark
          // drops only ts < watermark), and an event at exactly last+gap
          // joins the session under batch semantics — so a session sealed
          // at last+gap == w could still grow. Seal only once no on-time
          // event could join: last + gap < w.
          val (done, open) = sessions.partition(_.last + gapMs < w)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessBuffer(open.flatten))
            // fire when the EARLIEST open session seals (its quiet period
            // elapses in event time) — arming for the newest would hold
            // every older session hostage to it; strictly after the
            // current watermark because Spark rejects timeouts at or
            // before it. The handler re-arms for the next session.
            state.setTimeoutTimestamp(
              math.max(open.map(_.last).min + gapMs, w + 1))
          }
          done.map(closed(uid, _)).iterator
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
                   watermark: String = "1 hour"): DataFrame =
    // one implementation of the watermarked interval join: delegate to
    // StreamStreamJoin.attribute (which adds the shared-column guard and
    // the outer-join variants) instead of evolving a weaker twin
    StreamStreamJoin.attribute(left, right, key, leftTs, rightTs,
      maxLag, watermark)

  /** Output-mode helper: windowed aggregations under watermark emit
    * finalized windows in Append mode. */
  val appendMode: OutputMode = OutputMode.Append()
}
