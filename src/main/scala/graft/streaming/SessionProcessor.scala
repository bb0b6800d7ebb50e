package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One user event as the session tracker consumes it (event-time
  * timestamp + integer cents — the repo-wide fixed-point
  * discipline). */
final case class UserEvent(userId: Long, ts: java.sql.Timestamp, valueCents: Long)

/** A closed session: emitted only when the event-time watermark proves
  * the gap, never speculatively. */
final case class SessionSummary(userId: Long, nEvents: Long,
  valueCents: Long, startMs: Long, endMs: Long)

/** Gap-sessionization on the arbitrary-state v2 API
  * (`transformWithState`, Spark 4): the stateful twin of the batch
  * `Events.evSessionize` and the modern replacement for the
  * flatMapGroupsWithState shape in StatefulFraming.
  *
  * Per key the state is ONE fixed-size row (ValueState[SessionAgg]);
  * the close signal is an EVENT-TIME TIMER at lastSeen + gap,
  * re-registered as the session extends — the engine fires it when
  * the watermark passes, so emission is replay-deterministic and
  * state is bounded by active keys, not key universe. v2 advantages
  * exercised here: typed state handles created in init (not per
  * call), explicit timer list/delete, and TTL available per state
  * variable (TTLConfig) instead of one global timeout conf.
  *
  * Scale posture: one shuffle on userId into the state operator;
  * state per key is 4 longs; requires the RocksDB provider (the v2
  * API's backing store), which is also the 100 TB deployment default.
  */
final case class SessionAgg(nEvents: Long, valueCents: Long,
  firstMs: Long, lastMs: Long)

class SessionCloseProcessor(gapMs: Long)
    extends StatefulProcessor[Long, UserEvent, SessionSummary] {

  @transient private var sess: ValueState[SessionAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessionAgg]("sess",
      Encoders.product[SessionAgg], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      tv: TimerValues): Iterator[SessionSummary] = {
    var st = if (sess.exists()) sess.get()
             else SessionAgg(0L, 0L, Long.MaxValue, Long.MinValue)
    for (r <- rows) {
      val ms = r.ts.getTime
      st = SessionAgg(st.nEvents + 1, st.valueCents + r.valueCents,
        math.min(st.firstMs, ms), math.max(st.lastMs, ms))
    }
    sess.update(st)
    // One live timer per key: the close candidate moves as the
    // session extends. (A late row can only extend lastMs — rows
    // older than the watermark were dropped upstream — so the timer
    // only ever moves forward.)
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer(st.lastMs + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionSummary] = {
    val out =
      if (sess.exists()) {
        val st = sess.get()
        Iterator.single(
          SessionSummary(key, st.nEvents, st.valueCents, st.firstMs, st.lastMs))
      } else Iterator.empty
    sess.clear()
    out
  }
}

object SessionProcessor {

  /** events → closed sessions after `gapMs` of event-time silence;
    * `delay` is the watermark (late-data horizon) the timers ride. */
  def closedSessions(events: Dataset[UserEvent], gapMs: Long,
      delay: String = "0 seconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.userId)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime, OutputMode.Append, Encoders.product[SessionSummary])
  }
}
