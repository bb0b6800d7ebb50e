package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One funnel step as buffered per user. */
final case class StepRec(step: String, tsMs: Long)

/** A completed funnel: first-step and completing-step times. */
final case class FunnelHit(userId: Long, startMs: Long, endMs: Long)

/** Typed input row for the streaming funnel. */
final case class StepEvent(userId: Long, ts: java.sql.Timestamp, step: String)

/** Streaming ordered-funnel detection (the batch Events.evFunnel as a
  * stream) on ListState — the third v2 state shape after ValueState
  * (SessionProcessor) and MapState (FrequencyProcessor). The buffered
  * prefix of each user's funnel lives in a ListState[StepRec]:
  * appends are O(delta) against RocksDB (appendValue — no
  * read-modify-write of the whole buffer, which is what
  * flatMapGroupsWithState would do), and the full list is read only
  * when a batch actually touches the key.
  *
  * An event-time timer at firstStep + window garbage-collects
  * partials the watermark has proven can no longer complete —
  * bounded state with NO per-trigger full-state sweep; the engine
  * fires exactly the keys whose deadline passed.
  *
  * Emission is deterministic under replay: steps are applied in
  * (tsMs, step) order within a batch, and a hit fires on the FIRST
  * in-order completion of the step sequence within the window.
  */
class FunnelProcessor(steps: Seq[String], windowMs: Long)
    extends StatefulProcessor[Long, StepEvent, FunnelHit] {

  @transient private var buf: ListState[StepRec] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[StepRec]("steps",
      Encoders.product[StepRec], TTLConfig.NONE)

  /** First in-order completion of `steps` within the window, over the
    * time-sorted buffer. Returns (startMs, endMs). */
  private def firstCompletion(recs: Seq[StepRec]): Option[(Long, Long)] = {
    // Greedy subsequence scan anchored at each candidate start of the
    // first step; window bounds the span.
    val sorted = recs.sortBy(r => (r.tsMs, r.step))
    val starts = sorted.iterator.zipWithIndex
      .filter(_._1.step == steps.head).map(_._2)
    starts.flatMap { s0 =>
      var want = 1
      val start = sorted(s0).tsMs
      var end = -1L
      var i = s0 + 1
      while (want < steps.length && i < sorted.length &&
        sorted(i).tsMs <= start + windowMs) {
        if (sorted(i).step == steps(want)) {
          want += 1
          if (want == steps.length) end = sorted(i).tsMs
        }
        i += 1
      }
      if (end >= 0) Some((start, end)) else None
    }.take(1).toSeq.headOption
  }

  override def handleInputRows(key: Long, rows: Iterator[StepEvent],
      tv: TimerValues): Iterator[FunnelHit] = {
    val incoming = rows.map(r => StepRec(r.step, r.ts.getTime)).toVector
    if (incoming.isEmpty) return Iterator.empty
    incoming.foreach(buf.appendValue)
    val all = buf.get().toVector
    firstCompletion(all) match {
      case Some((start, end)) =>
        buf.clear()
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        Iterator.single(FunnelHit(key, start, end))
      case None =>
        // GC deadline: the earliest buffered step's window end. When
        // it fires, everything older than watermark − window is dead
        // weight (can't anchor a completion any more).
        val minTs = all.iterator.map(_.tsMs).min
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(minTs + windowMs)
        Iterator.empty
    }
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[FunnelHit] = {
    val cutoff = tv.getCurrentWatermarkInMs() - windowMs
    val keep = buf.get().toVector.filter(_.tsMs > cutoff)
    buf.clear()
    if (keep.nonEmpty) {
      keep.foreach(buf.appendValue)
      getHandle.registerTimer(keep.iterator.map(_.tsMs).min + windowMs)
    }
    Iterator.empty
  }
}

object FunnelProcessor {

  /** step events → first-completion funnel hits within `windowMs`;
    * `delay` is the late-data watermark the GC timers ride. */
  def hits(events: Dataset[StepEvent], steps: Seq[String], windowMs: Long,
      delay: String = "0 seconds"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(steps, windowMs),
        TimeMode.EventTime, OutputMode.Append, Encoders.product[FunnelHit])
  }
}
