package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream relational operators: the streaming twins of the
  * batch interval join (ScaleOps.q24RangeJoin) and exact dedup
  * (Dedup.dedupExact), built on Structured Streaming's watermark
  * mechanics so state stays bounded at production rates.
  */
object StreamRelational {

  /** Stream-stream interval join: for each error event, the purchases
    * landing inside the 10-minute window after it.
    *
    * Both sides carry a watermark and the join condition bounds p_ts
    * relative to err_ts, so Spark can expire buffered rows once the
    * watermark passes err_ts + window: state is O(input rate ×
    * (watermark + window)), never unbounded. Inner-join matches emit
    * as soon as both sides arrive — no flush-on-watermark latency.
    * At 100 TB/day rates this is the only viable shape: a batch
    * re-join over the full history per micro-batch re-reads the
    * world; the stream-stream join touches each event once.
    *
    * Structured Streaming refuses a stream-stream join without an
    * equality predicate (state would be all-pairs). The same time
    * bucketing as the batch range join (ScaleOps.q24RangeJoin)
    * supplies one: a purchase belongs to exactly one 10-minute
    * bucket, an error's window overlaps at most two, so exploding
    * each error to its two candidate buckets turns the interval join
    * into a bucket EQUIJOIN + residual range filter — each matching
    * pair meets only in the purchase's bucket, so no duplicates.
    */
  private val windowSec = 600L

  def purchasesAfterErrors(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
        expr(s"unix_timestamp(ts) DIV $windowSec").as("b0"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
      .drop("b0")
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        expr(s"unix_timestamp(ts) DIV $windowSec").as("bucket"))
    e.join(p,
      e("bucket") === p("bucket") &&
        expr("p_ts >= err_ts AND p_ts < err_ts + INTERVAL 10 MINUTES"))
      .select(col("err_id"), col("err_ts"), col("p_id"), col("p_ts"))
  }

  /** Left-outer variant: every error eventually emits — matched rows
    * as they meet, UNMATCHED errors as null-extended rows once the
    * watermark proves no purchase can still arrive (err_ts + window
    * has passed on the right side). This is the alerting shape —
    * "errors with no recovery purchase within 10 minutes" — and the
    * state-eviction semantics the inner join never exercises: the
    * null-extended row is emitted BY the state cleanup, so output
    * latency for misses is the watermark delay, not the trigger.
    * Same bucket-equijoin trick as the inner join; a left-outer
    * bucket join would duplicate unmatched errors (one per candidate
    * bucket), so the two bucket copies are reduced back to one by
    * dropDuplicates on err_id for the null branch — expressed here by
    * bucketing the LEFT side once (b0 only) and letting the right
    * side explode instead: each error row exists once, each purchase
    * appears in its own bucket and the preceding one, and a matching
    * pair still meets exactly once (in the error's bucket).
    */
  def unmatchedErrorJoin(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
        expr(s"unix_timestamp(ts) DIV $windowSec").as("bucket"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        expr(s"unix_timestamp(ts) DIV $windowSec").as("b0"))
      // A purchase can answer errors in its own bucket or the one
      // BEFORE it (p_ts ∈ [err_ts, err_ts + window) ⇒ B(p) ∈
      // {B(err), B(err)+1}), so it registers under {B(p), B(p)−1} and
      // meets each qualifying error exactly once, in the error's own
      // bucket.
      .withColumn("bucket", explode(array(col("b0"), col("b0") - 1)))
      .drop("b0")
    e.join(p,
      e("bucket") === p("bucket") &&
        expr("p_ts >= err_ts AND p_ts < err_ts + INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("err_id"), col("err_ts"), col("p_id"), col("p_ts"))
  }

  /** At-least-once → effectively-once: drop replayed events by id.
    *
    * `dropDuplicatesWithinWatermark` keeps a key's state only until
    * the watermark clears it — bounded state — unlike plain
    * `dropDuplicates`, whose state grows with the key universe
    * forever. The contract matches an at-least-once upstream (the
    * sharded-journal source's get_records chaining redelivers on
    * reconnect): duplicates arrive within the redelivery horizon, so
    * a watermark ≥ that horizon makes the output exactly-once
    * downstream of the sink's own idempotence.
    */
  def dedupWithinWatermark(events: DataFrame, horizon: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")
}
