package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** The production-shaped writer for the reference's core output
  * contract (lib/trike/proxy.ex:171-204): every record is `put` keyed
  * by partition key, and the sequence number returned by each put is
  * chained into the next one for the same key via
  * `sequence_number_for_ordering`, so records within one key are
  * strictly ordered end-to-end.
  *
  * `orderedPuts` is a `foreachBatch` function that enforces the chain
  * DISTRIBUTIVELY, from inside a running query:
  *
  *  - one hash repartition on the partition key, so every key lands
  *    wholly inside one task (no cross-task races on a key's chain);
  *  - a within-partition sort on (key, orderCols), so each task sees
  *    each key's records contiguously and in order;
  *  - per-task chain threading: on the first record of a key the task
  *    resumes from `client.lastSequence` (the cross-batch carry), then
  *    chains the returned sequence through the run of that key.
  *
  * REPLAY IDEMPOTENCE (the exactly-once upgrade the reference can't
  * express — proxy.ex retries re-put blindly): foreachBatch is
  * at-least-once, re-running a failed micro-batch under the SAME
  * batchId. Because the repartition+sort pipeline is deterministic, a
  * replay presents each key's records in the identical order, so the
  * client only needs a replay cursor: `putsInBatch(key, batchId)` says
  * how many records of this (key, batch) already landed, and the
  * writer skips exactly that many before resuming the chain. Clients
  * that don't persist the cursor (the reference's contract) default
  * to 0 = plain at-least-once. The guarantee requires `orderCols` to
  * totally order each key's records within a batch.
  *
  * Scale posture: the only data movement is the one shuffle on the
  * sink's own partitioning key; nothing is collected to the driver.
  */
object KeyedOrderedSink {

  /** A put failure the service reports as RETRYABLE — the
    * Kinesis-shaped throttle (ProvisionedThroughputExceeded, 5xx).
    * `orderedPuts` retries these with bounded exponential backoff,
    * preserving the key's sequence chain (the reference rides its
    * HTTP client's request-retry layer for the same contract); any
    * other exception still fails the batch for Spark to replay. */
  final class TransientPutFailure(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** The put-record client contract (Kinesis-shaped). Implementations
    * must be reachable from executor code — either serializable or,
    * like the in-memory test sink, resolved via a static factory. */
  trait PutClient {
    /** Put one record; `seqForOrdering` must chain from the previous
      * put for this key. `batchId` identifies the micro-batch for
      * replay bookkeeping. Returns the service-assigned sequence. */
    def put(partitionKey: String, data: String, seqForOrdering: Option[Long],
      batchId: Long): Long
    /** The last sequence this client assigned for the key, if any —
      * the resume point when a new micro-batch begins. */
    def lastSequence(partitionKey: String): Option[Long]
    /** Replay cursor: how many records of (key, batchId) this client
      * already committed. A failed batch replays under the same
      * batchId and in the same deterministic order, so the writer
      * skips this many records before putting. Default 0 keeps the
      * reference's at-least-once contract for clients that don't
      * persist per-batch counts. */
    def putsInBatch(partitionKey: String, batchId: Long): Long = 0L
  }

  /** Build the `foreachBatch` function. `client` is a factory invoked
    * once per task on the executor (a real sink opens its connection
    * there; the test sink returns a shared instance).
    *
    * Usage:
    * {{{
    * cloudEvents.writeStream
    *   .foreachBatch(KeyedOrderedSink.orderedPuts(
    *     () => myClient, keyCol = "partitionkey", dataCol = "raw",
    *     orderCols = Seq("receiveTs", "pos")))
    *   .start()
    * }}}
    */
  def orderedPuts(client: () => PutClient, keyCol: String, dataCol: String,
    orderCols: Seq[String], maxRetries: Int = 5,
    baseBackoffMs: Long = 10L): (DataFrame, Long) => Unit = { (batch, batchId) =>
    batch
      .repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
      .select(col(keyCol), col(dataCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val c = client()
        var currentKey: String = null
        var chain: Option[Long] = None
        var skip = 0L
        var nPuts = 0L
        // One structured line per (key, batch) run — the bounded twin
        // of the reference logging each data event under a request_id
        // (proxy.ex:152-207). Emitted executor-locally through the
        // static Telemetry fan-out; debug level so production installs
        // opt in by backend.
        def flushRun(): Unit = if (currentKey != null) {
          graft.telemetry.Telemetry.withRequestId {
            graft.telemetry.Telemetry.debug(
              s"put_run n=$nPuts last_seq=${chain.getOrElse(-1L)} batch=$batchId",
              "conn" -> currentKey)
          }
          nPuts = 0L
        }
        it.foreach { r =>
          val key = r.getString(0)
          if (key != currentKey) {
            flushRun()
            currentKey = key
            chain = c.lastSequence(key)
            skip = c.putsInBatch(key, batchId)
          }
          if (skip > 0) skip -= 1 // already landed in a prior attempt
          else {
            nPuts += 1
            // A throttled put retries IN PLACE with exponential backoff
            // — the chain must not advance past a record that never
            // landed, and later records of the key must not overtake
            // it, so the retry happens here, inside the ordered walk,
            // never by re-queuing. Non-transient failures propagate:
            // Spark fails the batch and replays it under the same
            // batchId, where the replay cursor skips what landed.
            var attempt = 0
            var done = false
            while (!done) {
              try {
                chain = Some(c.put(key, r.getString(1), chain, batchId))
                done = true
              } catch {
                case e: TransientPutFailure =>
                  attempt += 1
                  if (attempt > maxRetries) throw e
                  Thread.sleep(baseBackoffMs << math.min(attempt - 1, 6))
              }
            }
          }
        }
        flushRun()
      }
  }
}
