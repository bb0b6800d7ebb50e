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
  * Scale posture: the only data movement is the one shuffle on the
  * sink's own partitioning key; nothing is collected to the driver.
  */
object KeyedOrderedSink {

  /** The put-record client contract (Kinesis-shaped). Implementations
    * must be reachable from executor code — either serializable or,
    * like the in-memory test sink, resolved via a static factory. */
  trait PutClient {
    /** Put one record; `seqForOrdering` must chain from the previous
      * put for this key. Returns the service-assigned sequence. */
    def put(partitionKey: String, data: String, seqForOrdering: Option[Long]): Long
    /** The last sequence this client assigned for the key, if any —
      * the resume point when a new micro-batch begins. */
    def lastSequence(partitionKey: String): Option[Long]
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
    orderCols: Seq[String]): (DataFrame, Long) => Unit = { (batch, _) =>
    batch
      .repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
      .select(col(keyCol), col(dataCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val c = client()
        var currentKey: String = null
        var chain: Option[Long] = None
        it.foreach { r =>
          val key = r.getString(0)
          if (key != currentKey) {
            currentKey = key
            chain = c.lastSequence(key)
          }
          chain = Some(c.put(key, r.getString(1), chain))
        }
      }
  }
}
