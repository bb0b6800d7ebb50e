package graft

import graft.streaming.{KeyedOrderedSink, KinesisLikeSink, OcsPipeline, RawPacket}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** The production-shaped keyed sink (KeyedOrderedSink.orderedPuts)
  * enforcing the reference's put_record chain (proxy.ex:171-204) from
  * inside a running query — repartition on key, sort within partition,
  * thread the returned sequence per key, resume from the cross-batch
  * carry. */
class KeyedOrderedSinkSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val EOT = OcsPipeline.EOT

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("orderedPuts chains sequences per key across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[RawPacket]
    val sink = new KinesisLikeSink
    KeyedOrderedSinkSpec.sharedSink = sink

    val query = OcsPipeline.cloudEvents(input.toDF())
      .writeStream
      .outputMode("append")
      .foreachBatch(KeyedOrderedSink.orderedPuts(
        () => KeyedOrderedSinkSpec.sharedSink,
        keyCol = "partitionkey", dataCol = "raw",
        orderCols = Seq("receiveTs", "pos")))
      .start()

    try {
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:00"),
          s"m1${EOT}HEARTBEAT${EOT}m2${EOT}PARTIAL", seq = 1),
        RawPacket("conn-b", "10.0.0.2", ts("2026-01-01 10:00:01"),
          s"b1${EOT}", seq = 2))
      query.processAllAvailable()
      // batch 2 must resume conn-a's chain from batch 1's last sequence
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:05"),
          s"m3${EOT}", seq = 3))
      query.processAllAvailable()
    } finally query.stop()

    assert(sink.byKey("conn-a").map(_.data) == Seq("m1", "m2", "m3"),
      "frames in order, heartbeat and partial tail dropped")
    assert(sink.byKey("conn-b").map(_.data) == Seq("b1"))
    val seqA = sink.byKey("conn-a").map(_.seq)
    assert(seqA == seqA.sorted && seqA.distinct == seqA,
      "per-key sequence strictly increasing")
  }

  test("a writer that ignores the chain carry is rejected by the sink") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[RawPacket]
    val sink = new KinesisLikeSink
    KeyedOrderedSinkSpec.sharedSink = sink

    // The naive writer: starts every batch from None instead of
    // resuming from lastSequence — exactly the bug orderedPuts exists
    // to prevent. Batch 1 succeeds (chain empty); batch 2 presents a
    // stale seqForOrdering and the service-side require must fire.
    val query = OcsPipeline.cloudEvents(input.toDF())
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.orderBy(col("partitionkey"), col("receiveTs"), col("pos"))
          .select(col("partitionkey"), col("raw")).collect()
          .foldLeft(Map.empty[String, Long]) { (chain, r: Row) =>
            val key = r.getString(0)
            chain + (key -> KeyedOrderedSinkSpec.sharedSink.put(
              key, r.getString(1), chain.get(key), batchId))
          }
        ()
      }
      .start()

    val thrown = intercept[StreamingQueryException] {
      try {
        input.addData(RawPacket("conn-a", "10.0.0.1",
          ts("2026-01-01 10:00:00"), s"m1${EOT}", seq = 1))
        query.processAllAvailable()
        input.addData(RawPacket("conn-a", "10.0.0.1",
          ts("2026-01-01 10:00:05"), s"m2${EOT}", seq = 2))
        query.processAllAvailable()
      } finally query.stop()
    }
    val cause = Iterator.iterate(thrown: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(cause.contains("out-of-order put"),
      s"stale seqForOrdering must be rejected; got: $cause")
    assert(sink.byKey("conn-a").map(_.data) == Seq("m1"),
      "nothing after the rejected put lands")
  }

  test("transient throttles are retried in place: order kept, no dupes, query survives") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[RawPacket]
    val sink = new KinesisLikeSink
    KeyedOrderedSinkSpec.sharedSink = sink
    KeyedOrderedSinkSpec.flaky =
      new KeyedOrderedSinkSpec.ThrottlingClient(sink, throttleEvery = 3)

    val query = OcsPipeline.cloudEvents(input.toDF())
      .writeStream
      .outputMode("append")
      .foreachBatch(KeyedOrderedSink.orderedPuts(
        () => KeyedOrderedSinkSpec.flaky,
        keyCol = "partitionkey", dataCol = "raw",
        orderCols = Seq("receiveTs", "pos"),
        maxRetries = 5, baseBackoffMs = 1L))
      .start()

    try {
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:00"),
          s"m1${EOT}m2${EOT}m3${EOT}", seq = 1),
        RawPacket("conn-b", "10.0.0.2", ts("2026-01-01 10:00:01"),
          s"b1${EOT}b2${EOT}", seq = 2))
      query.processAllAvailable()
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:05"),
          s"m4${EOT}", seq = 3))
      query.processAllAvailable()
    } finally query.stop()

    assert(KeyedOrderedSinkSpec.flaky.throttles.get() > 0,
      "the flaky client must actually have throttled")
    assert(sink.byKey("conn-a").map(_.data) == Seq("m1", "m2", "m3", "m4"),
      "order preserved through retries, across batches")
    assert(sink.byKey("conn-b").map(_.data) == Seq("b1", "b2"))
    val all = sink.all
    assert(all.map(r => (r.partitionKey, r.data)).distinct.size == all.size,
      "a retried put must not land twice")
    val seqA = sink.byKey("conn-a").map(_.seq)
    assert(seqA == seqA.sorted && seqA.distinct == seqA,
      "per-key sequence strictly increasing despite throttles")
  }

  test("each (key, batch) run emits one put_run telemetry line with a request id") {
    import spark.implicits._
    val lines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    graft.telemetry.Telemetry.install(Seq(
      new graft.telemetry.Telemetry.ConsoleBackend(lines.add(_))))
    try {
      val sink = new KinesisLikeSink
      KeyedOrderedSinkSpec.sharedSink = sink
      val batch = Seq(
        ("conn-a", "r1", ts("2026-01-01 10:00:00"), 0),
        ("conn-a", "r2", ts("2026-01-01 10:00:01"), 0),
        ("conn-b", "r3", ts("2026-01-01 10:00:02"), 0))
        .toDF("partitionkey", "raw", "receiveTs", "pos")
      KeyedOrderedSink.orderedPuts(() => KeyedOrderedSinkSpec.sharedSink,
        keyCol = "partitionkey", dataCol = "raw",
        orderCols = Seq("receiveTs", "pos"))(batch, 7L)
      val runs = lines.toArray.map(_.toString).filter(_.contains("put_run"))
      assert(runs.length === 2, "one run line per key in the batch")
      val byConn = runs.map(l =>
        l.split("conn=")(1).split(" ")(0) -> l).toMap
      assert(byConn("conn-a").contains("n=2 "))
      assert(byConn("conn-b").contains("n=1 "))
      assert(runs.forall(_.contains("batch=7")))
      assert(runs.forall(_.contains("request_id=")),
        "each run carries its own request id (proxy.ex:152 twin)")
    } finally graft.telemetry.Telemetry.install(
      Seq(new graft.telemetry.Telemetry.ConsoleBackend()))
  }
}

object KeyedOrderedSinkSpec {
  /** foreachBatch/foreachPartition closures are serialized; route the
    * assertion sink through a static so executor code (same JVM in
    * local mode) and the driver-side spec see one instance. */
  @volatile var sharedSink: KinesisLikeSink = _

  /** Kinesis-shaped flake: every `throttleEvery`-th put ATTEMPT fails
    * with the retryable TransientPutFailure BEFORE reaching the real
    * sink — so a throttled record must be re-presented with the SAME
    * chain value to land, exactly what the in-place retry does. */
  final class ThrottlingClient(inner: KinesisLikeSink, throttleEvery: Int)
    extends KeyedOrderedSink.PutClient {
    val attempts = new java.util.concurrent.atomic.AtomicLong(0L)
    val throttles = new java.util.concurrent.atomic.AtomicLong(0L)
    def put(partitionKey: String, data: String, seqForOrdering: Option[Long],
        batchId: Long): Long = {
      if (attempts.incrementAndGet() % throttleEvery == 0) {
        throttles.incrementAndGet()
        throw new KeyedOrderedSink.TransientPutFailure(
          s"simulated throughput-exceeded for $partitionKey")
      }
      inner.put(partitionKey, data, seqForOrdering, batchId)
    }
    def lastSequence(partitionKey: String): Option[Long] =
      inner.lastSequence(partitionKey)
    override def putsInBatch(partitionKey: String, batchId: Long): Long =
      inner.putsInBatch(partitionKey, batchId)
  }

  @volatile var flaky: ThrottlingClient = _
}
