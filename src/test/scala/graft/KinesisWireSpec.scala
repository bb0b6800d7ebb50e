package graft

import java.util.Base64

import graft.streaming.{KeyedOrderedSink, KinesisWireClient, OcsPipeline, RawPacket}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** The wire adapter (KinesisWireClient) driven by the REAL ordered-put
  * path: a streaming query through KeyedOrderedSink.orderedPuts, with
  * a fake Kinesis service behind the transport seam that enforces the
  * same rules the real endpoint would — base64 payloads, the
  * SequenceNumberForOrdering chain, throttle errors. Proves the
  * existing PutClient contract drives the adapter end to end; only the
  * SigV4 HTTP hop is absent (deliberately — see the adapter's
  * Scaladoc for why the AWS SDK stays out of this build). */
class KinesisWireSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val EOT = OcsPipeline.EOT

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  import KinesisWireSpec.FakeKinesis

  test("orderedPuts drives the wire adapter: chained, base64-decoded, in order") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[RawPacket]
    KinesisWireSpec.service = new FakeKinesis
    // One wire client per executor resolution (here: one static
    // instance — the adapter itself is what's under test).
    KinesisWireSpec.client =
      new KinesisWireClient("graft-stream", KinesisWireSpec.service.transport)

    val query = OcsPipeline.cloudEvents(input.toDF())
      .writeStream
      .outputMode("append")
      .foreachBatch(KeyedOrderedSink.orderedPuts(
        () => KinesisWireSpec.client,
        keyCol = "partitionkey", dataCol = "raw",
        orderCols = Seq("receiveTs", "pos")))
      .start()

    try {
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:00"),
          s"m1${EOT}HEARTBEAT${EOT}m2${EOT}", seq = 1),
        RawPacket("conn-b", "10.0.0.2", ts("2026-01-01 10:00:01"),
          s"b1${EOT}", seq = 2))
      query.processAllAvailable()
      // A throttle mid-batch must retry IN PLACE through the wire
      // error taxonomy (retryable=true → TransientPutFailure), keeping
      // the chain intact.
      KinesisWireSpec.service.throttleNext = 2
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:05"),
          s"m3${EOT}m4${EOT}", seq = 3))
      query.processAllAvailable()
    } finally query.stop()

    val a = KinesisWireSpec.service.byKey("conn-a")
    assert(a.map(_.data) == Seq("m1", "m2", "m3", "m4"),
      "frames decoded from base64, heartbeats dropped, order kept across batches and throttles")
    assert(a.map(_.seq) == a.map(_.seq).sorted && a.map(_.seq).distinct == a.map(_.seq),
      "service-assigned sequences strictly increase per key")
    assert(KinesisWireSpec.service.byKey("conn-b").map(_.data) == Seq("b1"))
  }

  test("non-retryable wire errors fail the batch instead of looping") {
    val svc = new FakeKinesis
    val bad = new KinesisWireClient("wrong-stream", svc.transport)
    val e = intercept[IllegalStateException] {
      bad.put("conn-x", "payload", None, batchId = 0L)
    }
    assert(e.getMessage.contains("ResourceNotFoundException"))
  }

  test("the adapter translates throttles to the sink's transient class") {
    val svc = new FakeKinesis
    val c = new KinesisWireClient("graft-stream", svc.transport)
    svc.throttleNext = 1
    intercept[KeyedOrderedSink.TransientPutFailure] {
      c.put("conn-x", "payload", None, batchId = 0L)
    }
    // after the throttle drains, the same put lands and the local
    // chain carry picks up the service sequence
    val seq = c.put("conn-x", "payload", None, batchId = 0L)
    assert(c.lastSequence("conn-x").contains(seq))
  }
}

object KinesisWireSpec {
  /** Fake service: validates the chain like Kinesis (a stale
    * SequenceNumberForOrdering is rejected), assigns monotone decimal
    * sequences, records decoded payloads, and can throttle on cue. */
  final class FakeKinesis {
    final case class Landed(partitionKey: String, seq: Long, data: String)
    private val lastSeq = mutable.Map.empty[String, Long]
    private val landed = mutable.ArrayBuffer.empty[Landed]
    private var next = 1000L
    @volatile var throttleNext = 0

    val transport: KinesisWireClient.Transport = req => synchronized {
      if (throttleNext > 0) {
        throttleNext -= 1
        Left(KinesisWireClient.WireError(
          "ProvisionedThroughputExceededException", "slow down",
          retryable = true))
      } else if (req.streamName != "graft-stream") {
        Left(KinesisWireClient.WireError(
          "ResourceNotFoundException", s"no stream ${req.streamName}",
          retryable = false))
      } else if (req.sequenceNumberForOrdering !=
          lastSeq.get(req.partitionKey).map(_.toString)) {
        Left(KinesisWireClient.WireError(
          "InvalidArgumentException",
          s"stale SequenceNumberForOrdering for ${req.partitionKey}",
          retryable = false))
      } else {
        next += 1
        lastSeq(req.partitionKey) = next
        landed += Landed(req.partitionKey, next,
          new String(Base64.getDecoder.decode(req.dataB64), "UTF-8"))
        Right(KinesisWireClient.PutRecordResponse("shardId-0", next.toString))
      }
    }

    def byKey(k: String): Seq[Landed] =
      synchronized(landed.filter(_.partitionKey == k).toVector)
  }

  // statics so executor-side closures resolve the shared fakes
  @volatile var service: FakeKinesis = _
  @volatile var client: KinesisWireClient = _
}
