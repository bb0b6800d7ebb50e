package graft

import graft.streaming.{KeyedOrderedSink, KinesisLikeSink, OcsPipeline, RawPacket}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #8: end-to-end readStream → frame → heartbeat filter →
  * CloudEvent → partition-keyed sink with per-key ordering. */
class StreamingOcsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val EOT = OcsPipeline.EOT

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("ocs pipeline end-to-end over a memory stream with ordered keyed sink") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[RawPacket]
    val sink = new KinesisLikeSink
    StreamingOcsSpec.sharedSink = sink

    val query = OcsPipeline.cloudEvents(input.toDF())
      .writeStream
      .outputMode("append")
      // The production writer: distributed per-key chain enforcement
      // (KeyedOrderedSinkSpec covers its contract in isolation).
      .foreachBatch(KeyedOrderedSink.orderedPuts(
        () => StreamingOcsSpec.sharedSink,
        keyCol = "partitionkey", dataCol = "raw",
        orderCols = Seq("receiveTs", "pos")))
      .start()

    try {
      // batch 1: conn-a gets two frames + a heartbeat + partial tail;
      // conn-b one frame.
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:00"),
          s"m1${EOT}HEARTBEAT${EOT}m2${EOT}PARTIAL"),
        RawPacket("conn-b", "10.0.0.2", ts("2026-01-01 10:00:01"),
          s"b1${EOT}"))
      query.processAllAvailable()
      // batch 2: more data for conn-a — must chain after batch 1.
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:05"),
          s"m3${EOT}"))
      query.processAllAvailable()
    } finally query.stop()

    assert(sink.byKey("conn-a").map(_.data) == Seq("m1", "m2", "m3"),
      "frames in order, heartbeat and partial tail dropped")
    assert(sink.byKey("conn-b").map(_.data) == Seq("b1"))
    val seqA = sink.byKey("conn-a").map(_.seq)
    assert(seqA == seqA.sorted, "per-key sequence strictly ordered")
  }

  test("watermarked tumbling window aggregate on a stream (SURVEY #29)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    val query = agg.writeStream
      .outputMode("append")
      .format("memory").queryName("win_counts")
      .start()

    try {
      input.addData(
        (ts("2026-01-01 10:10:00"), "click"),
        (ts("2026-01-01 10:20:00"), "click"),
        (ts("2026-01-01 10:40:00"), "purchase"))
      query.processAllAvailable()
      // advance the watermark beyond 11:00 so the 10:00 window closes…
      input.addData((ts("2026-01-01 13:00:00"), "click"))
      query.processAllAvailable()
      // …and one more batch so the closed window is emitted (append
      // mode emits finalized windows on the following trigger).
      input.addData((ts("2026-01-01 13:05:00"), "click"))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("event_type"), col("count"))
      .as[(String, String, Long)].collect().toSet
    assert(out.contains(("2026-01-01 10:00:00", "click", 2L)))
    assert(out.contains(("2026-01-01 10:00:00", "purchase", 1L)))
  }
}

object StreamingOcsSpec {
  /** foreachBatch closures are serialized; route the assertion sink
    * through a static field so the driver-side spec can read it. */
  @volatile var sharedSink: KinesisLikeSink = _
}
