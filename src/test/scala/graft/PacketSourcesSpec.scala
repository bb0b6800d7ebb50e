package graft

import graft.sources.PacketSources
import graft.streaming.OcsPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PacketSourcesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("fake source streams RawPackets through the cloud-event pipeline") {
    val counter = new java.util.concurrent.atomic.AtomicLong
    val hb = new java.util.concurrent.atomic.AtomicLong
    PacketSourcesSpec.counters = (counter, hb)
    val query = OcsPipeline.cloudEvents(
      PacketSources.fake(spark, rowsPerSecond = 500).toDF())
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (c, h) = PacketSourcesSpec.counters
        c.addAndGet(batch.count())
        h.addAndGet(batch.filter(col("raw") === "HEARTBEAT").count())
        ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (counter.get() < 50 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
      }
    } finally query.stop()
    assert(counter.get() >= 50, s"fake source produced ${counter.get()} events")
    assert(hb.get() == 0, "heartbeats never reach the cloud-event stage")
  }

  test("replay source matches the batch pipeline's heartbeat-filtered count") {
    val replayEvents = OcsPipeline.cloudEvents(PacketSources.replay(spark, dir))
    val expected = Tables(spark, dir).events
      .filter(col("event_id") % 7 =!= 0).count()
    assert(replayEvents.count() == expected)
    // every payload framed exactly once: ids are unique per (ts,msg)
    assert(replayEvents.select("id").distinct().count() > 0)
  }
}

object PacketSourcesSpec {
  @volatile var counters: (java.util.concurrent.atomic.AtomicLong,
    java.util.concurrent.atomic.AtomicLong) = _
}
