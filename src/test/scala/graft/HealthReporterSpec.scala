package graft

import graft.streaming.{HealthListener, HealthReporter, OcsPipeline, RawPacket}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the reference's periodic health checker
  * (health_checker.ex): query-level progress via a listener, plus a
  * per-connection update-mode health aggregate. */
class HealthReporterSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val EOT = OcsPipeline.EOT

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("listener publishes per-batch health and per-conn state updates flow") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new HealthListener(lines.add(_))
    spark.streams.addListener(listener)

    val input = MemoryStream[RawPacket]
    val health = HealthReporter.connectionHealth(
      OcsPipeline.frames(input.toDF()))
    val query = health.writeStream
      .outputMode("update")
      .format("memory").queryName("conn_health")
      .start()

    try {
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:00"),
          s"m1${EOT}HEARTBEAT${EOT}", seq = 1),
        RawPacket("conn-b", "10.0.0.2", ts("2026-01-01 10:00:05"),
          s"b1${EOT}", seq = 2))
      query.processAllAvailable()
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:09"),
          s"m2${EOT}", seq = 3))
      query.processAllAvailable()
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }

    // Per-connection half: update mode re-emits conn-a each trigger,
    // so the LAST row per connection carries the running totals.
    val last = spark.table("conn_health")
      .groupBy($"conn_id")
      .agg(max(struct($"n_msgs", $"n_heartbeats", $"n_data",
        $"msg_bytes", $"first_epoch", $"last_epoch")).as("s"))
      .select($"conn_id", $"s.*")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(last.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq(("conn-a", 3L, 1L, 2L), ("conn-b", 1L, 0L, 1L)),
      s"running per-conn counters (msgs, heartbeats, data); got $last")
    val connA = last.find(_._1 == "conn-a").get
    assert(connA._7 > connA._6, "last_epoch advances past first_epoch")

    // Listener half: one health_check line per completed batch with
    // the progress fields, like health_checker's interval logging.
    val published = lines.toArray(Array.empty[String]).toSeq
    assert(published.exists(_.startsWith("health_check started query=conn_health")))
    val progress = published.filter(_.contains("batch="))
    assert(progress.nonEmpty, s"per-batch health lines published: $published")
    assert(progress.exists(l =>
      l.contains("query=conn_health") && l.contains("inputRows=") &&
        l.contains("stateRows=")),
      s"progress lines carry rows + state backlog; got $progress")
  }

  test("connectionHealth surfaces per-connection queue depth from the source probe") {
    // The reference health checker logs each proxy's mailbox size
    // (health_checker.ex:60-72); here the per-connection buffered-row
    // depth rides the health aggregate as `queue_depth`, read from the
    // named stream's probe at every trigger. A deterministic probe
    // stands in for the socket stream (the real probe's map is
    // asserted against live sockets in MultiSocketSourceSpec).
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val probe = new graft.sources.MultiSocketSource.StreamProbe {
      def bufferedRows: Int = 9
      def maxRows: Int = 64
      def bufferedByConn: Map[String, Int] = Map("conn-a" -> 7, "conn-c" -> 2)
      def acceptedKeepAlive: Seq[Boolean] = Seq.empty
      def acceptedRecvBuffer: Seq[Int] = Seq.empty
      def acceptedLinger: Seq[Int] = Seq.empty
      def liveReaders: Int = 2
    }
    graft.sources.MultiSocketSource.activeStreams.put("spechealthq", probe)
    val input = MemoryStream[RawPacket]
    val health = HealthReporter.connectionHealth(
      OcsPipeline.frames(input.toDF()), probeName = Some("spechealthq"))
    val query = health.writeStream
      .outputMode("update")
      .format("memory").queryName("conn_health_q")
      .start()
    try {
      input.addData(
        RawPacket("conn-a", "10.0.0.1", ts("2026-01-01 10:00:00"),
          s"m1${EOT}", seq = 1),
        RawPacket("conn-b", "10.0.0.2", ts("2026-01-01 10:00:05"),
          s"b1${EOT}", seq = 2))
      query.processAllAvailable()
    } finally {
      query.stop()
      graft.sources.MultiSocketSource.activeStreams.remove("spechealthq")
    }
    val depths = spark.table("conn_health_q")
      .select($"conn_id", $"queue_depth").as[(String, Long)]
      .collect().toMap
    assert(depths == Map("conn-a" -> 7L, "conn-b" -> 0L),
      s"queue_depth from the probe (0 when the conn has no backlog): $depths")
  }
}
