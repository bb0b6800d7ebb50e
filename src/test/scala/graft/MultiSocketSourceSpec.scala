package graft

import java.net.Socket
import java.nio.charset.StandardCharsets

import graft.sources.MultiSocketSource
import graft.streaming.{OcsPipeline, RawPacket}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Ranch-listener twin (SURVEY §2 #108): one listening port, N
  * accepted TCP connections, every line keyed by the connection it
  * arrived on — driven end-to-end through the CloudEvent pipeline. */
class MultiSocketSourceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val EOT = OcsPipeline.EOT

  private def send(port: Int, lines: Seq[String]): Socket = {
    val s = new Socket("127.0.0.1", port)
    val out = s.getOutputStream
    out.write(lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
    out.flush()
    s
  }

  test("accepts several connections and keys packets by peer") {
    import spark.implicits._
    val q = spark.readStream.format("graft-multisocket")
      .option("port", "0").option("name", "spec1").load()
      .as[RawPacket]
      .map(p => (p.connId, p.payload))
      .toDF("connId", "payload")
      .writeStream.outputMode("append")
      .format("memory").queryName("msock").start()
    try {
      // The source binds an ephemeral port and publishes it by name.
      var port = 0
      val deadline = System.nanoTime() + 10e9.toLong
      while (port == 0 && System.nanoTime() < deadline) {
        val p = MultiSocketSource.boundPorts.get("spec1")
        if (p != null) port = p.intValue() else Thread.sleep(50)
      }
      assert(port > 0, "source did not publish its bound port")

      val c1 = send(port, Seq(s"a1$EOT", s"a2$EOT"))
      val c2 = send(port, Seq(s"b1$EOT"))
      try {
        // Poll until all 3 lines came through the accept/read threads.
        val until = System.nanoTime() + 30e9.toLong
        var n = 0L
        while (n < 3 && System.nanoTime() < until) {
          q.processAllAvailable()
          n = spark.table("msock").count()
          if (n < 3) Thread.sleep(100)
        }
        val rows = spark.table("msock").collect()
          .map(r => r.getString(0) -> r.getString(1))
        assert(rows.length == 3, rows.toSeq)
        val byConn = rows.groupBy(_._1)
        assert(byConn.size == 2, s"two distinct connections: $byConn")
        val payloads = byConn.map { case (_, v) => v.map(_._2).toSet }.toSet
        assert(payloads == Set(Set(s"a1$EOT", s"a2$EOT"), Set(s"b1$EOT")))
      } finally { c1.close(); c2.close() }
    } finally q.stop()
  }

  test("feeds the CloudEvent pipeline with per-connection identity") {
    val src = spark.readStream.format("graft-multisocket")
      .option("port", "0").option("name", "spec2").load()
    val q = OcsPipeline.cloudEvents(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("msock_ce").start()
    try {
      var port = 0
      val deadline = System.nanoTime() + 10e9.toLong
      while (port == 0 && System.nanoTime() < deadline) {
        val p = MultiSocketSource.boundPorts.get("spec2")
        if (p != null) port = p.intValue() else Thread.sleep(50)
      }
      val c = send(port, Seq(s"m1${EOT}HEARTBEAT${EOT}m2$EOT"))
      try {
        val until = System.nanoTime() + 30e9.toLong
        var n = 0L
        while (n < 2 && System.nanoTime() < until) {
          q.processAllAvailable()
          n = spark.table("msock_ce").count()
          if (n < 2) Thread.sleep(100)
        }
        val out = spark.table("msock_ce")
        // Heartbeat dropped; both frames carry the peer connection key
        // and a content-addressed id.
        assert(out.count() == 2)
        assert(out.filter(col("raw") === "HEARTBEAT").count() == 0)
        assert(out.filter(col("id").isNull).count() == 0)
        assert(out.select("partitionkey").distinct().count() == 1)
      } finally c.close()
    } finally q.stop()
  }

  test("restart from checkpoint does not trim unemitted post-restart rows") {
    val ckpt = java.nio.file.Files.createTempDirectory("msock-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("msock-out").toString

    def startQuery() = spark.readStream.format("graft-multisocket")
      .option("port", "0").option("name", "spec3").load()
      .selectExpr("connId", "payload")
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    def awaitPort(): Int = {
      var port = 0
      val deadline = System.nanoTime() + 10e9.toLong
      while (port == 0 && System.nanoTime() < deadline) {
        val p = MultiSocketSource.boundPorts.get("spec3")
        if (p != null) port = p.intValue() else Thread.sleep(50)
      }
      assert(port > 0, "source did not publish its bound port"); port
    }

    def awaitCount(q: org.apache.spark.sql.streaming.StreamingQuery,
        want: Long): Long = {
      val until = System.nanoTime() + 30e9.toLong
      var n = -1L
      while (n < want && System.nanoTime() < until) {
        q.processAllAvailable()
        n = spark.read.parquet(out).count()
        if (n < want) Thread.sleep(100)
      }
      n
    }

    val q1 = startQuery()
    try {
      val c = send(awaitPort(), Seq(s"r1$EOT", s"r2$EOT", s"r3$EOT"))
      try assert(awaitCount(q1, 3) == 3) finally c.close()
    } finally q1.stop()

    // Restart: a fresh stream instance begins at trimmed=0 while the
    // restored offset is 3. Without the deserializeOffset fast-forward,
    // the first ~3 post-restart rows are silently trimmed uncommitted
    // and this times out at 3 rows.
    MultiSocketSource.boundPorts.remove("spec3")
    val q2 = startQuery()
    try {
      val c = send(awaitPort(), Seq(s"r4$EOT", s"r5$EOT"))
      try {
        assert(awaitCount(q2, 5) == 5)
        val payloads = spark.read.parquet(out).collect()
          .map(_.getString(1)).toSet
        assert(payloads == Set("r1", "r2", "r3", "r4", "r5").map(_ + EOT))
      } finally c.close()
    } finally q2.stop()
  }

  test("back-pressure: full buffer blocks the producer, no loss on resume; keepalive set") {
    // A producer far faster than the (deliberately tiny) buffer cap:
    // the reader thread must BLOCK rather than grow the heap, and
    // every line must still land once the query drains — bounded
    // memory with zero data loss is exactly the TCP back-pressure
    // contract (reference proxy.ex:81 active: :once + keepalive).
    import spark.implicits._
    val total = 500
    val cap = 32
    val q = spark.readStream.format("graft-multisocket")
      .option("port", "0").option("name", "specbp")
      .option("maxBufferedRows", cap.toString).load()
      .as[RawPacket].map(_.payload).toDF("payload")
      .writeStream.outputMode("append")
      .format("memory").queryName("msock_bp").start()
    try {
      var port = 0
      val deadline = System.nanoTime() + 10e9.toLong
      while (port == 0 && System.nanoTime() < deadline) {
        val p = MultiSocketSource.boundPorts.get("specbp")
        if (p != null) port = p.intValue() else Thread.sleep(50)
      }
      assert(port > 0, "source did not publish its bound port")
      val probe = MultiSocketSource.activeStreams.get("specbp")
      assert(probe != null, "stream did not register its probe")

      // Blast all lines from one connection as fast as TCP allows.
      val c = send(port, (1 to total).map(i => s"p$i$EOT"))
      try {
        // While draining, the source-side buffer must never exceed the
        // cap (the probe reads under the same lock the reader appends
        // under, so this observes the bound exactly, not racily).
        val until = System.nanoTime() + 60e9.toLong
        var n = 0L
        var maxSeen = 0
        while (n < total && System.nanoTime() < until) {
          maxSeen = math.max(maxSeen, probe.bufferedRows)
          q.processAllAvailable()
          n = spark.table("msock_bp").count()
          if (n < total) Thread.sleep(20)
        }
        assert(n == total, s"all $total lines must land after draining, got $n")
        // Occupancy = unplanned backlog (≤ cap, reader-enforced) plus
        // the planned-but-uncommitted span the engine holds for batch
        // replay (each batch ≤ cap rows, ≤ 2 in flight): bounded by a
        // small multiple of the cap, never by how much the producer
        // sent (total = 500 ≫ 3·cap would fail this before the fix).
        assert(maxSeen <= 3 * cap, s"buffer exceeded its bound: $maxSeen > 3×$cap")
        val got = spark.table("msock_bp").collect().map(_.getString(0)).toSet
        assert(got == (1 to total).map(i => s"p$i$EOT").toSet, "no loss, no dupes")
        // Socket options per accepted socket (while still open), the
        // reference's proxy.ex:78-83 triple: keepalive, 128 KiB
        // receive buffer (kernel may round up — assert ≥), linger(0).
        val ka = probe.acceptedKeepAlive
        assert(ka.isEmpty || ka.forall(identity),
          s"accepted sockets must have SO_KEEPALIVE: $ka")
        val rb = probe.acceptedRecvBuffer
        assert(rb.isEmpty || rb.forall(_ >= 131072),
          s"accepted sockets must carry a >=128KiB receive buffer: $rb")
        val lg = probe.acceptedLinger
        assert(lg.isEmpty || lg.forall(_ == 0),
          s"accepted sockets must linger(true, 0): $lg")
      } finally c.close()
    } finally q.stop()
  }

  test("stop() releases readers parked on a full buffer — no hung threads") {
    // Graceful drain under pressure: a producer stuffs the (tiny)
    // buffer far past its cap so its reader thread is parked in the
    // back-pressure wait, then the query stops WITHOUT draining. The
    // reader must observe `stopped` (stop() notifies the monitor; the
    // timed wait re-checks) and exit its loop — liveReaders reaching 0
    // is the proof no thread hangs holding the socket.
    import spark.implicits._
    val cap = 8
    val q = spark.readStream.format("graft-multisocket")
      .option("port", "0").option("name", "specstop")
      .option("maxBufferedRows", cap.toString).load()
      .as[RawPacket].map(_.payload).toDF("payload")
      .writeStream.outputMode("append")
      .format("memory").queryName("msock_stop").start()
    var port = 0
    val deadline = System.nanoTime() + 10e9.toLong
    while (port == 0 && System.nanoTime() < deadline) {
      val p = MultiSocketSource.boundPorts.get("specstop")
      if (p != null) port = p.intValue() else Thread.sleep(50)
    }
    assert(port > 0, "source did not publish its bound port")
    val probe = MultiSocketSource.activeStreams.get("specstop")
    assert(probe != null, "stream did not register its probe")
    // Far more lines than the cap: the reader parks once the engine
    // stops taking rows. Wait until the buffer is pinned at capacity
    // with a live reader — the parked state the verdict asked about.
    val c = send(port, (1 to 2000).map(i => s"s$i$EOT"))
    try {
      val until = System.nanoTime() + 30e9.toLong
      while ((probe.liveReaders < 1 || probe.bufferedRows < cap) &&
          System.nanoTime() < until) Thread.sleep(20)
      assert(probe.liveReaders >= 1, "producer's reader thread never started")
      // Queue depth per connection (the health checker's mailbox-size
      // twin): one producer, so the per-conn map is a single entry
      // keyed by the live connection, with a non-empty backlog while
      // the reader is parked. (No exact-sum assert: the engine drains
      // concurrently, and the two probe reads are separate locks.)
      val depths = probe.bufferedByConn
      assert(depths.size == 1, s"one producer => one queue: $depths")
      assert(depths.values.head > 0, s"parked producer's queue non-empty: $depths")
      q.stop() // undrained stop while the reader is (or soon is) parked
      val exitBy = System.nanoTime() + 15e9.toLong
      while (probe.liveReaders > 0 && System.nanoTime() < exitBy)
        Thread.sleep(20)
      assert(probe.liveReaders == 0,
        s"reader threads must exit after stop, ${probe.liveReaders} still live")
    } finally { c.close(); if (q.isActive) q.stop() }
  }
}
