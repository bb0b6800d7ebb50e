package graft.sources

import java.io.BufferedReader
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Multi-connection TCP packet source — the graft twin of the
  * reference's Ranch listener, which spawns one Proxy per ACCEPTED
  * connection (/root/reference/lib/trike/proxy.ex:64-83): one
  * listening port, N concurrent OCS feeds, each packet keyed by the
  * connection it arrived on. Spark's built-in socket source models
  * exactly one outbound connection; this source accepts inbound ones,
  * so the whole fleet of feeds lands in one stream with per-connection
  * identity — the shape `StatefulFraming` keys its buffers by.
  *
  * Emits the RawPacket schema (connId, sourceIp, receiveTs, payload,
  * seq): one row per received line, `connId` = `peer-ip:peer-port` of
  * the accepted socket, `seq` a global arrival counter (the
  * within-batch tiebreak for equal-millisecond packets).
  *
  * Like Spark's own TextSocketMicroBatchStream, this is a
  * driver-buffered, best-effort source for test/dev ingestion: data
  * accepted between the last committed offset and a crash is lost
  * (TCP has no replay); committed prefixes are trimmed from the
  * buffer. A production deployment puts a durable bus between the
  * listener and Spark — `ShardedJournal.replayStream` models that
  * contract — but the wire protocol and per-connection keying here
  * are exactly the reference's.
  *
  * Usage: {{{
  * spark.readStream.format("graft-multisocket")
  *   .option("port", "8001").load()
  * }}}
  */
class MultiSocketSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-multisocket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MultiSocketSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MultiSocketTable(properties.getOrDefault("port", "8001").toInt,
      Option(properties.get("name")),
      properties.getOrDefault("maxBufferedRows", "65536").toInt)
}

object MultiSocketSource {
  val schema: StructType = StructType(Seq(
    StructField("connId", StringType),
    StructField("sourceIp", StringType),
    StructField("receiveTs", TimestampType),
    StructField("payload", StringType),
    StructField("seq", LongType)))

  /** Ephemeral-port rendezvous for specs: `option("port", "0")` binds
    * any free port; the bound port is published here under the
    * source's `name` option. */
  val boundPorts: ConcurrentHashMap[String, Integer] = new ConcurrentHashMap()

  /** Read-only monitoring surface a spec (or an operator's health
    * probe) can observe without reaching into the query's internals. */
  trait StreamProbe {
    /** Rows currently buffered (bounded by `maxBufferedRows`). */
    def bufferedRows: Int
    def maxRows: Int
    /** Rows currently buffered PER CONNECTION — the queue-depth twin
      * of the reference health checker's per-proxy mailbox size
      * (health_checker.ex:60-72); HealthReporter.connectionHealth
      * surfaces it as the `queue_depth` column. */
    def bufferedByConn: Map[String, Int]
    /** SO_KEEPALIVE as actually set on each accepted socket. */
    def acceptedKeepAlive: Seq[Boolean]
    /** SO_RCVBUF as actually set on each accepted socket (the
      * reference sets buffer: 131_072, proxy.ex:78-83; the kernel may
      * round up, so observers assert ≥). */
    def acceptedRecvBuffer: Seq[Int]
    /** SO_LINGER per accepted socket: 0 = linger on with zero
      * timeout (reference linger: {true, 0} — close is an immediate
      * RST, no TIME_WAIT pileup across a reconnecting fleet). */
    def acceptedLinger: Seq[Int]
    /** Reader threads currently inside readLoop — the graceful-drain
      * observable: stop() must release readers parked on a full
      * buffer, so this must reach 0 shortly after stop even when
      * producers were blocked mid-send. */
    def liveReaders: Int
  }

  /** Named-stream registry for specs: lets a test observe buffer
    * occupancy (the back-pressure bound) and accepted-socket options. */
  val activeStreams: ConcurrentHashMap[String, StreamProbe] =
    new ConcurrentHashMap()
}

private[sources] class MultiSocketTable(port: Int, name: Option[String],
    maxBufferedRows: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft-multisocket:$port"
  override def schema(): StructType = MultiSocketSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = MultiSocketSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MultiSocketStream(port, name, maxBufferedRows)
    }
}

/** One long offset = total rows accepted since start, stamped with the
  * issuing instance's epoch. The buffer holds [committed, latest);
  * commit(n) trims everything before n. The epoch makes an offset
  * restored from a PREVIOUS incarnation's WAL unambiguous (see
  * deserializeOffset) — connector Offset equality is json-string
  * equality, so same-epoch same-n offsets stay equal and a restored
  * foreign offset never spuriously equals a fresh one. */
private[sources] case class RowCountOffset(n: Long, epoch: String = "")
  extends Offset {
  override def json(): String = s"""{"e":"$epoch","n":$n}"""
}

private[sources] object RowCountOffset {
  private val Re = """\{"e":"([^"]*)","n":(-?\d+)\}""".r
  /** (row count, issuing epoch); a legacy bare-long offset (or any
    * unrecognized shape) parses as epoch-less — i.e. foreign. */
  def parse(json: String): (Long, Option[String]) = json.trim match {
    case Re(e, n) => (n.toLong, Some(e))
    case s => (s.toLong, None)
  }
}

private[sources] class MultiSocketStream(port: Int, name: Option[String],
    maxBufferedRows: Int = 65536)
  extends MicroBatchStream with MultiSocketSource.StreamProbe {

  /** (connId, sourceIp, epochMicros, line, seq) in arrival order;
    * index 0 corresponds to absolute offset `trimmed`.
    *
    * BOUNDED: a reader thread that finds `maxBufferedRows` rows not
    * yet HANDED TO THE ENGINE (absolute backlog past `plannedEnd`)
    * BLOCKS (monitor wait) until `planInputPartitions` takes them —
    * with the kernel socket buffer then filling behind it, the peer's
    * sends stall, which IS TCP back-pressure end-to-end: the same
    * flow control the reference gets from Ranch's `active: :once`
    * one-packet-per-ack reads (proxy.ex:81). The old unbounded
    * ArrayBuffer meant a stalled query under live feeds = driver OOM.
    *
    * The budget is deliberately measured against the PLANNED offset,
    * not the committed one: MicroBatchExecution only `commit`s batch
    * N's source offsets while constructing batch N+1, so a buffer
    * that frees space only on commit livelocks at exactly the cap —
    * no free space ⇒ no new offsets ⇒ no next batch ⇒ no commit.
    * Rows stay buffered until commit (a failed batch may be
    * re-planned), so total occupancy is bounded by cap (unplanned) +
    * the engine's uncommitted in-flight span (each batch itself ≤ cap
    * rows) — a small multiple of the cap, never data-proportional. */
  private val buffer = new ArrayBuffer[(String, String, Long, String, Long)]
  private var trimmed = 0L
  private var plannedEnd = 0L
  /** Stamped into every offset this instance issues; an offset whose
    * epoch differs was written by a previous incarnation's WAL — the
    * explicit restart-vs-midrun discriminator for deserializeOffset. */
  private val instanceEpoch = java.util.UUID.randomUUID().toString
  private val seqGen = new AtomicLong(0L)
  @volatile private var stopped = false
  private val readersIn = new AtomicLong(0L)
  private val conns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  /** Receive-buffer size the reference configures per accepted socket
    * (proxy.ex:78-83 `buffer: 131_072`). Also set on the LISTENER
    * before bind: that is what sizes the TCP window the kernel
    * advertises on accepted connections (per-socket sets after accept
    * can no longer grow the negotiated window). */
  private val recvBufferBytes = 131072

  private val server = new ServerSocket()
  server.setReceiveBufferSize(recvBufferBytes)
  server.bind(new InetSocketAddress(port))
  name.foreach { n =>
    MultiSocketSource.boundPorts.put(n, Integer.valueOf(server.getLocalPort))
    MultiSocketSource.activeStreams.put(n, this)
  }

  override def bufferedRows: Int = buffer.synchronized(buffer.size)
  override def maxRows: Int = maxBufferedRows
  // A socket can be closed concurrently (stop() closes sockets still in
  // the set; a reader's finally has a remove-then-close window), and
  // getKeepAlive throws SocketException on a closed socket — a probe
  // must return a snapshot, never crash the observer, so closed
  // sockets are skipped.
  override def acceptedKeepAlive: Seq[Boolean] =
    conns.asScala.toSeq.flatMap(s => scala.util.Try(s.getKeepAlive).toOption)
  override def acceptedRecvBuffer: Seq[Int] =
    conns.asScala.toSeq.flatMap(s => scala.util.Try(s.getReceiveBufferSize).toOption)
  override def acceptedLinger: Seq[Int] =
    conns.asScala.toSeq.flatMap(s => scala.util.Try(s.getSoLinger).toOption)
  override def liveReaders: Int = readersIn.get().toInt
  override def bufferedByConn: Map[String, Int] =
    buffer.synchronized(buffer.groupBy(_._1).map { case (k, v) => k -> v.size })

  // The Ranch acceptor: one thread accepts, one reader thread per live
  // connection (connection counts are fleet-sized — tens, not
  // thousands — matching the reference's one-process-per-conn model).
  private val acceptor = new Thread(() => {
    while (!stopped) {
      try {
        val sock = server.accept()
        // Socket options as the reference sets on every accepted
        // socket (proxy.ex:78-83 `keepalive: true, buffer: 131_072,
        // linger: {true, 0}`): keepalive makes a silently half-open
        // feed fail fast at the transport instead of surfacing minutes
        // later as a stale session; the receive buffer sizes the flow-
        // control window the back-pressure path fills; linger(0) makes
        // close an immediate RST — no TIME_WAIT pileup when a fleet of
        // producers reconnects.
        sock.setKeepAlive(true)
        sock.setReceiveBufferSize(recvBufferBytes)
        sock.setSoLinger(true, 0)
        conns.add(sock)
        val peer = sock.getRemoteSocketAddress.asInstanceOf[InetSocketAddress]
        val connId = s"${peer.getAddress.getHostAddress}:${peer.getPort}"
        val reader = new Thread(() => readLoop(sock, connId,
          peer.getAddress.getHostAddress))
        reader.setDaemon(true)
        reader.start()
      } catch {
        case _: Throwable if stopped => ()
        // Transient accept failure while running (e.g. EMFILE): the
        // listener must survive it — a dead acceptor would silently
        // starve the query with no error. Log, back off, keep
        // accepting; only the stopped path exits quietly.
        case e: Throwable =>
          Console.err.println(s"graft-multisocket accept failed (retrying): $e")
          try Thread.sleep(100L) catch { case _: InterruptedException => () }
      }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def readLoop(sock: Socket, connId: String, ip: String): Unit = {
    readersIn.incrementAndGet()
    val in = new BufferedReader(new java.io.InputStreamReader(
      sock.getInputStream, StandardCharsets.UTF_8))
    try {
      var line = in.readLine()
      while (line != null && !stopped) {
        val micros = System.currentTimeMillis() * 1000L
        buffer.synchronized {
          // Back-pressure: block this connection's reader while the
          // engine-unseen backlog is at capacity; planInputPartitions
          // notifies when it takes rows. The timed wait re-checks
          // `stopped` so shutdown never hangs on a stuffed buffer.
          def unplanned: Long =
            trimmed + buffer.size - math.max(plannedEnd, trimmed)
          while (unplanned >= maxBufferedRows && !stopped)
            buffer.wait(100L)
          if (!stopped)
            buffer += ((connId, ip, micros, line, seqGen.getAndIncrement()))
        }
        if (!stopped) line = in.readLine()
      }
    } catch { case _: Throwable => () } finally {
      conns.remove(sock)
      sock.close()
      readersIn.decrementAndGet()
    }
  }

  override def initialOffset(): Offset = RowCountOffset(0L, instanceEpoch)

  /** Parses an offset from the checkpoint log — and, ONLY when its
    * epoch proves it was issued by a PREVIOUS incarnation, rebases
    * this instance's numbering forward to it.
    *
    * Two very different callers share this hook. (1) On RESTART the
    * engine replays the WAL: a fresh instance starts at trimmed=0 but
    * the restored offset is the PREVIOUS run's row count N — without a
    * rebase every batch would plan [N, latest<N) = empty while
    * commit(N) trims N rows of new post-restart data; rebasing
    * renumbers this instance's buffered rows to [N, N+size). (2) On
    * EVERY mid-run batch the engine ALSO re-parses the previous
    * batch's end offset from the WAL, BEFORE committing it. An
    * unconditional `if (n > trimmed) trimmed = n` (the round-8 code)
    * fast-forwards in case (2) without removing the still-buffered
    * rows, so the subsequent commit's `drop` is 0 — every later batch
    * then re-serves the same rows (duplicates), and under a bounded
    * buffer the blocked readers never wake (livelock at the cap).
    *
    * The discriminator is EXPLICIT, not heuristic: every offset this
    * instance issues carries `instanceEpoch` in its JSON, so a parsed
    * offset with a different (or missing) epoch can ONLY be WAL state
    * from a previous incarnation — rebase; a same-epoch parse is the
    * engine re-reading our own numbering — pure parse. Two earlier
    * designs failed here: the round-9 value heuristic
    * (`n > trimmed + buffer.size`) misclassified a genuine restart
    * whenever reconnecting producers re-buffered ≥ N rows before the
    * WAL was first parsed (silently trimming the first N post-restart
    * rows at commit), and a rebase-before-first-issuance flag fails
    * because on a committed-batch restart MicroBatchExecution calls
    * latestOffset() (in constructing the next batch) BEFORE it ever
    * parses the restored offset (in runBatch's start-offset
    * resolution). The epoch is ordering-independent. A replay may
    * parse several foreign offsets (a committed end and a pending
    * batch's end); rebasing to the max keeps the pending batch's
    * replay a clean empty span — the previous run's data is gone
    * regardless (TCP has no replay; that loss is the documented
    * contract). The one wrinkle of the latestOffset-before-parse
    * ordering is a single post-restart batch whose end predates the
    * rebase; planInputPartitions clamps it to the same documented
    * empty replay. */
  override def deserializeOffset(json: String): Offset = {
    val (n, epoch) = RowCountOffset.parse(json)
    val foreign = !epoch.contains(instanceEpoch)
    buffer.synchronized { if (foreign && n > trimmed) trimmed = n }
    RowCountOffset(n, epoch.getOrElse(""))
  }
  override def latestOffset(): Offset =
    buffer.synchronized(RowCountOffset(trimmed + buffer.size, instanceEpoch))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[RowCountOffset].n,
      end.asInstanceOf[RowCountOffset].n)
    val rows = buffer.synchronized {
      // A span predating a foreign-offset rebase (a replayed pending
      // batch, or the one constructed-before-parse post-restart batch)
      // lies partly or wholly below `trimmed` — clamp to the documented
      // empty replay rather than throwing on a negative index.
      val lo = math.max(0, (s - trimmed).toInt)
      val hi = math.max(lo, (e - trimmed).toInt)
      val taken = buffer.slice(lo, hi).toArray
      if (e > plannedEnd) { plannedEnd = e; buffer.notifyAll() }
      taken
    }
    Array(MultiSocketPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new MultiSocketReader(partition.asInstanceOf[MultiSocketPartition].rows)

  override def commit(end: Offset): Unit = buffer.synchronized {
    val n = end.asInstanceOf[RowCountOffset].n
    val drop = (n - trimmed).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); trimmed = n }
    buffer.notifyAll() // wake readers blocked on a full buffer
  }

  override def stop(): Unit = {
    stopped = true
    buffer.synchronized(buffer.notifyAll()) // release blocked readers
    conns.asScala.foreach(s => scala.util.Try(s.close()))
    scala.util.Try(server.close())
    name.foreach(MultiSocketSource.activeStreams.remove)
  }
}

private[sources] case class MultiSocketPartition(
  rows: Array[(String, String, Long, String, Long)]) extends InputPartition

private[sources] class MultiSocketReader(
  rows: Array[(String, String, Long, String, Long)])
  extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows.length }
  override def get(): InternalRow = {
    val (connId, ip, micros, line, seq) = rows(i)
    InternalRow(UTF8String.fromString(connId), UTF8String.fromString(ip),
      micros, UTF8String.fromString(line), seq)
  }
  override def close(): Unit = ()
}
