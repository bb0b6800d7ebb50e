package graft.sources

import java.net.Socket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Unit-level coverage of the MultiSocketStream offset state machine —
  * the cases a full streaming query cannot force deterministically
  * because they hinge on the ORDER of WAL parsing vs producer
  * reconnection vs the engine's first latestOffset call.
  *
  * The contract under test (deserializeOffset scaladoc): offsets carry
  * the issuing instance's epoch; a parsed offset rebases iff its epoch
  * is foreign (a previous incarnation's WAL state). The round-9 value
  * heuristic (`n > trimmed + size`) failed exactly when a reconnecting
  * producer buffered >= N rows before the WAL was first parsed, and a
  * rebase-before-first-issuance flag fails because on a
  * committed-batch restart the engine calls latestOffset() before it
  * ever parses the restored offset.
  */
class MultiSocketStreamUnitSpec extends AnyFunSuite {

  private def withStream(name: String)(body: (MultiSocketStream, Int) => Unit): Unit = {
    val s = new MultiSocketStream(0, Some(name))
    try body(s, MultiSocketSource.boundPorts.get(name).intValue())
    finally {
      s.stop()
      MultiSocketSource.boundPorts.remove(name)
    }
  }

  private def sendLines(port: Int, lines: Seq[String]): Unit = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = sock.getOutputStream
      out.write(lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
      out.flush()
    } finally sock.close()
  }

  private def awaitBuffered(s: MultiSocketStream, want: Int): Unit = {
    val deadline = System.nanoTime() + 10e9.toLong
    while (s.bufferedRows < want && System.nanoTime() < deadline) Thread.sleep(20)
    assert(s.bufferedRows == want, s"expected $want buffered rows, got ${s.bufferedRows}")
  }

  private def planned(s: MultiSocketStream, from: Long, to: Long): Seq[String] = {
    val parts = s.planInputPartitions(RowCountOffset(from), RowCountOffset(to))
    parts.flatMap(_.asInstanceOf[MultiSocketPartition].rows.map(_._4)).toSeq
  }

  private def n(off: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    off.asInstanceOf[RowCountOffset].n

  test("foreign-epoch offset rebases even when reconnected producers pre-buffered >= N rows") {
    withStream("unit-restart") { (s, port) =>
      // Previous incarnation committed offset 3 (foreign epoch); THIS
      // instance has 4 rows buffered BEFORE the WAL is parsed (fast
      // reconnect). The r9 heuristic saw 3 <= 0 + 4 and skipped the
      // rebase, planning from absolute 3 and trimming rows a..c unseen
      // at commit.
      sendLines(port, Seq("a", "b", "c", "d"))
      awaitBuffered(s, 4)
      s.deserializeOffset("""{"e":"prev-incarnation","n":3}""")
      assert(n(s.latestOffset()) == 7L, "buffered rows must renumber to [3,7)")
      // Every buffered row is handed to the engine exactly once.
      assert(planned(s, 3L, 7L) == Seq("a", "b", "c", "d"))
      s.commit(RowCountOffset(7L))
      assert(s.bufferedRows == 0)
    }
  }

  test("restart ordering: latestOffset issued BEFORE the WAL parse still rebases") {
    withStream("unit-order") { (s, port) =>
      // The committed-batch restart path: MicroBatchExecution calls
      // latestOffset() while constructing the next batch, and only
      // parses the restored offset inside runBatch — the epoch
      // discriminator must be insensitive to that order (a
      // first-issuance flag is not).
      val early = n(s.latestOffset()) // engine asks before any parse
      assert(early == 0L)
      sendLines(port, Seq("r4", "r5"))
      awaitBuffered(s, 2)
      s.deserializeOffset("""{"e":"prev-incarnation","n":3}""") // runBatch parse
      // The one batch constructed before the parse replays empty…
      assert(planned(s, 3L, early) == Seq.empty)
      s.commit(RowCountOffset(early))
      // …and the post-restart rows renumber and all flow through.
      assert(n(s.latestOffset()) == 5L)
      assert(planned(s, 3L, 5L) == Seq("r4", "r5"))
      s.commit(RowCountOffset(5L))
      assert(s.bufferedRows == 0)
    }
  }

  test("mid-run re-parse of this instance's own offset never rebases") {
    withStream("unit-midrun") { (s, port) =>
      sendLines(port, Seq("x", "y"))
      awaitBuffered(s, 2)
      val latest = s.latestOffset()
      assert(n(latest) == 2L)
      assert(planned(s, 0L, 2L) == Seq("x", "y"))
      // The engine re-parses batch 0's end offset from the WAL (the
      // JSON this instance itself wrote) before committing it — a pure
      // parse: a rebase here would zero the commit's drop and re-serve
      // x,y to every later batch.
      s.deserializeOffset(latest.json())
      assert(s.bufferedRows == 2, "own-epoch parse must not fast-forward trimmed")
      s.commit(RowCountOffset(2L))
      assert(s.bufferedRows == 0, "commit must still trim the committed prefix")
      // Rows arriving after the commit get fresh, contiguous numbering.
      sendLines(port, Seq("z"))
      awaitBuffered(s, 1)
      assert(n(s.latestOffset()) == 3L)
      assert(planned(s, 2L, 3L) == Seq("z"))
    }
  }

  test("replay of a pending foreign batch rebases to the max and replays empty") {
    withStream("unit-pending") { (s, _) =>
      // WAL holds a committed end (2) AND a constructed-but-uncommitted
      // batch end (5), both foreign. The previous run's [2,5) data is
      // gone (TCP has no replay), so the pending batch must replay as a
      // clean empty span, not a negative slice — in either parse order.
      s.deserializeOffset("""{"e":"prev-incarnation","n":5}""")
      s.deserializeOffset("""{"e":"prev-incarnation","n":2}""")
      assert(planned(s, 2L, 5L) == Seq.empty)
      assert(n(s.latestOffset()) == 5L)
    }
  }

  test("legacy bare-long offset parses as foreign") {
    withStream("unit-legacy") { (s, _) =>
      s.deserializeOffset("4")
      assert(n(s.latestOffset()) == 4L)
    }
  }
}
