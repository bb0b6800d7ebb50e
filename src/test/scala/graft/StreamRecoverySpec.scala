package graft

import graft.streaming.{KeyedOrderedSink, KinesisLikeSink}
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint fault-tolerance: a restarted query must resume from its
  * checkpoint — committed input files are NOT reprocessed, and the
  * state store (here: dropDuplicates keys) is RESTORED, so a
  * duplicate arriving after the restart is still suppressed. This is
  * the property that makes the trike-shaped ingestion pipeline safe
  * to crash anywhere: at-least-once upstream + recovered dedup state
  * + idempotent keyed sink = effectively-once end to end. */
class StreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  test("restart from checkpoint: no input replay, dedup state survives") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-recovery").toString
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(inDir))

    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(inDir, name), lines.mkString("\n").getBytes("UTF-8"))

    def run(): Seq[Long] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream
        .schema("event_id LONG, user LONG")
        .json(inDir)
        .dropDuplicates("event_id")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= batch.select("event_id").collect().map(_.getLong(0))
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      seen.toSeq
    }

    // Phase 1: three ids, one in-batch duplicate.
    writeFile("a.json", Seq(
      """{"event_id": 1, "user": 10}""",
      """{"event_id": 2, "user": 11}""",
      """{"event_id": 1, "user": 10}""",
      """{"event_id": 3, "user": 12}"""))
    val first = run()
    assert(first.sorted == Seq(1L, 2L, 3L), s"phase 1: $first")

    // Phase 2: id 3 is a cross-restart duplicate; only 4 is new.
    writeFile("b.json", Seq(
      """{"event_id": 3, "user": 12}""",
      """{"event_id": 4, "user": 13}"""))
    val second = run()
    assert(second == Seq(4L),
      s"phase 2 must emit only the new id (no file replay, state restored): $second")
  }

  test("keyed sink replay: a mid-batch crash resumes without duplicate puts") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-sink-replay").toString
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(inDir))
    // Two keys, three records each, totally ordered per key by pos.
    Files.write(Paths.get(inDir, "a.json"), (1 to 6).map { i =>
      s"""{"k": "conn-${if (i % 2 == 0) "a" else "b"}", "pos": $i, "data": "m$i"}"""
    }.mkString("\n").getBytes("UTF-8"))

    val sink = new KinesisLikeSink
    StreamRecoverySpec.sharedSink = sink
    StreamRecoverySpec.failAfterPuts.set(3) // batch dies after 3 puts land

    def run(): Unit = {
      val q = spark.readStream
        .schema("k STRING, pos LONG, data STRING")
        .json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(KeyedOrderedSink.orderedPuts(
          () => StreamRecoverySpec.poisonedClient,
          keyCol = "k", dataCol = "data", orderCols = Seq("pos")))
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    intercept[StreamingQueryException](run())
    val landed = sink.all.size
    assert(landed >= 3 && landed < 6,
      s"the failed attempt must land a strict prefix, got $landed")

    // Restart from the same checkpoint: the batch replays under the
    // SAME batchId; the replay cursor must skip exactly the records
    // that already landed — no duplicates, chain and order intact.
    StreamRecoverySpec.failAfterPuts.set(Int.MaxValue)
    run()
    assert(sink.byKey("conn-a").map(_.data) == Seq("m2", "m4", "m6"))
    assert(sink.byKey("conn-b").map(_.data) == Seq("m1", "m3", "m5"))
    val seqs = sink.all.map(_.seq)
    assert(seqs.distinct.size == seqs.size, "service sequences never reused")
  }
}

object StreamRecoverySpec {
  /** Static routing for executor-side closures (local-mode same-JVM),
    * as in KeyedOrderedSinkSpec. */
  @volatile var sharedSink: KinesisLikeSink = _
  val failAfterPuts = new java.util.concurrent.atomic.AtomicInteger(Int.MaxValue)

  /** Delegates to sharedSink but injects a crash once the put budget
    * is exhausted — the "killed mid-batch" fault. */
  def poisonedClient: KeyedOrderedSink.PutClient = new KeyedOrderedSink.PutClient {
    def put(k: String, d: String, seq: Option[Long], batchId: Long): Long = {
      if (failAfterPuts.decrementAndGet() < 0)
        throw new RuntimeException("injected sink failure")
      sharedSink.put(k, d, seq, batchId)
    }
    def lastSequence(k: String): Option[Long] = sharedSink.lastSequence(k)
    override def putsInBatch(k: String, batchId: Long): Long =
      sharedSink.putsInBatch(k, batchId)
  }
}
