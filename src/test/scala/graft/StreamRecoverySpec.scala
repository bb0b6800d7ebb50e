package graft

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
}
