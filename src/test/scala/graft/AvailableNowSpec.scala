package graft

import graft.sources.ShardedJournal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Backfill-then-stop with Trigger.AvailableNow — the operational
  * pattern for catching up a journal backlog with the SAME streaming
  * pipeline that then runs continuously: process everything already
  * present in bounded micro-batches (rate limits respected, unlike
  * the old Trigger.Once), then terminate so an orchestrator can flip
  * the deployment to a continuous trigger on the identical plan +
  * checkpoint. */
class AvailableNowSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  test("AvailableNow drains a journal backlog in bounded batches and terminates") {
    val dir = "/root/testdata/sf0.001"
    val backlog = java.nio.file.Files.createTempDirectory("an-backlog").toString
    val ckpt = java.nio.file.Files.createTempDirectory("an-ckpt").toString

    val out = java.nio.file.Files.createTempDirectory("an-out").toString

    // The backlog: the sharded journal landed as several parquet files
    // (what a bus-to-object-store dump looks like between runs).
    val journal = ShardedJournal.journal(spark, dir)
    journal.repartition(4).write.mode("overwrite").parquet(backlog)
    val total = journal.count()

    def run() = spark.readStream
      .schema(spark.read.parquet(backlog).schema)
      .option("maxFilesPerTrigger", 1) // bounded batches, not one giant one
      .parquet(backlog)
      .filter(col("message") =!= "HEARTBEAT")
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    // AvailableNow terminates BY ITSELF once the backlog is drained.
    val q = run()
    assert(q.awaitTermination(120000), "query did not self-terminate")
    val expected = journal.filter(col("message") =!= "HEARTBEAT").count()
    assert(spark.read.parquet(out).count() == expected)
    assert(expected > 0 && expected < total) // heartbeats were dropped
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "maxFilesPerTrigger should split the backlog into several batches")

    // A restart over the same checkpoint finds nothing new to do:
    // committed files are not replayed, output is unchanged.
    val q2 = run()
    assert(q2.awaitTermination(120000), "restart did not self-terminate")
    assert(spark.read.parquet(out).count() == expected, "files were replayed")
  }
}
