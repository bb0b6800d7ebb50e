package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The malformed-record quarantine contract: unparseable AND
  * mistyped lines are captured whole (never dropped, never fatal —
  * JSON PERMISSIVE marks a type-mismatched row corrupt, unlike CSV
  * which nulls the field), clean rows come out fully typed, and the
  * quarantined raw lines re-drive byte-identically. */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = graft.GraftSession.test

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("quarantine_in")
    Files.writeString(dir.resolve("feed.jsonl"),
      """{"id": 1, "name": "a", "score": 10}
        |{"id": 2, "name": "b", "score": 20}
        |{oh no, not json at all
        |{"id": 3, "name": "c", "score": "not-a-number"}
        |"just a string"
        |{"id": 4, "name": "d", "score": 40}
        |""".stripMargin)
    dir.toString
  }

  test("unparseable lines quarantine whole; typed rows survive; mistypes null in place") {
    val batch = Quarantine.readJsonl(spark, writeFixture(), schema)
    val (clean, quarantine) = (batch.clean, batch.quarantine)
    val cleanRows = clean.orderBy(col("id")).collect()
    // Fully-typed rows only: the mistyped id-3 row is JSON-corrupt.
    assert(cleanRows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(cleanRows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)),
      "the clean side is fully typed")
    assert(clean.schema.fieldNames.toSeq == Seq("id", "name", "score"),
      "corrupt bookkeeping columns must not leak into the clean side")
    // 3 bad lines captured byte-identically with provenance: two
    // structural, one type-mismatched (JSON PERMISSIVE corrupts it).
    val q = quarantine.collect()
    assert(q.map(_.getString(0)).toSet ==
      Set("{oh no, not json at all", "\"just a string\"",
        """{"id": 3, "name": "c", "score": "not-a-number"}"""))
    assert(q.forall(_.getString(1).contains("feed.jsonl")),
      "quarantine rows must carry their source file")
    // release() must drop the one persisted parse the batch rests on —
    // clean/quarantine are derived frames, so this handle is the only
    // way a caller can release the cache entry.
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    batch.release()
    val persistedAfter = spark.sparkContext.getPersistentRDDs.keySet
    assert((persistedBefore diff persistedAfter).nonEmpty,
      "release() must unpersist the parsed batch's cache entry")
  }

  test("ingest writes the quarantine sink and the re-drive is byte-identical") {
    import scala.jdk.CollectionConverters._
    val qDir = Files.createTempDirectory("quarantine_out").toString
    val (clean, n) = Quarantine.ingest(spark, writeFixture(), schema, qDir)
    assert(clean.count() == 3 && n == 3)
    val redrive = spark.read.text(qDir).collect().map(_.getString(0)).toSet
    assert(redrive == Set("{oh no, not json at all", "\"just a string\"",
      """{"id": 3, "name": "c", "score": "not-a-number"}"""))
  }

  test("a clean re-run overwrites a stale quarantine sink (no ghost re-drive)") {
    val cleanDir = Files.createTempDirectory("quarantine_clean")
    Files.writeString(cleanDir.resolve("ok.jsonl"),
      """{"id": 9, "name": "z", "score": 1}""" + "\n")
    val qDir = Files.createTempDirectory("quarantine_redrive").toString
    // First run: dirty feed leaves 3 quarantined lines in qDir.
    val (_, nDirty) = Quarantine.ingest(spark, writeFixture(), schema, qDir)
    assert(nDirty == 3)
    // Second run, same sink, now-clean feed: the stale lines MUST be
    // cleared — a re-drive of qDir must replay nothing.
    val (clean, n) = Quarantine.ingest(spark, cleanDir.toString, schema, qDir)
    assert(clean.count() == 1 && n == 0)
    assert(spark.read.text(qDir).count() == 0,
      "stale quarantine files from the previous run must not survive")
  }

  test("ingest returns a checkpoint-backed clean side, parse cache released") {
    val qDir = Files.createTempDirectory("quarantine_cache").toString
    val feed = writeFixture()
    val (clean, n) = Quarantine.ingest(spark, feed, schema, qDir)
    assert(n == 3)
    // The returned frame plans as a LogicalRDD leaf (its own checkpoint
    // blocks), NOT the persisted json parse — ingest released that cache
    // entry before returning, so nothing rests on it.
    val leaves = clean.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      s"clean must be checkpoint-backed, got leaves: $leaves")
    // And it must survive the feed disappearing: materialized, not lazy
    // over a released cache.
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(feed)).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(Files.delete)
    assert(clean.count() == 3)
  }
}
