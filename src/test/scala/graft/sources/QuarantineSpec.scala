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
    val (clean, quarantine) = Quarantine.readJsonl(spark, writeFixture(), schema)
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

  test("a fully clean feed quarantines nothing and writes no sink") {
    val dir = Files.createTempDirectory("quarantine_clean")
    Files.writeString(dir.resolve("ok.jsonl"),
      """{"id": 9, "name": "z", "score": 1}""" + "\n")
    val qDir = Files.createTempDirectory("quarantine_none").toString
    val (clean, n) = Quarantine.ingest(spark, dir.toString, schema, qDir)
    assert(clean.count() == 1 && n == 0)
    assert(!Files.list(java.nio.file.Paths.get(qDir)).iterator().hasNext,
      "no quarantine output for a clean feed")
  }
}
